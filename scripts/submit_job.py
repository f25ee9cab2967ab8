"""spark-submit entry point: build a tiny index and run the query set.

Proves the north-rule deployment path: the engine ships as a zip via
  spark-submit --master <cluster> --py-files lucenenet_spark.zip scripts/submit_job.py
with no repo checkout on executors — workers import the package from the
shipped archive. Prints SUBMIT PASS on exact oracle parity.
"""
import sys
import tempfile

import numpy as np
from pyspark.sql import SparkSession


def main():
    spark = (
        SparkSession.builder.appName("lucenenet-spark-submit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    # imported AFTER session creation: resolved from --py-files on executors
    from lucenenet_spark import oracle
    from lucenenet_spark.datagen import generate_transcripts, transcripts_spark
    from lucenenet_spark.operators.index_build import IndexBuilder
    from lucenenet_spark.operators.search import IndexSearcher
    from lucenenet_spark.plans.query import BooleanQuery, TermQuery

    out = tempfile.mkdtemp(prefix="submit_idx_")
    n = 600
    IndexBuilder(spark, out, n_buckets=4, n_segments=4, salt_target=100).build(
        transcripts_spark(spark, n, partitions=4), build_id="submit"
    )
    s = IndexSearcher(spark, out)
    pdf = generate_transcripts(n).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    oidx = oracle.build_index(pdf["text"].tolist())
    for q, expect in [
        (TermQuery(term="popcorn"), oracle.term_scores(oidx, "popcorn")),
        (
            BooleanQuery(should=(TermQuery(term="popcorn"), TermQuery(term="word7"))),
            oracle.boolean_scores(oidx, should=["popcorn", "word7"]),
        ),
    ]:
        got = [(r["docid"], np.float32(r["score"])) for r in s.search(q, 10).collect()]
        want = oracle.top_k(expect, 10)
        assert got == want, (q, got[:3], want[:3])
    print("SUBMIT PASS")
    spark.stop()


if __name__ == "__main__":
    main()
