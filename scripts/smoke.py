"""Dev smoke: build tiny index, run term + boolean queries, compare to oracle."""
import shutil, sys, time

import numpy as np

from lucenenet_spark.session import get_spark
from lucenenet_spark.datagen import generate_transcripts, transcripts_spark
from lucenenet_spark.operators.index_build import IndexBuilder
from lucenenet_spark.operators.search import IndexSearcher
from lucenenet_spark.plans.query import BooleanQuery, TermQuery
from lucenenet_spark import oracle

OUT = "/tmp/smoke_index"

def main():
    shutil.rmtree(OUT, ignore_errors=True)
    spark = get_spark(cores=8)
    n = 2000
    df = transcripts_spark(spark, n, partitions=4)
    t0 = time.time()
    b = IndexBuilder(spark, OUT, n_buckets=8, n_segments=8, salt_target=500)
    manifest = b.build(df)
    print("build secs", round(time.time() - t0, 1), "max_doc", manifest["max_doc"], "avgdl", manifest["avgdl"])

    # oracle over identical corpus with identical docids
    pdf = generate_transcripts(n).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    oidx = oracle.build_index(pdf["text"].tolist())
    print("oracle: max_doc", oidx.max_doc, "avgdl", oidx.avgdl, "terms", len(oidx.postings))

    s = IndexSearcher(spark, OUT)
    assert s.max_doc == oidx.max_doc, (s.max_doc, oidx.max_doc)
    assert abs(float(s.avgdl) - float(oidx.avgdl)) < 1e-9, (s.avgdl, oidx.avgdl)

    for term in ["popcorn", "word7", "rare12", "hello", "the", "zzzznope"]:
        expect = oracle.top_k(oracle.term_scores(oidx, term), 10)
        got = [(r["docid"], np.float32(r["score"])) for r in s.search(TermQuery(term=term), 10).collect()]
        ok = len(got) == len(expect) and all(g[0] == e[0] and g[1] == e[1] for g, e in zip(got, expect))
        print(f"term {term!r}: spark={got[:3]} oracle={expect[:3]} match={ok}")
        assert ok, term

    q = BooleanQuery(must=(TermQuery(term="popcorn"), TermQuery(term="word7")))
    expect = oracle.top_k(oracle.boolean_scores(oidx, must=["popcorn", "word7"]), 10)
    got = [(r["docid"], np.float32(r["score"])) for r in s.search(q, 10).collect()]
    assert got == expect, (got[:5], expect[:5])
    print("AND ok:", got[:3])

    q = BooleanQuery(should=(TermQuery(term="popcorn"), TermQuery(term="word7"), TermQuery(term="rare12")))
    expect = oracle.top_k(oracle.boolean_scores(oidx, should=["popcorn", "word7", "rare12"]), 10)
    got = [(r["docid"], np.float32(r["score"])) for r in s.search(q, 10).collect()]
    assert got == expect, (got[:5], expect[:5])
    print("OR(pruned) ok:", got[:3])
    got_np = [(r["docid"], np.float32(r["score"])) for r in s.search(q, 10, prune=False).collect()]
    assert got_np == expect
    print("OR(unpruned) ok")

    q = BooleanQuery(should=(TermQuery(term="popcorn"), TermQuery(term="word7")), must_not=(TermQuery(term="rare12"),))
    expect = oracle.top_k(oracle.boolean_scores(oidx, should=["popcorn", "word7"], must_not=["rare12"]), 10)
    got = [(r["docid"], np.float32(r["score"])) for r in s.search(q, 10).collect()]
    assert got == expect
    print("NOT ok")
    print("SMOKE PASS")
    spark.stop()

if __name__ == "__main__":
    main()
