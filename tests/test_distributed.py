"""Distributed-semantics tests: N-vs-1 partition equivalence, resume,
skew salting, and the CheckIndex validation job.

Models the reference's TestTopDocsMerge/TestShardSearching oracle pattern
(SURVEY.md §5.6): the sharded result must equal the single-shard result.
"""
import os
import time

import numpy as np
from pyspark.sql import functions as F

from lucenenet_spark import oracle
from lucenenet_spark.operators.index_build import IndexBuilder, load_manifest
from lucenenet_spark.plans.query import BooleanQuery, TermQuery
from lucenenet_spark.validate import check_index

from .conftest import N_DOCS, hits

QUERIES = [
    TermQuery(term="popcorn"),
    TermQuery(term="rare12"),
    BooleanQuery(must=(TermQuery(term="popcorn"), TermQuery(term="common3"))),
    BooleanQuery(should=(TermQuery(term="word7"), TermQuery(term="word8"), TermQuery(term="popcorn"))),
    BooleanQuery(should=(TermQuery(term="popcorn"),), must_not=(TermQuery(term="word7"),)),
]


def test_nseg_equals_1seg(searcher, searcher_1seg):
    for q in QUERIES:
        a = hits(searcher.search(q, 20))
        b = hits(searcher_1seg.search(q, 20))
        assert a == b, q


def test_manifests_agree(index_dir, index_dir_1seg):
    a, b = load_manifest(index_dir), load_manifest(index_dir_1seg)
    for k in ["max_doc", "doc_count", "sum_ttf", "avgdl"]:
        assert a[k] == b[k], k


def test_docids_stable_order(searcher, index_dir, corpus_pdf):
    """docid == dense rank over (conv_id, turn_idx) — the per-row invariant."""
    docs = (
        searcher.docs()
        .select("docid", "conv_id", "turn_idx")
        .orderBy("docid")
        .toPandas()
    )
    assert docs["docid"].tolist() == list(range(len(corpus_pdf)))
    assert docs["conv_id"].tolist() == corpus_pdf["conv_id"].tolist()
    assert docs["turn_idx"].tolist() == corpus_pdf["turn_idx"].tolist()


def test_hot_term_is_salted(spark, index_dir, oracle_index):
    """'popcorn' (df >> salt_target=60) must split into multiple salt groups."""
    p = spark.read.parquet(os.path.join(index_dir, "postings"))
    salts = (
        p.filter(F.col("term") == "popcorn").select("salt").distinct().count()
    )
    assert salts > 1, "hot term not salted"
    # and a cold (df=1) term is not
    cold = next(t for t, pl in oracle_index.postings.items() if len(pl) == 1)
    assert p.filter(F.col("term") == cold).select("salt").distinct().count() == 1


def test_salted_term_parity(searcher, oracle_index):
    """Salted posting lists must still score/rank identically."""
    got = hits(searcher.search(TermQuery(term="popcorn"), 30))
    want = oracle.top_k(oracle.term_scores(oracle_index, "popcorn"), 30)
    assert got == want


def test_resume_skips_completed_stages(spark, index_dir):
    """Re-running build() on a committed index dir is a fast no-op."""
    from lucenenet_spark.datagen import transcripts_spark

    df = transcripts_spark(spark, N_DOCS, partitions=4)
    t0 = time.time()
    IndexBuilder(spark, index_dir, n_buckets=8, n_segments=8, salt_target=60).build(df)
    assert time.time() - t0 < 30, "resume re-ran completed stages"


def test_checkpoints_have_lineage_and_rates(spark, index_dir):
    cp = spark.read.parquet(os.path.join(index_dir, "build_checkpoints")).toPandas()
    assert len(cp) >= 1
    assert (cp["status"] == "done").all()
    assert (cp["postings_per_sec"] > 0).all()
    assert cp["lineage"].str.contains("build_id").all()


def test_check_index_passes(spark, index_dir):
    report = check_index(spark, index_dir)
    assert report["ok"], report


def test_check_index_catches_corruption(spark, index_dir, tmp_path):
    """Tamper with term_stats — the validator must notice (CheckIndex.cs:827)."""
    import shutil

    broken = str(tmp_path / "broken")
    shutil.copytree(index_dir, broken)
    ts = spark.read.parquet(os.path.join(broken, "term_stats"))
    bad = ts.withColumn(
        "df", F.when(F.col("term") == "popcorn", F.col("df") + 1).otherwise(F.col("df"))
    )
    bad.write.mode("overwrite").parquet(os.path.join(broken, "term_stats_bad"))
    shutil.rmtree(os.path.join(broken, "term_stats"))
    os.rename(os.path.join(broken, "term_stats_bad"), os.path.join(broken, "term_stats"))
    # manifest paths are absolute — rewrite to the copy
    import json

    mpath = os.path.join(broken, "_manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    m["tables"] = {k: v.replace(index_dir, broken) for k, v in m["tables"].items()}
    with open(mpath, "w") as f:
        json.dump(m, f)
    report = check_index(spark, broken)
    assert not report["term_stats"]["ok"]
