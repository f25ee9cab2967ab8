"""Quality benchmark (Lucene.Net.Benchmark/Quality) — QualityStats
semantics on hand-computed vectors: the running-precision AVP, the
first-relevant-within-5 MRR, GetPrecisionAt's tail extension, the
maxGood == 0 recall arm, qrels parsing, and QualityStats.Average."""
from __future__ import annotations

import pytest

from lucenenet_spark.operators import quality as Q


def _stats(spark, results, judgments):
    import pandas as pd

    r = spark.createDataFrame(
        pd.DataFrame(results, columns=["query_id", "rank", "doc_name"]),
        "query_id string, rank int, doc_name string",
    )
    j = Q.judgments_df(spark, judgments)
    return {
        row["query_id"]: row.asDict()
        for row in Q.quality_stats(r, j).collect()
    }


def test_quality_stats_hand_vector(spark):
    # q1: hits d1..d6, relevant {d1, d3, d9, d10} (d9/d10 not retrieved)
    results = [("q1", i + 1, f"d{i + 1}") for i in range(6)]
    judged = [("q1", d) for d in ["d1", "d3", "d9", "d10"]]
    s = _stats(spark, results, judged)["q1"]
    assert s["num_points"] == 6 and s["num_good"] == 2 and s["max_good"] == 4
    # AddResult: relevant at 1 (p=1/1) and 3 (p=2/3); avp = (1 + 2/3)/4
    assert s["avp"] == pytest.approx((1.0 + 2.0 / 3.0) / 4.0, abs=0)
    assert s["recall"] == 0.5
    assert s["mrr"] == 1.0  # first relevant at rank 1 (<= 5)
    assert s["p_at_5"] == 2.0 / 5.0
    # tail extension past numPoints: (numPoints * pAt[numPoints]) / n
    assert s["p_at_10"] == (6.0 * (2.0 / 6.0)) / 10.0
    assert s["p_at_20"] == (6.0 * (2.0 / 6.0)) / 20.0


def test_quality_stats_mrr_and_empty_arms(spark):
    # q2: first relevant at rank 6 -> MRR = 0 (only within top 5 counts)
    results = [("q2", i + 1, f"d{i + 1}") for i in range(8)]
    s = _stats(spark, results, [("q2", "d6")])["q2"]
    assert s["mrr"] == 0.0
    assert s["avp"] == (1.0 / 6.0) / 1.0
    # q3: no judged relevant docs -> maxGood 0: recall falls back to the
    # running precision (0/n), avp 0 (GetAvp's maxGoodPoints==0 arm)
    s = _stats(spark, [("q3", 1, "x"), ("q3", 2, "y")], [("q2", "d6")])["q3"]
    assert s["max_good"] == 0 and s["recall"] == 0.0 and s["avp"] == 0.0


def test_trec_qrels_parse():
    text = """
# comment
q1 0 doc1 1
q1 0 doc2 0
q2 0 doc9 2
"""
    assert Q.parse_trec_qrels(text) == [("q1", "doc1"), ("q2", "doc9")]
    with pytest.raises(ValueError):
        Q.parse_trec_qrels("q1 doc1 1")


def test_quality_average(spark):
    rows = [
        {"query_id": "a", "num_points": 10, "num_good": 2, "max_good": 4,
         "recall": 0.5, "avp": 0.4, "mrr": 1.0, "p_at_5": 0.2,
         "p_at_10": 0.2, "p_at_20": 0.1},
        {"query_id": "b", "num_points": 20, "num_good": 4, "max_good": 8,
         "recall": 0.5, "avp": 0.2, "mrr": 0.5, "p_at_5": 0.4,
         "p_at_10": 0.3, "p_at_20": 0.2},
        # maxGood == 0 queries are excluded from the averages
        {"query_id": "c", "num_points": 5, "num_good": 0, "max_good": 0,
         "recall": 0.0, "avp": 0.0, "mrr": 0.0, "p_at_5": 0.0,
         "p_at_10": 0.0, "p_at_20": 0.0},
    ]
    avg = Q.average(rows)
    assert avg["num_good_queries"] == 2 and avg["num_queries"] == 3
    assert avg["recall"] == 0.5
    assert avg["avp"] == pytest.approx(0.3)
    assert avg["mrr"] == 0.75
    assert avg["p_at_5"] == pytest.approx(0.3)
    assert Q.average([rows[2]])["recall"] == 0.0  # no good queries


def test_quality_benchmark_end_to_end(spark, index_dir):
    from lucenenet_spark.operators.search import IndexSearcher
    from lucenenet_spark.plans.query import TermQuery

    s = IndexSearcher(spark, index_dir)
    # judge: every doc the engine itself ranks in the top 3 is relevant —
    # then p@1..3 are exactly 1 and recall is 1 at k >= 3
    q = TermQuery(term="common3")
    top3 = [str(r["docid"]) for r in s.search(q, 3).collect()]
    if len(top3) < 3:
        pytest.skip("corpus term too rare")
    jd = Q.judgments_df(spark, [("q1", d) for d in top3])
    out = Q.quality_benchmark(s, {"q1": q}, jd, k=10).collect()[0].asDict()
    assert out["num_good"] == 3 and out["max_good"] == 3
    assert out["recall"] == 1.0
    assert out["avp"] == 1.0  # all three relevant ranked first
    assert out["mrr"] == 1.0
    assert out["p_at_5"] == 3.0 / 5.0
