"""join_terms at scale: the total/avg fold must not build one giant
aggregation row per join term (r4 verdict weak #3 — a 3-value from_field
puts n/3 (docid, score) structs in a single collect_list buffer).

The segmented two-level fold (bounded docid-range groups, f32 accumulator
carried across ranges by a nested aggregate) must be BIT-IDENTICAL to the
flat fold — same TermsWithScoreCollector.cs from-docid accumulation order.
Multi-valued array<string> join fields follow JoinUtil's SortedSet path
(TestJoinUtil.cs multi-value cases): every distinct from-doc term
contributes, any to-element matches.
"""
import numpy as np
import pytest
from pyspark.sql import functions as F

from lucenenet_spark import oracle
from lucenenet_spark.operators.search import IndexSearcher
from lucenenet_spark.plans.query import TermQuery

from .conftest import hits

Q = TermQuery(term="popcorn")  # hot: ~20% of docs -> broad from side


@pytest.mark.parametrize("mode", ["total", "avg"])
def test_segmented_fold_bit_identical(spark, index_dir, mode):
    s_flat = IndexSearcher(spark, index_dir)
    s_seg = IndexSearcher(spark, index_dir)
    s_seg.JOIN_FLAT_FOLD_MAX = 0  # force the segmented path
    s_seg.JOIN_FOLD_RANGE = 64  # many ranges per term at N_DOCS=500
    flat = hits(s_flat.join_terms(Q, "role", "role", score_mode=mode, k=30))
    seg = hits(s_seg.join_terms(Q, "role", "role", score_mode=mode, k=30))
    assert flat == seg and len(flat) == 30


def _tagged(searcher):
    """docs view + tags array<string>: [role] or [role, tool]."""
    return searcher.docs().withColumn(
        "tags",
        F.when(
            F.col("tool").isNotNull(), F.array("role", "tool")
        ).otherwise(F.array("role")),
    )


def test_multivalued_join_max(spark, searcher, oracle_index, corpus_pdf):
    """Multi-value from AND to side, mode=max, vs a pandas recomputation."""
    from_scores = oracle.term_scores(oracle_index, "popcorn")
    docs = (
        corpus_pdf.reset_index(drop=True)
        .reset_index()
        .rename(columns={"index": "docid"})
    )

    def tags(row):
        return sorted({row["role"]} | ({row["tool"]} if row["tool"] else set()))

    docs = docs.assign(tags=docs.apply(tags, axis=1))
    per = {}  # jterm -> max from-hit score (distinct terms per from-doc)
    for _, row in docs[docs["docid"].isin(from_scores)].iterrows():
        sc = np.float32(from_scores[row["docid"]])
        for t in row["tags"]:
            per[t] = max(per.get(t, np.float32(0.0)), sc)
    want = sorted(
        (
            (int(row["docid"]), max(per[t] for t in row["tags"] if t in per))
            for _, row in docs.iterrows()
            if any(t in per for t in row["tags"])
        ),
        key=lambda x: (-x[1], x[0]),
    )[:25]
    got = hits(
        searcher.join_terms(
            Q, "tags", "tags", score_mode="max", k=25, docs_df=_tagged(searcher)
        )
    )
    assert got == want


def test_multivalued_join_none(spark, searcher, oracle_index, corpus_pdf):
    from_scores = oracle.term_scores(oracle_index, "popcorn")
    docs = (
        corpus_pdf.reset_index(drop=True)
        .reset_index()
        .rename(columns={"index": "docid"})
    )
    terms = set()
    for _, row in docs[docs["docid"].isin(from_scores)].iterrows():
        terms.add(row["role"])
        if row["tool"]:
            terms.add(row["tool"])
    want_ids = {
        int(row["docid"])
        for _, row in docs.iterrows()
        if row["role"] in terms or (row["tool"] and row["tool"] in terms)
    }
    got = searcher.join_terms(
        Q, "tags", "tags", score_mode="none", k=10**6, boost=2.0,
        docs_df=_tagged(searcher),
    ).toPandas()
    assert set(got["docid"]) == want_ids
    assert (got["score"] == np.float32(2.0)).all()


def test_per_term_broadcast_guarded(spark, index_dir):
    """With an unbounded from-query hint the per-term table must NOT carry a
    broadcast hint (shuffled join, same rows)."""
    import io
    from contextlib import redirect_stdout

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        s_bc = IndexSearcher(spark, index_dir)
        s_sh = IndexSearcher(spark, index_dir)
        s_sh.MAX_BROADCAST_DOCIDS = 0
        dfs = [
            s.join_terms(Q, "role", "role", score_mode="max", k=20)
            for s in (s_bc, s_sh)
        ]
        plans = []
        for d in dfs:
            buf = io.StringIO()
            with redirect_stdout(buf):
                d.explain("formatted")
            plans.append(buf.getvalue())
        assert plans[1].count("BroadcastHashJoin") < plans[0].count(
            "BroadcastHashJoin"
        )
        assert hits(dfs[0]) == hits(dfs[1])
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
