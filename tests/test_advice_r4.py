"""Regression tests for the round-3 ADVICE findings.

1. CommonTermsQuery min-should-match multiplies msm * numOptional in
   FLOAT32 before rounding (CommonTermsQuery.cs:189): 0.7f*5 = 3.4999998
   rounds to 3, where float64 0.7*5 = 3.5 rounds (half-even) to 4.
2. payload_near_scores validates clauses up front: non-SpanTermQuery ->
   TypeError, mixed fields -> ValueError (SpanNearQuery ctor parity).
3. build_term_vectors stamps the channel with the manifest's
   (build_id, committed_at); a rebuilt index invalidates the channel.
4. more_like_this(source=None) raises KeyError for a docid absent from
   the index (matching the text path) instead of silently returning
   empty hits.
"""
import numpy as np
import pytest

from lucenenet_spark import oracle
from lucenenet_spark.operators.search import IndexSearcher
from lucenenet_spark.operators.spans import (
    PayloadNearQuery,
    SpanOrQuery,
    SpanTermQuery,
    payload_near_scores,
)
from lucenenet_spark.plans.query import BooleanQuery, CommonTermsQuery

from .conftest import hits


def test_msm_product_is_float32(searcher, oracle_index):
    # 32 df=0 terms all classify low -> SHOULD group with fractional msm.
    # f*32 = 19.4999997686 in float64 (rounds to 19) but the float32
    # product is exactly 19.5 (rounds half-even to 20) — the reference
    # multiplies in float32 (CommonTermsQuery.cs:189).
    f = 0.6093749927690183
    assert round(f * 32) == 19  # the old float64 behavior
    assert float(np.float32(np.float32(f) * np.float32(32))) == 19.5
    terms = tuple(f"zzzqabsent{i}" for i in range(32))
    q = CommonTermsQuery(
        terms=terms,
        max_term_frequency=0.1,
        low_freq_occur="SHOULD",
        low_freq_min_should_match=f,
    )
    rewritten = searcher._rewrite_common_terms(q)
    assert isinstance(rewritten, BooleanQuery)
    assert rewritten.min_should_match == 20


def test_oracle_minnr_matches_engine(oracle_index):
    # drive the oracle's common_terms_scores through the same boundary:
    # both sides must agree that msm=0.7 over 5 optionals needs 3
    scores = oracle.common_terms_scores(
        oracle_index,
        ["zzzqa", "zzzqb", "zzzqc", "zzzqd", "zzzqe"],
        0.1,
        low_occur="SHOULD",
        low_msm=0.7,
    )
    assert scores == {}  # df=0 everywhere; just exercises the path


def test_payload_near_rejects_non_term_clause(searcher):
    q = PayloadNearQuery(
        clauses=(
            SpanTermQuery(term="hello"),
            SpanOrQuery(clauses=(SpanTermQuery(term="world"),)),
        )
    )
    with pytest.raises(TypeError, match="SpanTermQuery"):
        payload_near_scores(searcher, q)


def test_payload_near_rejects_mixed_fields(searcher):
    q = PayloadNearQuery(
        clauses=(
            SpanTermQuery(term="hello", field="text"),
            SpanTermQuery(term="user", field="role"),
        )
    )
    with pytest.raises(ValueError, match="share one field"):
        payload_near_scores(searcher, q)


def test_term_vectors_stamp_invalidates_on_rebuild(spark, tmp_path):
    import os
    import shutil

    from lucenenet_spark.datagen import transcripts_spark
    from lucenenet_spark.operators.index_build import IndexBuilder
    from lucenenet_spark.operators.termvectors import build_term_vectors

    d = str(tmp_path / "tvstamp")
    df = transcripts_spark(spark, 60, partitions=2)
    IndexBuilder(spark, d, n_buckets=2).build(df, build_id="b1")
    build_term_vectors(spark, df, d)
    assert spark.read.parquet(f"{d}/tvectors").count() > 0

    # rebuild the index over a DIFFERENT corpus at the same path: docids
    # shift; the stale channel must be rebuilt, not silently reused
    tvdir = f"{d}/tvectors"
    for f in os.listdir(d):
        p = os.path.join(d, f)
        if p == tvdir:
            continue
        shutil.rmtree(p, ignore_errors=True) if os.path.isdir(p) else os.remove(p)
    df2 = transcripts_spark(spark, 40, seed=7, partitions=2)
    IndexBuilder(spark, d, n_buckets=2).build(df2, build_id="b2")
    build_term_vectors(spark, df2, d)
    tv = spark.read.parquet(f"{d}/tvectors")
    max_docid = tv.agg({"docid": "max"}).first()[0]
    s2 = IndexSearcher(spark, d)
    assert max_docid < s2.max_doc  # channel matches the NEW (smaller) index


def test_mlt_tv_unknown_docid_raises(spark, searcher):
    from lucenenet_spark.operators.mlt import more_like_this

    with pytest.raises(KeyError):
        more_like_this(searcher, None, docid=10**9)


def test_join_terms_modes(spark, searcher, oracle_index, corpus_pdf):
    """JoinUtil term join (Lucene.Net.Join/JoinUtil.cs): all four ScoreModes
    against a pure-pandas recomputation from the oracle's from-hit scores."""
    import pandas as pd

    from lucenenet_spark.plans.query import TermQuery

    q = TermQuery(term="popcorn")
    from_scores = oracle.term_scores(oracle_index, "popcorn")
    docs = (
        corpus_pdf.reset_index(drop=True)
        .reset_index()
        .rename(columns={"index": "docid"})
    )
    fromv = docs[docs["docid"].isin(from_scores)][["docid", "role"]].copy()
    fromv["score"] = fromv["docid"].map(from_scores)
    fromv = fromv.sort_values("docid")

    per = {}
    for term, grp in fromv.groupby("role"):
        tot = np.float32(0.0)
        for sc in grp["score"]:
            tot = np.float32(tot + np.float32(sc))
        per[term] = {
            "total": tot,
            "max": np.float32(grp["score"].max()),
            "avg": np.float32(tot / np.float32(len(grp))),
        }
    for mode in ["total", "max", "avg"]:
        want_rows = docs[docs["role"].isin(per)][["docid", "role"]]
        want = sorted(
            ((int(d), per[r][mode]) for d, r in want_rows.itertuples(index=False)),
            key=lambda x: (-x[1], x[0]),
        )[:20]
        got = hits(searcher.join_terms(q, "role", "role", score_mode=mode, k=20))
        assert got == want, mode
    # none: constant boost over the matched to-docs
    got_none = searcher.join_terms(
        q, "role", "role", score_mode="none", k=10**6, boost=3.0
    ).toPandas()
    assert set(got_none["docid"]) == set(
        docs[docs["role"].isin(per)]["docid"].astype(int)
    )
    assert (got_none["score"] == np.float32(3.0)).all()


def test_classification(spark, searcher, oracle_index, corpus_pdf):
    """kNN (MLT majority vote) and Naive Bayes classifiers: the kNN winner
    must match a recomputation from the oracle's MLT ranking; NB scores
    must match a direct float64 recomputation of the reference formula."""
    import math

    from lucenenet_spark.functions.analysis import tokenize_text
    from lucenenet_spark.operators import classification as cl
    from lucenenet_spark.operators.mlt import interesting_terms

    docs = corpus_pdf.reset_index(drop=True)
    text = "popcorn hello popcorn common3 common3 popcorn"
    # --- kNN ---
    terms = interesting_terms(searcher, text)
    scores = oracle.boolean_scores(oracle_index, should=terms)
    top10 = oracle.top_k(scores, 10)
    import collections

    counts = collections.Counter(docs.iloc[d]["role"] for d, _s in top10)
    want_cls = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    got_cls, got_score = cl.knn_classify(searcher, text, k=10)
    assert got_cls == want_cls[0]
    assert got_score == want_cls[1] / 10.0
    # --- Naive Bayes ---
    toks = tokenize_text(text)
    roles = sorted(docs["role"].unique())
    n_docs = len(docs)
    tok_sets = [set(tokenize_text(t)) for t in docs["text"]]
    sum_df = sum(len(s) for s in tok_sets)
    doc_count = sum(1 for s in tok_sets if s)
    avg_unique = sum_df / doc_count
    best = None
    for c in roles:
        dfc = int((docs["role"] == c).sum())
        score = math.log(dfc) - math.log(n_docs)
        den = avg_unique * dfc + n_docs
        for w in toks:
            hits = sum(
                1
                for s, r in zip(tok_sets, docs["role"])
                if r == c and w in s
            )
            score += math.log((hits + 1) / den)
        if best is None or score > best[1]:
            best = (c, score)
    got_cls, got_score = cl.naive_bayes_classify(searcher, text)
    assert got_cls == best[0]
    assert abs(got_score - 10.0 / abs(best[1])) < 1e-12
