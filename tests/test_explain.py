"""IndexSearcher.explain() parity: every numeric leaf of the Explanation
tree matches the pure-Python oracle, and the exposed score column is
bit-identical to search() — i.e. the leaves genuinely recompose.

Reference: IndexSearcher.Explain -> Weight.Explain;
BM25Similarity.cs ExplainScore:296-320, TFIDFSimilarity.cs :720-767.
"""
import numpy as np
import pytest

from lucenenet_spark import oracle
from lucenenet_spark.functions.smallfloat import DECODE_TABLE
from lucenenet_spark.operators.search import IndexSearcher
from lucenenet_spark.plans.query import BooleanQuery, PhraseQuery, TermQuery

from .conftest import hits

TERMS = ["popcorn", "hello", "common7"]


def _rows(df):
    return {r["docid"]: r.asDict() for r in df.collect()}


def test_explain_bm25_leaves(searcher, oracle_index):
    cache = oracle.norm_cache(1.2, 0.75, oracle_index.avgdl)
    for t in TERMS:
        plist = dict(oracle_index.postings[t])
        df_t = len(plist)
        idf = oracle.idf(df_t, oracle_index.max_doc)
        got = _rows(searcher.explain(TermQuery(term=t), k=15))
        want = oracle.top_k(oracle.term_scores(oracle_index, t), 15)
        assert [(d, np.float32(got[d]["score"])) for d, _ in want] == want, t
        for docid, _score in want:
            row = got[docid]
            assert row["freq"] == plist[docid]
            assert row["df"] == df_t
            assert np.float32(row["idf"]) == idf
            nb = oracle_index.norm_bytes[docid]
            assert np.float32(row["norm_k"]) == cache[nb]
            # leaves recompose: f32(f32(w*freq)/f32(freq+norm_k)) == score
            w = np.float32(
                np.float32(idf) * np.float32(np.float32(1.2) + np.float32(1.0))
            )
            fr = np.float32(row["freq"])
            recomposed = np.float32(w * fr / (fr + np.float32(row["norm_k"])))
            assert recomposed == np.float32(row["score"])


def test_explain_classic_leaves(spark, index_dir, oracle_index):
    classic = IndexSearcher(spark, index_dir, similarity="classic")
    for t in TERMS:
        plist = dict(oracle_index.postings[t])
        df_t = len(plist)
        idf = oracle.classic_idf(df_t, oracle_index.max_doc)
        qw = np.float32(idf * np.float32(1.0))
        qnorm = np.float32(
            np.float64(1.0) / np.sqrt(np.float64(np.float32(qw * qw)))
        )
        got = _rows(classic.explain(TermQuery(term=t), k=15))
        want = oracle.top_k(oracle.classic_term_scores(oracle_index, t), 15)
        assert [(d, np.float32(got[d]["score"])) for d, _ in want] == want, t
        for docid, _score in want:
            row = got[docid]
            assert row["freq"] == plist[docid]
            assert row["df"] == df_t
            assert np.float32(row["idf"]) == idf
            assert np.float32(row["query_norm"]) == qnorm
            nb = oracle_index.norm_bytes[docid]
            assert np.float32(row["field_norm"]) == DECODE_TABLE[nb]
            value = np.float32(np.float32(qw * qnorm) * idf)
            recomposed = np.float32(
                np.float32(np.float32(np.sqrt(np.float32(row["freq"]))) * value)
                * np.float32(row["field_norm"])
            )
            assert recomposed == np.float32(row["score"])


def test_explain_matches_search_bit_exact(searcher):
    got = hits(
        searcher.explain(TermQuery(term="popcorn"), k=10).select("docid", "score")
    )
    assert got == hits(searcher.search(TermQuery(term="popcorn"), 10))


def test_explain_single_should_unwraps(searcher):
    q = BooleanQuery(should=(TermQuery(term="hello"),))
    got = hits(searcher.explain(q, k=10).select("docid", "score"))
    assert got == hits(searcher.search(TermQuery(term="hello"), 10))


def test_explain_absent_term_empty(searcher):
    assert searcher.explain(TermQuery(term="zzzqx"), k=10).count() == 0


def test_explain_unsupported_raises(searcher, spark, index_dir):
    with pytest.raises(NotImplementedError):
        searcher.explain(PhraseQuery(terms=("hello", "world")))
    lmd = IndexSearcher(spark, index_dir, similarity="lmd")
    with pytest.raises(NotImplementedError):
        lmd.explain(TermQuery(term="hello"))
