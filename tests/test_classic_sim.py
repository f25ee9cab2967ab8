"""Classic (TF-IDF / DefaultSimilarity) query-time similarity parity.

Norm bytes are similarity-independent, so the same index serves both
scorers; only the query-side arithmetic changes (idf, sqrt-tf, raw
byte315 norm decode, queryNorm, coord).
"""
import pytest

from lucenenet_spark import oracle
from lucenenet_spark.operators.search import IndexSearcher
from lucenenet_spark.plans.query import BooleanQuery, TermQuery

from .conftest import hits


@pytest.fixture(scope="module")
def classic(spark, index_dir):
    return IndexSearcher(spark, index_dir, similarity="classic")


def test_classic_term_parity(classic, oracle_index):
    for t in ["popcorn", "hello", "common7"]:
        want = oracle.top_k(oracle.classic_term_scores(oracle_index, t), 15)
        got = hits(classic.search(TermQuery(term=t), 15))
        assert got == want, t


def test_classic_boolean_or_coord(classic, oracle_index):
    q = BooleanQuery(should=(TermQuery(term="popcorn"), TermQuery(term="hello")))
    want = oracle.top_k(
        oracle.classic_boolean_scores(oracle_index, should=["popcorn", "hello"]),
        15,
    )
    got = hits(classic.search(q, 15))
    assert got == want


def test_classic_boolean_must_msm(classic, oracle_index):
    q = BooleanQuery(
        must=(TermQuery(term="popcorn"),),
        should=(TermQuery(term="hello"), TermQuery(term="common3")),
        min_should_match=1,
    )
    want = oracle.top_k(
        oracle.classic_boolean_scores(
            oracle_index,
            must=["popcorn"],
            should=["hello", "common3"],
            min_should_match=1,
        ),
        15,
    )
    got = hits(classic.search(q, 15))
    assert got == want


def test_classic_boost_and_not(classic, oracle_index):
    q = BooleanQuery(
        should=(TermQuery(term="popcorn", boost=2.0), TermQuery(term="common5")),
        must_not=(TermQuery(term="hello"),),
    )
    want = oracle.top_k(
        oracle.classic_boolean_scores(
            oracle_index,
            should=["popcorn", "common5"],
            must_not=["hello"],
            boosts={"popcorn": 2.0},
        ),
        15,
    )
    got = hits(classic.search(q, 15))
    assert got == want


def test_bm25_unaffected(searcher, classic, oracle_index):
    # same index object graph; default searcher still scores BM25
    want = oracle.top_k(oracle.term_scores(oracle_index, "popcorn"), 10)
    assert hits(searcher.search(TermQuery(term="popcorn"), 10)) == want


# -- LM-Dirichlet ------------------------------------------------------------


@pytest.fixture(scope="module")
def lmd(spark, index_dir):
    return IndexSearcher(spark, index_dir, similarity="lmd")


def test_lmd_term_parity(lmd, oracle_index):
    import numpy as np

    for t in ["popcorn", "hello", "common7"]:
        want = oracle.top_k(oracle.lmd_term_scores(oracle_index, t), 15)
        got = hits(lmd.search(TermQuery(term=t), 15))
        assert got == want, t


def test_lmd_boolean_sum(lmd, oracle_index):
    import numpy as np

    q = BooleanQuery(
        must=(TermQuery(term="popcorn"),), should=(TermQuery(term="hello"),)
    )
    pop = oracle.lmd_term_scores(oracle_index, "popcorn")
    hel = oracle.lmd_term_scores(oracle_index, "hello")
    want_scores = {}
    for d in pop:
        s = np.float32(0.0)
        s = np.float32(s + pop[d])
        s = np.float32(s + hel.get(d, np.float32(0.0)))
        want_scores[d] = s
    want = oracle.top_k(want_scores, 15)
    got = hits(lmd.search(q, 15))
    assert got == want


def test_lmjm_term_parity(spark, index_dir, oracle_index):
    s = IndexSearcher(spark, index_dir, similarity="lmjm")
    for t in ["popcorn", "hello", "common7"]:
        want = oracle.top_k(oracle.lmjm_term_scores(oracle_index, t), 15)
        got = hits(s.search(TermQuery(term=t), 15))
        assert got == want, t


def test_dfr_gb2_term_parity(spark, index_dir, oracle_index):
    s = IndexSearcher(spark, index_dir, similarity="dfr_gb2")
    for t in ["popcorn", "hello", "common7"]:
        want = oracle.top_k(oracle.dfr_gb2_term_scores(oracle_index, t), 15)
        got = hits(s.search(TermQuery(term=t), 15))
        assert got == want, t


def test_dfr_pl2_term_parity(spark, index_dir, oracle_index):
    s = IndexSearcher(spark, index_dir, similarity="dfr_pl2")
    for t in ["popcorn", "hello", "common7"]:
        want = oracle.top_k(oracle.dfr_pl2_term_scores(oracle_index, t), 15)
        got = hits(s.search(TermQuery(term=t), 15))
        assert got == want, t


def test_dfr_inb2_term_parity(spark, index_dir, oracle_index):
    s = IndexSearcher(spark, index_dir, similarity="dfr_inb2")
    for t in ["popcorn", "hello", "common7"]:
        want = oracle.top_k(oracle.dfr_inb2_term_scores(oracle_index, t), 15)
        got = hits(s.search(TermQuery(term=t), 15))
        assert got == want, t


def test_dfr_ineb2_term_parity(spark, index_dir, oracle_index):
    s = IndexSearcher(spark, index_dir, similarity="dfr_ineb2")
    for t in ["popcorn", "hello", "common7"]:
        want = oracle.top_k(oracle.dfr_ineb2_term_scores(oracle_index, t), 15)
        got = hits(s.search(TermQuery(term=t), 15))
        assert got == want, t


def test_ib_ll_term_parity(spark, index_dir, oracle_index):
    s = IndexSearcher(spark, index_dir, similarity="ib_ll")
    for t in ["popcorn", "hello", "common7"]:
        want = oracle.top_k(oracle.ib_ll_term_scores(oracle_index, t), 15)
        got = hits(s.search(TermQuery(term=t), 15))
        assert got == want, t


def test_ib_spl_term_parity(spark, index_dir, oracle_index):
    s = IndexSearcher(spark, index_dir, similarity="ib_spl")
    for t in ["popcorn", "hello", "common7"]:
        want = oracle.top_k(oracle.ib_spl_term_scores(oracle_index, t), 15)
        got = hits(s.search(TermQuery(term=t), 15))
        assert got == want, t
