"""Bulk DAAT scorer (range-bucketed dense accumulators): forced-on parity.

The bulk path must be bit-identical to the pivot path and the oracle —
clause-ordered float32 accumulation, identical masks, identical tie-breaks —
for every boolean shape, plus deletes masking.
"""
import shutil

import pytest

from lucenenet_spark import oracle
from lucenenet_spark.operators.search import IndexSearcher
from lucenenet_spark.plans.query import BooleanQuery, DisMaxQuery, TermQuery

from .conftest import hits


@pytest.fixture()
def bulk_searcher(spark, index_dir):
    # prune_min_postings=0 drops the volume threshold -> bulk always engages
    return IndexSearcher(spark, index_dir, prune_min_postings=0)


def _oracle(oidx, k=20, **kw):
    return oracle.top_k(oracle.boolean_scores(oidx, **kw), k)


def test_bulk_or(bulk_searcher, oracle_index):
    q = BooleanQuery(
        should=(TermQuery(term="popcorn"), TermQuery(term="word7"), TermQuery(term="common3"))
    )
    assert hits(bulk_searcher.search(q, 20)) == _oracle(
        oracle_index, should=["popcorn", "word7", "common3"]
    )


def test_bulk_and(bulk_searcher, oracle_index):
    q = BooleanQuery(must=(TermQuery(term="popcorn"), TermQuery(term="common3")))
    assert hits(bulk_searcher.search(q, 20)) == _oracle(
        oracle_index, must=["popcorn", "common3"]
    )


def test_bulk_mixed_not(bulk_searcher, oracle_index):
    q = BooleanQuery(
        must=(TermQuery(term="popcorn"),),
        should=(TermQuery(term="word7"),),
        must_not=(TermQuery(term="common3"),),
    )
    assert hits(bulk_searcher.search(q, 20)) == _oracle(
        oracle_index, must=["popcorn"], should=["word7"], must_not=["common3"]
    )


@pytest.mark.parametrize("msm", [2, 3])
def test_bulk_msm(bulk_searcher, oracle_index, msm):
    terms = ["popcorn", "word7", "common3", "hello"]
    q = BooleanQuery(
        should=tuple(TermQuery(term=t) for t in terms), min_should_match=msm
    )
    assert hits(bulk_searcher.search(q, 20, prune=False)) == _oracle(
        oracle_index, should=terms, min_should_match=msm
    )


@pytest.mark.parametrize("tie", [0.0, 0.3])
def test_bulk_dismax(bulk_searcher, oracle_index, tie):
    terms = ["popcorn", "word7"]
    q = DisMaxQuery(queries=tuple(TermQuery(term=t) for t in terms), tie_breaker=tie)
    assert hits(bulk_searcher.search(q, 15)) == oracle.top_k(
        oracle.dismax_scores(oracle_index, terms, tie), 15
    )


def test_bulk_large_k_exceeds_range_topk(bulk_searcher, oracle_index):
    """k larger than any per-range candidate count: full result set ordering."""
    q = BooleanQuery(should=(TermQuery(term="popcorn"), TermQuery(term="word7")))
    assert hits(bulk_searcher.search(q, 500)) == _oracle(
        oracle_index, k=500, should=["popcorn", "word7"]
    )


def test_bulk_respects_deletes(spark, index_dir, oracle_index, tmp_path):
    d = str(tmp_path / "bulkdel")
    shutil.copytree(index_dir, d)
    s = IndexSearcher(spark, d, prune_min_postings=0)
    s.delete_by_term("hello")
    s2 = IndexSearcher(spark, d, prune_min_postings=0)
    hello_docs = {doc for doc, _ in oracle_index.postings["hello"]}
    got = hits(
        s2.search(
            BooleanQuery(should=(TermQuery(term="popcorn"), TermQuery(term="word7"))), 30
        )
    )
    want = [
        (doc, sc)
        for doc, sc in _oracle(oracle_index, k=10**6, should=["popcorn", "word7"])
        if doc not in hello_docs
    ][:30]
    assert got == want
