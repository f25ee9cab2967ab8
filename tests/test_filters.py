"""Filter family (round 5n): TermsFilter, FieldValueFilter,
QueryWrapperFilter, BooleanFilter, ChainedFilter — engine docid sets vs a
pandas recompute over the same corpus/docids.

References: Lucene.Net.Queries/TermsFilter.cs, Search/FieldValueFilter.cs,
Search/QueryWrapperFilter.cs, Lucene.Net.Queries/BooleanFilter.cs
(SHOULD-or -> AndNot -> And order, all-docs start for NOT-only),
Lucene.Net.Queries/ChainedFilter.cs (InitialResult + DoChain OR/AND/
ANDNOT/XOR).
"""
import pytest

from lucenenet_spark import oracle
from lucenenet_spark.plans.query import (
    CHAIN_AND,
    CHAIN_ANDNOT,
    CHAIN_OR,
    CHAIN_XOR,
    BooleanFilter,
    ChainedFilter,
    ConstantScoreQuery,
    FieldValueFilter,
    FilteredQuery,
    QueryWrapperFilter,
    TermQuery,
    TermsFilter,
)

TERM = "popcorn"


@pytest.fixture(scope="module")
def meta(corpus_pdf):
    m = corpus_pdf.reset_index(drop=True).copy()
    m["docid"] = m.index
    return m


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    from lucenenet_spark.operators.search import IndexSearcher

    return IndexSearcher(spark, index_dir)


def _docids(searcher, flt):
    return set(
        r["docid"]
        for r in searcher._filter_docids(flt).select("docid").collect()
    )


def _term_docs(oracle_index, term):
    return set(d for d, _tf in oracle_index.postings.get(term, []))


def test_terms_filter_multi_field(searcher, meta, oracle_index):
    flt = TermsFilter(
        terms=(("text", TERM), ("role", "tool"), ("text", "zzz_absent"))
    )
    want = _term_docs(oracle_index, TERM) | set(
        meta[meta["role"] == "tool"]["docid"]
    )
    assert _docids(searcher, flt) == want
    # constant-score query over the filter: every passing doc at boost
    hits = ConstantScoreQuery(filter=flt, boost=2.5)
    got = searcher.search(hits, len(want) + 10).collect()
    assert {r["docid"] for r in got} == want
    assert {float(r["score"]) for r in got} == {2.5}


def test_field_value_filter(searcher, meta):
    with_tool = set(meta[meta["tool"].notna()]["docid"])
    assert _docids(searcher, FieldValueFilter(field="tool")) == with_tool
    assert (
        _docids(searcher, FieldValueFilter(field="tool", negate=True))
        == set(meta["docid"]) - with_tool
    )


def test_query_wrapper_filter(searcher, oracle_index):
    flt = QueryWrapperFilter(query=TermQuery(term=TERM))
    assert _docids(searcher, flt) == _term_docs(oracle_index, TERM)


def test_boolean_filter(searcher, meta, oracle_index):
    pop = _term_docs(oracle_index, TERM)
    scan = _term_docs(oracle_index, "scan")
    with_tool = set(meta[meta["tool"].notna()]["docid"])
    # SHOULD or'd, AndNot, And — BooleanFilter.cs order
    flt = BooleanFilter(
        should=(
            TermsFilter(terms=(("text", TERM),)),
            TermsFilter(terms=(("text", "scan"),)),
        ),
        must_not=(FieldValueFilter(field="tool"),),
        must=(TermsFilter(terms=(("text", "scan"),)),),
    )
    want = ((pop | scan) - with_tool) & scan
    assert _docids(searcher, flt) == want
    # NOT-only starts from ALL docs
    flt2 = BooleanFilter(must_not=(TermsFilter(terms=(("text", TERM),)),))
    assert _docids(searcher, flt2) == set(meta["docid"]) - pop
    # MUST-only intersects
    flt3 = BooleanFilter(
        must=(
            TermsFilter(terms=(("text", TERM),)),
            FieldValueFilter(field="tool", negate=True),
        )
    )
    assert _docids(searcher, flt3) == pop - with_tool


def test_chained_filter(searcher, meta, oracle_index):
    pop = _term_docs(oracle_index, TERM)
    scan = _term_docs(oracle_index, "scan")
    with_tool = set(meta[meta["tool"].notna()]["docid"])
    f_pop = TermsFilter(terms=(("text", TERM),))
    f_scan = TermsFilter(terms=(("text", "scan"),))
    f_tool = FieldValueFilter(field="tool")
    # default OR chain
    assert _docids(
        searcher, ChainedFilter(filters=(f_pop, f_scan))
    ) == pop | scan
    # XOR after OR-seed
    assert _docids(
        searcher,
        ChainedFilter(filters=(f_pop, f_scan), logic=(CHAIN_OR, CHAIN_XOR)),
    ) == pop.symmetric_difference(scan)
    # leading AND seeds with the first filter (InitialResult)
    assert _docids(
        searcher,
        ChainedFilter(
            filters=(f_pop, f_tool), logic=(CHAIN_AND, CHAIN_ANDNOT)
        ),
    ) == pop - with_tool
    # leading ANDNOT seeds with the complement
    assert _docids(
        searcher,
        ChainedFilter(
            filters=(f_pop, f_scan), logic=(CHAIN_ANDNOT, CHAIN_AND)
        ),
    ) == scan - pop
    # logic length mismatch raises like the reference
    with pytest.raises(ValueError):
        _docids(
            searcher, ChainedFilter(filters=(f_pop, f_scan), logic=(0,))
        )


def test_filtered_query_with_filter(searcher, meta, oracle_index):
    # scores unchanged, docs restricted by the structured filter
    scores = oracle.term_scores(oracle_index, TERM)
    with_tool = set(meta[meta["tool"].notna()]["docid"])
    want = [
        (d, s)
        for d, s in oracle.top_k(scores, 100)
        if d in with_tool
    ][:10]
    q = FilteredQuery(
        query=TermQuery(term=TERM), filter=FieldValueFilter(field="tool")
    )
    got = [
        (r["docid"], float(r["score"]))
        for r in searcher.search(q, 10).collect()
    ]
    assert got == [(d, float(s)) for d, s in want]
