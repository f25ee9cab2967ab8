"""Span queries: algebra fixtures (hand-traced against the reference
algorithms) + engine-vs-oracle parity over the shared corpus."""
import numpy as np
import pytest

from lucenenet_spark import oracle
from lucenenet_spark.operators import spans as sp

from .conftest import hits


# -- algebra fixtures ---------------------------------------------------------


def P(**kw):
    return {("text", k): v for k, v in kw.items()}


def test_span_term_and_first():
    pos = P(a=[0, 3, 7])
    q = sp.SpanTermQuery(term="a")
    assert sp.eval_spans(q, pos) == [(0, 1), (3, 4), (7, 8)]
    assert sp.eval_spans(sp.SpanFirstQuery(match=q, end=4), pos) == [(0, 1), (3, 4)]


def test_span_near_ordered_basic():
    # "a ... b" within slop: a@[0,5], b@[2,6]
    pos = P(a=[0, 5], b=[2, 6])
    q = sp.SpanNearQuery(
        clauses=(sp.SpanTermQuery(term="a"), sp.SpanTermQuery(term="b")), slop=1
    )
    # anchors b@2: latest a before = 0 -> gap 1 ok -> (0,3); b@6: a@5, gap 0 -> (5,7)
    assert sp.eval_spans(q, pos) == [(0, 3), (5, 7)]
    q0 = sp.SpanNearQuery(clauses=q.clauses, slop=0)
    assert sp.eval_spans(q0, pos) == [(5, 7)]
    # order matters: b before a never matches
    qrev = sp.SpanNearQuery(
        clauses=(sp.SpanTermQuery(term="b"), sp.SpanTermQuery(term="a")), slop=10
    )
    assert sp.eval_spans(qrev, P(a=[0], b=[5])) == []


def test_span_near_unordered():
    pos = P(a=[4], b=[1])
    q = sp.SpanNearQuery(
        clauses=(sp.SpanTermQuery(term="a"), sp.SpanTermQuery(term="b")),
        slop=3,
        in_order=False,
    )
    # window (1,5): len 4 - totLen 2 = 2 <= 3
    assert sp.eval_spans(q, pos) == [(1, 5)]
    assert (
        sp.eval_spans(
            sp.SpanNearQuery(clauses=q.clauses, slop=1, in_order=False), pos
        )
        == []
    )


def test_span_not_and_or():
    pos = P(a=[0, 5], b=[5], c=[1])
    inc = sp.SpanTermQuery(term="a")
    exc = sp.SpanTermQuery(term="b")
    assert sp.eval_spans(sp.SpanNotQuery(include=inc, exclude=exc), pos) == [(0, 1)]
    orq = sp.SpanOrQuery(clauses=(inc, sp.SpanTermQuery(term="c")))
    assert sp.eval_spans(orq, pos) == [(0, 1), (1, 2), (5, 6)]


def test_span_freq_fold():
    f = sp.span_freq([(0, 1), (3, 5)])
    want = np.float32(np.float32(0.5) + np.float32(1.0) / np.float32(3))
    assert f == want


# -- engine vs oracle ---------------------------------------------------------


def _pairs(corpus_pdf):
    from lucenenet_spark.functions.analysis import tokenize_text

    cnt = {}
    for text in corpus_pdf["text"]:
        toks = tokenize_text(text)
        for a, b in zip(toks, toks[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    return [p for p, _ in sorted(cnt.items(), key=lambda kv: -kv[1])[:2]]


@pytest.mark.parametrize("slop,in_order", [(0, True), (2, True), (3, False)])
def test_span_near_parity(searcher, oracle_index, corpus_pdf, slop, in_order):
    for t1, t2 in _pairs(corpus_pdf):
        q = sp.SpanNearQuery(
            clauses=(sp.SpanTermQuery(term=t1), sp.SpanTermQuery(term=t2)),
            slop=slop,
            in_order=in_order,
        )
        want = oracle.top_k(sp.span_scores_oracle(oracle_index, q), 10)
        got = hits(sp.span_search(searcher, q, 10))
        assert got == want, (t1, t2, slop, in_order)


def test_span_first_parity(searcher, oracle_index):
    q = sp.SpanFirstQuery(match=sp.SpanTermQuery(term="popcorn"), end=5)
    want = oracle.top_k(sp.span_scores_oracle(oracle_index, q), 10)
    got = hits(sp.span_search(searcher, q, 10))
    assert got == want


def test_span_not_parity(searcher, oracle_index, corpus_pdf):
    (t1, t2), *_ = _pairs(corpus_pdf)
    q = sp.SpanNotQuery(
        include=sp.SpanTermQuery(term=t1),
        exclude=sp.SpanTermQuery(term=t2),
    )
    want = oracle.top_k(sp.span_scores_oracle(oracle_index, q), 10)
    got = hits(sp.span_search(searcher, q, 10))
    assert got == want


def test_span_or_nested_in_near_parity(searcher, oracle_index, corpus_pdf):
    (t1, t2), (t3, _t4) = _pairs(corpus_pdf)
    q = sp.SpanNearQuery(
        clauses=(
            sp.SpanOrQuery(
                clauses=(sp.SpanTermQuery(term=t1), sp.SpanTermQuery(term=t3))
            ),
            sp.SpanTermQuery(term=t2),
        ),
        slop=4,
    )
    want = oracle.top_k(sp.span_scores_oracle(oracle_index, q), 10)
    got = hits(sp.span_search(searcher, q, 10))
    assert got == want


# -- SpanMultiTermQueryWrapper ------------------------------------------------


def _prefix_vocab(oracle_index, prefix):
    return sorted(t for t in oracle_index.postings if t.startswith(prefix))


def test_span_multiterm_expands_to_sorted_span_or(searcher, oracle_index):
    from lucenenet_spark.plans.query import PrefixQuery

    terms = _prefix_vocab(oracle_index, "wo")
    assert len(terms) >= 2, "fixture needs a multi-term prefix"
    w = sp.SpanMultiTermQueryWrapper(query=PrefixQuery(prefix="wo"))
    rw = sp.expand_span_multiterm(searcher, w)
    assert isinstance(rw, sp.SpanOrQuery)
    assert [c.term for c in rw.clauses] == terms  # term order = fold order


def test_span_multiterm_wrapper_parity(searcher, oracle_index):
    """wrapper == the hand-built SpanOr over the same vocab slice, and both
    match the oracle (ScoringRewrite semantics)."""
    from lucenenet_spark.plans.query import PrefixQuery

    terms = _prefix_vocab(oracle_index, "wo")
    w = sp.SpanFirstQuery(
        match=sp.SpanMultiTermQueryWrapper(query=PrefixQuery(prefix="wo")), end=8
    )
    manual = sp.SpanFirstQuery(
        match=sp.SpanOrQuery(clauses=tuple(sp.SpanTermQuery(term=t) for t in terms)),
        end=8,
    )
    want = oracle.top_k(sp.span_scores_oracle(oracle_index, manual), 10)
    assert want, "fixture must match documents"
    assert hits(sp.span_search(searcher, w, 10)) == want
    assert hits(sp.span_search(searcher, manual, 10)) == want


def test_span_multiterm_in_near_parity(searcher, oracle_index, corpus_pdf):
    from lucenenet_spark.plans.query import PrefixQuery

    (t1, t2), *_ = _pairs(corpus_pdf)
    pre = t1[:3]
    terms = _prefix_vocab(oracle_index, pre)
    q = sp.SpanNearQuery(
        clauses=(
            sp.SpanMultiTermQueryWrapper(query=PrefixQuery(prefix=pre)),
            sp.SpanTermQuery(term=t2),
        ),
        slop=4,
    )
    manual = sp.SpanNearQuery(
        clauses=(
            sp.SpanOrQuery(clauses=tuple(sp.SpanTermQuery(term=t) for t in terms)),
            sp.SpanTermQuery(term=t2),
        ),
        slop=4,
    )
    want = oracle.top_k(sp.span_scores_oracle(oracle_index, manual), 10)
    assert want
    assert hits(sp.span_search(searcher, q, 10)) == want


def test_span_multiterm_top_terms_and_empty(searcher, oracle_index):
    from lucenenet_spark.plans.query import PrefixQuery

    terms = _prefix_vocab(oracle_index, "wo")
    w = sp.SpanMultiTermQueryWrapper(query=PrefixQuery(prefix="wo"), top_terms=2)
    rw = sp.expand_span_multiterm(searcher, w)
    assert [c.term for c in rw.clauses] == terms[:2]  # smallest-term tie-break
    empty = sp.SpanMultiTermQueryWrapper(query=PrefixQuery(prefix="zzzq"))
    assert hits(sp.span_search(searcher, empty, 10)) == []


def test_span_clause_inside_boolean(spark, index_dir, oracle_index):
    """SpanQuery IS-A Query: a span clause composes inside BooleanQuery
    via the nested path (f32 clause fold), like the reference."""
    import numpy as np

    from lucenenet_spark.operators.search import IndexSearcher
    from lucenenet_spark.operators.spans import (
        SpanNearQuery,
        SpanTermQuery,
        span_scores_oracle,
    )
    from lucenenet_spark.plans.query import BooleanQuery, TermQuery

    from .conftest import hits as _hits

    s = IndexSearcher(spark, index_dir)
    near = SpanNearQuery(
        clauses=(SpanTermQuery(term="common1"), SpanTermQuery(term="common2")),
        slop=3,
        in_order=True,
    )
    q = BooleanQuery(must=(TermQuery(term="popcorn"),), should=(near,))
    got = _hits(s.search(q, 15, prune=False))
    tmap = oracle.term_scores(oracle_index, "popcorn")
    smap = span_scores_oracle(oracle_index, near)
    want = sorted(
        (
            (d, np.float32(np.float32(sc) + smap.get(d, np.float32(0.0))))
            for d, sc in tmap.items()
        ),
        key=lambda x: (-x[1], x[0]),
    )[:15]
    assert got == want
    assert got
