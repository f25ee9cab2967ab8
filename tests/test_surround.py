"""Surround query parser: the W/N proximity grammar compiles onto the span
machinery and AND/OR/NOT onto booleans
(Lucene.Net.QueryParser/Surround/Parser/QueryParser.cs,
Surround/Query/DistanceQuery.cs, TestSrndQuery-style fixtures), and the
compiled queries score exactly like hand-built ones."""
import pytest

from lucenenet_spark import oracle
from lucenenet_spark.operators import spans as sp
from lucenenet_spark.plans.query import (
    BooleanQuery,
    PrefixQuery,
    TermQuery,
    WildcardQuery,
)
from lucenenet_spark.plans.surround import parse_surround

from .conftest import hits
from .test_complex_phrase import _expand_for_oracle, _query_strings


# -- compilation shapes -------------------------------------------------------


def test_infix_w_is_ordered_distance_minus_one():
    q = parse_surround("value 3W table")
    assert isinstance(q, sp.SpanNearQuery) and q.in_order and q.slop == 2
    assert [c.term for c in q.clauses] == ["value", "table"]


def test_infix_n_is_unordered():
    q = parse_surround("value 2N table")
    assert isinstance(q, sp.SpanNearQuery) and not q.in_order and q.slop == 1


def test_bare_w_means_distance_one():
    q = parse_surround("value w table")
    assert q.slop == 0 and q.in_order


def test_prefix_distance_operator():
    q = parse_surround("4N(hash, join)")
    assert isinstance(q, sp.SpanNearQuery) and not q.in_order and q.slop == 3


def test_infix_chain_collects_operands():
    q = parse_surround("alpha W beta W gamma")
    assert len(q.clauses) == 3 and q.slop == 0


def test_boolean_ops_and_precedence():
    assert parse_surround("alpha AND beta") == BooleanQuery(
        must=(TermQuery(term="alpha"), TermQuery(term="beta"))
    )
    assert parse_surround("OR(alpha, beta, gamma)") == BooleanQuery(
        should=(
            TermQuery(term="alpha"),
            TermQuery(term="beta"),
            TermQuery(term="gamma"),
        )
    )
    # OR binds loosest: a OR b AND c == a OR (b AND c)
    q = parse_surround("alpha or beta and gamma")
    assert isinstance(q, BooleanQuery) and len(q.should) == 2
    assert q.should[1] == BooleanQuery(
        must=(TermQuery(term="beta"), TermQuery(term="gamma"))
    )


def test_not_first_must_rest_must_not():
    q = parse_surround("alpha NOT beta NOT gamma")
    assert q == BooleanQuery(
        must=(TermQuery(term="alpha"),),
        must_not=(TermQuery(term="beta"), TermQuery(term="gamma")),
    )


def test_not_is_infix_only():
    with pytest.raises(ValueError):
        parse_surround("NOT(alpha, beta)")


def test_truncation_forms():
    assert parse_surround("valu*") == PrefixQuery(prefix="valu")
    assert parse_surround("v?lue") == WildcardQuery(pattern="v?lue")
    q = parse_surround("valu* 2W table")
    assert isinstance(q.clauses[0], sp.SpanMultiTermQueryWrapper)
    assert q.clauses[0].query == PrefixQuery(prefix="valu")


def test_too_unrestrictive_truncation_raises():
    for bad in ["ab*", "a?b", "*ab"]:
        with pytest.raises(ValueError, match="Too unrestrictive"):
            parse_surround(bad)


def test_weights_multiply_boost():
    assert parse_surround("popcorn^2").boost == pytest.approx(2.0)
    assert parse_surround("popcorn^2^3").boost == pytest.approx(6.0)
    assert parse_surround("AND(alpha, beta)^1.5").boost == pytest.approx(1.5)


def test_field_prefix_retargets():
    assert parse_surround("role : user") == TermQuery(term="user", field="role")
    q = parse_surround("role:(user OR system)")
    assert q.should[0].field == "role"


def test_boolean_inside_distance_rejected():
    with pytest.raises(ValueError, match="does not allow subquery"):
        parse_surround("3W(alpha AND beta, gamma)")


def test_or_inside_distance_becomes_span_or():
    q = parse_surround("3W(OR(alpha, beta), gamma)")
    assert isinstance(q.clauses[0], sp.SpanOrQuery)
    assert {c.term for c in q.clauses[0].clauses} == {"alpha", "beta"}


def test_nested_distance_queries():
    q = parse_surround("(alpha W beta) 4N gamma")
    assert not q.in_order and q.slop == 3
    inner = q.clauses[0]
    assert isinstance(inner, sp.SpanNearQuery) and inner.in_order


def test_keyword_field_distance_rejected():
    with pytest.raises(ValueError, match="keyword"):
        parse_surround("role:(user 2W system)")


# -- engine-vs-oracle parity --------------------------------------------------


def _pairs(corpus_pdf):
    from lucenenet_spark.functions.analysis import tokenize_text

    cnt = {}
    for text in corpus_pdf["text"]:
        toks = tokenize_text(text)
        for a, b in zip(toks, toks[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    return [p for p, _ in sorted(cnt.items(), key=lambda kv: -kv[1])[:2]]


def test_surround_distance_parity(searcher, oracle_index, corpus_pdf):
    (t1, t2), (t3, t4) = _pairs(corpus_pdf)
    for qs in [
        f"{t1} 3W {t2}",
        f"{t1} 3N {t2}",
        f"4N({t3}, {t4})",
        f"{t1[:3]}* 2W {t2}",
        f"2W(OR({t1}, {t3}), {t2})",
    ]:
        q = parse_surround(qs)
        want = oracle.top_k(
            sp.span_scores_oracle(
                oracle_index, _expand_for_oracle(q, oracle_index)
            ),
            10,
        )
        assert want, qs  # fixtures must actually match documents
        got = hits(sp.span_search(searcher, q, 10))
        assert got == want, qs


def test_surround_boolean_parity(searcher, corpus_pdf):
    """AND/OR/NOT compile to the same BooleanQuery a user would hand-build,
    so search results must be identical to the explicit construction."""
    (t1, t2), _ = _pairs(corpus_pdf)
    got = hits(searcher.search(parse_surround(f"{t1} AND ({t2} OR zzzq)"), 10))
    want = hits(
        searcher.search(
            BooleanQuery(
                must=(
                    TermQuery(term=t1),
                    BooleanQuery(
                        should=(TermQuery(term=t2), TermQuery(term="zzzq"))
                    ),
                )
            ),
            10,
        )
    )
    assert got == want and got


def test_surround_distance_composes_in_boolean(searcher, oracle_index, corpus_pdf):
    (t1, t2), (t3, _) = _pairs(corpus_pdf)
    q = parse_surround(f"({t1} W {t2}) NOT {t3}")
    assert isinstance(q, BooleanQuery)
    assert isinstance(q.must[0], sp.SpanNearQuery)
    got = hits(searcher.search(q, 10))
    want = hits(
        searcher.search(
            BooleanQuery(
                must=(
                    sp.SpanNearQuery(
                        clauses=(
                            sp.SpanTermQuery(term=t1),
                            sp.SpanTermQuery(term=t2),
                        ),
                        slop=0,
                        in_order=True,
                    ),
                ),
                must_not=(TermQuery(term=t3),),
            ),
            10,
        )
    )
    assert got == want
