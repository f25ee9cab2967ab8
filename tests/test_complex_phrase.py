"""ComplexPhraseQueryParser: wildcards/prefixes/fuzzy/groups/negations
INSIDE quoted phrases compile onto the span machinery
(QueryParser/ComplexPhrase/ComplexPhraseQueryParser.cs:256-371,
TestComplexPhraseQuery.cs) and score exactly like the hand-built spans.
"""
import pytest

from lucenenet_spark import oracle
from lucenenet_spark.operators import spans as sp
from lucenenet_spark.plans.parser import parse_complex
from lucenenet_spark.plans.query import BooleanQuery, TermQuery

from .conftest import hits


# -- compilation shapes ----------------------------------------------------------


def test_prefix_in_phrase_compiles_to_wrapper():
    q = parse_complex('"sc* popcorn"~5')
    assert isinstance(q, sp.SpanNearQuery) and q.slop == 5 and q.in_order
    w, t = q.clauses
    assert isinstance(w, sp.SpanMultiTermQueryWrapper)
    assert w.query.prefix == "sc"
    assert isinstance(t, sp.SpanTermQuery) and t.term == "popcorn"


def test_group_compiles_to_span_or():
    q = parse_complex('"(value small) table"~3')
    assert isinstance(q.clauses[0], sp.SpanOrQuery)
    assert {c.term for c in q.clauses[0].clauses} == {"value", "small"}


def test_negation_builds_span_not():
    q = parse_complex('"value -small table"~2')
    assert isinstance(q, sp.SpanNotQuery)
    # include: positives at slop+numNegatives; exclude: full seq at slop
    assert isinstance(q.include, sp.SpanNearQuery) and q.include.slop == 3
    assert isinstance(q.exclude, sp.SpanNearQuery) and q.exclude.slop == 2
    assert len(q.exclude.clauses) == 3


def test_single_plain_term_collapses_to_term_query():
    assert parse_complex('"popcorn"') == TermQuery(term="popcorn")


def test_single_multiterm_raises_like_reference():
    with pytest.raises(ValueError):
        parse_complex('"sc*"')


def test_composes_in_booleans():
    q = parse_complex('+"sc* popcorn"~5 -stream')
    assert isinstance(q, BooleanQuery)
    assert isinstance(q.must[0], sp.SpanNearQuery)


def test_empty_group_inserts_never_matching_clause():
    # all-stopword group analyzes to nothing but still occupies a position —
    # the reference's 'Dummy clause ... must match nothing' (a wildcard
    # group keeps its wrapper; ITS empty expansion never-matches at search)
    q = parse_complex('"(the) table"~1')
    assert isinstance(q.clauses[0], sp.SpanTermQuery)
    assert q.clauses[0].term.startswith("\x00")
    assert len(q.clauses) == 2


# -- engine-vs-oracle parity ------------------------------------------------------


def _expand_for_oracle(q, oracle_index):
    """Rewrite wrappers to SpanOr over the oracle vocab (ScoringRewrite's
    sorted term order) so the pure-Python span oracle can score them."""
    import re as _re

    from lucenenet_spark.plans.query import PrefixQuery, WildcardQuery

    if isinstance(q, sp.SpanMultiTermQueryWrapper):
        inner = q.query
        if isinstance(inner, PrefixQuery):
            terms = sorted(
                t for t in oracle_index.postings if t.startswith(inner.prefix)
            )
        elif isinstance(inner, WildcardQuery):
            rx = _re.compile(
                "^"
                + "".join(
                    ".*" if c == "*" else "." if c == "?" else _re.escape(c)
                    for c in inner.pattern
                )
                + "$"
            )
            terms = sorted(t for t in oracle_index.postings if rx.match(t))
        else:
            raise NotImplementedError(type(inner).__name__)
        return sp.SpanOrQuery(
            clauses=tuple(sp.SpanTermQuery(term=t) for t in terms)
        )
    if isinstance(q, sp.SpanNearQuery):
        return sp.SpanNearQuery(
            clauses=tuple(_expand_for_oracle(c, oracle_index) for c in q.clauses),
            slop=q.slop, in_order=q.in_order, boost=q.boost,
        )
    if isinstance(q, sp.SpanNotQuery):
        return sp.SpanNotQuery(
            include=_expand_for_oracle(q.include, oracle_index),
            exclude=_expand_for_oracle(q.exclude, oracle_index),
            boost=q.boost,
        )
    if isinstance(q, sp.SpanOrQuery):
        return sp.SpanOrQuery(
            clauses=tuple(_expand_for_oracle(c, oracle_index) for c in q.clauses),
            boost=q.boost,
        )
    return q


def _query_strings(corpus_pdf):
    """Complex-phrase fixtures over pairs that actually co-occur in order
    (random-vocab corpora rarely satisfy a fixed ordered near)."""
    from lucenenet_spark.functions.analysis import tokenize_text

    cnt = {}
    for text in corpus_pdf["text"]:
        toks = tokenize_text(text)
        for a, b in zip(toks, toks[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    (t1, t2), (t3, t4) = [
        p for p, _ in sorted(cnt.items(), key=lambda kv: -kv[1])[:2]
    ]
    return [
        f'"{t1[:3]}* {t2}"~5',
        f'"{t1} {t2}"~4',
        f'"({t1} {t3}) {t2}"~3',
        f'"{t3} -{t4} {t2}"~8',
        f'"{t1[:-1]}? {t2}"~6',
    ]


def test_complex_phrase_parity(searcher, oracle_index, corpus_pdf):
    for qs in _query_strings(corpus_pdf):
        q = parse_complex(qs)
        want = oracle.top_k(
            sp.span_scores_oracle(
                oracle_index, _expand_for_oracle(q, oracle_index)
            ),
            10,
        )
        got = hits(sp.span_search(searcher, q, 10))
        assert got == want, qs
        if qs.startswith('"' + "("):
            assert want, qs  # the group fixture must match documents


def test_unmatched_wildcard_clause_matches_nothing(searcher):
    """'Fred Smithe*' with no Smithe* terms must not match on just 'Fred'."""
    q = parse_complex('"popcorn zzqx*"~3')
    assert hits(sp.span_search(searcher, q, 10)) == []
    q2 = parse_complex('"(the) popcorn"~3')  # dummy clause in slot 0
    assert hits(sp.span_search(searcher, q2, 10)) == []


def test_term_reduction_scores_as_plain_term(searcher, oracle_index):
    got = hits(searcher.search(parse_complex('"popcorn"'), 10))
    want = oracle.top_k(oracle.term_scores(oracle_index, "popcorn"), 10)
    assert got == want
