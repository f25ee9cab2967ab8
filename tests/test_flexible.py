"""Flexible parser family: StandardQueryParser (precedence-aware grammar,
then flattened — Flexible/Standard/StandardQueryParser.cs +
Processors/BooleanQuery2ModifierNodeProcessor.cs) and PrecedenceQueryParser
(same grammar, nesting kept — Flexible/Precedence/PrecedenceQueryParser.cs),
plus the grammar features the classic parser lacks: open-range operators
`field:>v`, `field=v`, multi-field expansion, group boosts."""
import pytest

from lucenenet_spark.plans.flexible import (
    ParserException,
    precedence_parse,
    standard_parse,
)
from lucenenet_spark.plans.parser import parse as classic_parse
from lucenenet_spark.plans.query import (
    BooleanQuery,
    FilteredQuery,
    MatchAllQuery,
    PrefixQuery,
    TermQuery,
    TermRangeQuery,
)

from .conftest import hits


def T(t, **kw):
    return TermQuery(term=t, **kw)


# -- standard: flatten semantics ("no precedence") ----------------------------


def test_and_or_flattens_like_classic():
    # a AND b OR c -> grammar Or(And(a,b), c) -> flatten: must=[a,b] should=[c]
    q = standard_parse("alpha AND beta OR gamma")
    assert q == BooleanQuery(
        must=(T("alpha"), T("beta")), should=(T("gamma"),)
    )


def test_or_then_and_flattens():
    q = standard_parse("alpha OR beta AND gamma")
    assert q == BooleanQuery(
        must=(T("beta"), T("gamma")), should=(T("alpha"),)
    )


def test_symbol_operators_alias_keywords():
    assert standard_parse("alpha && beta") == standard_parse("alpha AND beta")
    assert standard_parse("alpha || beta") == standard_parse("alpha OR beta")


def test_not_is_a_prefix_modifier():
    q = standard_parse("alpha NOT beta")
    assert q == BooleanQuery(should=(T("alpha"),), must_not=(T("beta"),))
    assert standard_parse("alpha !beta") == q
    assert standard_parse("alpha ! beta") == q
    assert standard_parse("alpha -beta") == q


def test_explicit_modifiers_survive_and_tagging():
    # TagModifierButDoNotOverride: -c under AND keeps MOD_NOT
    q = standard_parse("alpha AND -beta")
    assert q == BooleanQuery(must=(T("alpha"),), must_not=(T("beta"),))


def test_default_operator_and_applies_to_juxtaposition_only():
    q = standard_parse("alpha beta", default_operator="AND")
    assert q == BooleanQuery(must=(T("alpha"), T("beta")))
    q = standard_parse("alpha OR beta", default_operator="AND")
    assert q == BooleanQuery(should=(T("alpha"), T("beta")))


def test_group_stops_the_flatten():
    q = standard_parse("(alpha beta) gamma")
    assert q == BooleanQuery(
        should=(BooleanQuery(should=(T("alpha"), T("beta"))), T("gamma"))
    )


def test_group_boost_multiplies_down_f32():
    q = standard_parse("(alpha beta)^2")
    assert q == BooleanQuery(
        should=(T("alpha", boost=2.0), T("beta", boost=2.0))
    )


def test_stopwords_drop_out():
    assert standard_parse("the alpha") == T("alpha")
    assert standard_parse("the of") == BooleanQuery()


# -- precedence: nesting kept --------------------------------------------------


def test_precedence_keeps_nesting():
    q = precedence_parse("alpha AND beta OR gamma")
    assert q == BooleanQuery(
        should=(BooleanQuery(must=(T("alpha"), T("beta"))), T("gamma"))
    )


def test_precedence_or_binds_tighter_than_juxtaposition():
    # Query ::= DisjQuery (DisjQuery)*: 'a b OR c' is [a, Or(b, c)]
    q = precedence_parse("alpha beta OR gamma", default_operator="AND")
    assert q == BooleanQuery(
        must=(T("alpha"), BooleanQuery(should=(T("beta"), T("gamma"))))
    )


def test_precedence_modifiers():
    q = precedence_parse("alpha AND NOT beta OR gamma")
    assert q == BooleanQuery(
        should=(
            BooleanQuery(must=(T("alpha"),), must_not=(T("beta"),)),
            T("gamma"),
        )
    )


# -- open-range / equals syntax -------------------------------------------------


def test_open_range_operators():
    q = standard_parse("turn_idx:>=3")
    assert q == FilteredQuery(query=MatchAllQuery(), where="turn_idx >= 3")
    assert standard_parse("turn_idx:>3").where == "turn_idx > 3"
    assert standard_parse("turn_idx:<3").where == "turn_idx < 3"
    assert standard_parse("turn_idx:<=3").where == "turn_idx <= 3"


def test_open_range_split_tokens():
    assert standard_parse("turn_idx: >= 3").where == "turn_idx >= 3"


def test_open_range_matches_classic_star_range():
    assert standard_parse("turn_idx:>=3") == classic_parse("turn_idx:[3 TO *]")
    assert standard_parse("turn_idx:<3") == classic_parse("turn_idx:[* TO 3}")


def test_open_range_date_bound():
    q = standard_parse("ts:<2024-01-01T00:01:00")
    assert "timestamp'2024-01-01 00:01:00'" in q.where


def test_open_range_on_text_raises():
    with pytest.raises(ParserException):
        standard_parse("text:>abc")


def test_field_equals_is_colon():
    assert standard_parse("role=user") == T("user", field="role")


# -- classic leaf productions ride along ----------------------------------------


def test_classic_leaves_unchanged():
    assert standard_parse("valu*") == PrefixQuery(prefix="valu")
    assert standard_parse("[alpha TO beta}") == TermRangeQuery(
        lower="alpha", upper="beta", include_upper=False
    )
    assert standard_parse("turn_idx:[3 TO 5]") == classic_parse(
        "turn_idx:[3 TO 5]"
    )
    p = standard_parse('"alpha beta"~2')
    assert p == classic_parse('"alpha beta"~2')


def test_unbalanced_parens_raise():
    with pytest.raises(ParserException):
        standard_parse("(alpha beta")
    with pytest.raises(ParserException):
        standard_parse("alpha beta)")


# -- multi-field expansion -------------------------------------------------------


def test_multifield_expands_unfielded_leaves():
    q = standard_parse("user", fields=("text", "role"))
    assert q == BooleanQuery(
        should=(T("user"), T("user", field="role"))
    )


def test_multifield_expansion_is_a_group():
    # the per-leaf OR group must NOT flatten into the surrounding boolean
    q = standard_parse("user AND alpha", fields=("text", "role"))
    assert q == BooleanQuery(
        must=(
            BooleanQuery(should=(T("user"), T("user", field="role"))),
            BooleanQuery(should=(T("alpha"), T("alpha", field="role"))),
        )
    )


def test_multifield_fielded_leaf_not_expanded():
    assert standard_parse("role:user", fields=("text", "role")) == T(
        "user", field="role"
    )


def test_multifield_multiterm_on_keyword_field_raises():
    with pytest.raises(ParserException, match="multiterm"):
        standard_parse("us*", fields=("text", "role"))


def test_multifield_stopword_drops_text_clause_only():
    # 'the' analyzes away on text but matches verbatim on the keyword field
    q = standard_parse("the", fields=("text", "role"))
    assert q == T("the", field="role")


# -- engine end-to-end -----------------------------------------------------------


def _common_terms(corpus_pdf, n=3):
    from lucenenet_spark.functions.analysis import tokenize_text

    cnt = {}
    for text in corpus_pdf["text"]:
        for t in tokenize_text(text):
            cnt[t] = cnt.get(t, 0) + 1
    return [t for t, _ in sorted(cnt.items(), key=lambda kv: -kv[1])[:n]]


def test_standard_parse_scores_like_classic(searcher, corpus_pdf):
    t1, t2, t3 = _common_terms(corpus_pdf)
    got = hits(searcher.search(standard_parse(f"{t1} AND {t2} OR {t3}"), 10))
    want = hits(searcher.search(classic_parse(f"{t1} AND {t2} OR {t3}"), 10))
    assert got == want


def test_precedence_parse_scores_nested(searcher, corpus_pdf):
    t1, t2, t3 = _common_terms(corpus_pdf)
    q = precedence_parse(f"{t1} AND {t2} OR {t3}")
    want = hits(
        searcher.search(
            BooleanQuery(
                should=(BooleanQuery(must=(T(t1), T(t2))), T(t3))
            ),
            10,
        )
    )
    assert hits(searcher.search(q, 10)) == want
    # nesting changes scores vs the flattened form whenever only one of
    # the AND pair matches a doc the OR term also matches
    flat = hits(searcher.search(standard_parse(f"{t1} AND {t2} OR {t3}"), 10))
    assert flat != want or len(want) == 0


def test_multifield_search_runs(searcher):
    q = standard_parse("user", fields=("text", "role"))
    rows = hits(searcher.search(q, 10))
    assert len(rows) > 0  # every 3rd turn has role=user
