"""Classic query-string parser unit tests (subset grammar, SURVEY.md §3.2)."""
import numpy as np
import pytest

from lucenenet_spark import oracle
from lucenenet_spark.plans.parser import parse

from .conftest import hits
from lucenenet_spark.plans.query import (
    BooleanQuery,
    FuzzyQuery,
    PrefixQuery,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)


def test_single_term_simplifies():
    assert parse("Hello") == TermQuery(term="hello")


def test_default_or():
    q = parse("hello world")
    assert isinstance(q, BooleanQuery)
    assert q.should == (TermQuery(term="hello"), TermQuery(term="world"))
    assert not q.must


def test_default_and_operator():
    q = parse("hello world", default_operator="AND")
    assert q.must == (TermQuery(term="hello"), TermQuery(term="world"))


def test_plus_minus():
    q = parse("+foo bar -baz")
    assert q.must == (TermQuery(term="foo"),)
    assert q.should == (TermQuery(term="bar"),)
    assert q.must_not == (TermQuery(term="baz"),)


def test_and_promotes_both_sides():
    q = parse("foo AND bar")
    assert q.must == (TermQuery(term="foo"), TermQuery(term="bar"))


def test_not():
    q = parse("foo NOT bar")
    assert q.should == (TermQuery(term="foo"),)
    assert q.must_not == (TermQuery(term="bar"),)


def test_grouping():
    q = parse("+foo (bar baz)")
    assert q.must == (TermQuery(term="foo"),)
    inner = q.should[0]
    assert isinstance(inner, BooleanQuery)
    assert inner.should == (TermQuery(term="bar"), TermQuery(term="baz"))


def test_boost():
    assert parse("foo^2.5") == TermQuery(term="foo", boost=2.5)


def test_prefix_wildcard_regex_fuzzy_range():
    assert parse("pre*") == PrefixQuery(prefix="pre")
    assert parse("wi?ld") == WildcardQuery(pattern="wi?ld")
    assert parse("/ab+c/") == RegexpQuery(pattern="ab+c")
    assert parse("roam~1") == FuzzyQuery(term="roam", max_edits=1)
    assert parse("roam~") == FuzzyQuery(term="roam", max_edits=2)
    r = parse("[alpha TO beta]")
    assert r == TermRangeQuery(lower="alpha", upper="beta", include_lower=True, include_upper=True)
    r2 = parse("{alpha TO *}")
    assert r2 == TermRangeQuery(lower="alpha", upper=None, include_lower=False, include_upper=False)


def test_query_text_is_analyzed():
    # stopwords vanish; uppercase lowered — same analyzer as indexing
    assert parse("The FOO") == TermQuery(term="foo")
    assert parse("the of") == BooleanQuery()


def test_phrase_parses():
    from lucenenet_spark.plans.query import PhraseQuery

    q = parse('"exact phrase"')
    assert isinstance(q, PhraseQuery)
    assert q.terms == ("exact", "phrase") and q.slop == 0
    q2 = parse('"exact phrase"~2^1.5')
    assert q2.slop == 2 and q2.boost == 1.5


def test_field_term_syntax():
    from lucenenet_spark.plans.query import PhraseQuery, TermQuery

    q = parse("role:user")
    assert q == TermQuery(term="user", field="role")
    q2 = parse("+popcorn role:Tool^2")
    assert TermQuery(term="Tool", field="role", boost=2.0) in q2.should
    assert parse('tool:"web search"') == TermQuery(term="web search", field="tool")
    # text: prefix is the default analyzed field
    assert parse("text:Popcorn") == TermQuery(term="popcorn")
    q3 = parse('text:"quick fox"')
    assert isinstance(q3, PhraseQuery) and q3.terms == ("quick", "fox")


def test_field_range_productions():
    """field:[a TO b] -> constant-score FilteredQuery over typed columns
    (NumericRangeQuery.cs:1 / Document/DateTools.cs semantics)."""
    from lucenenet_spark.plans.parser import parse
    from lucenenet_spark.plans.query import FilteredQuery, MatchAllQuery

    q = parse("ts:[2024-01-01 TO 2024-02-01T12:30]")
    assert isinstance(q, FilteredQuery) and isinstance(q.query, MatchAllQuery)
    assert q.where == (
        "ts >= timestamp'2024-01-01 00:00:00' "
        "AND ts <= timestamp'2024-02-01 12:30:00'"
    )
    q2 = parse("turn_idx:{1 TO 3]")
    assert q2.where == "turn_idx > 1 AND turn_idx <= 3"
    q3 = parse("role:[assistant TO user}")
    assert q3.where == "role >= 'assistant' AND role < 'user'"
    q4 = parse("ts:[* TO 2024-01-01]")
    assert q4.where == "ts <= timestamp'2024-01-01 00:00:00'"
    # bare ranges still lex as text TermRangeQuery
    from lucenenet_spark.plans.query import TermRangeQuery

    assert isinstance(parse("[aaa TO bbb]"), TermRangeQuery)


def test_field_range_search(spark, index_dir, corpus_pdf):
    from lucenenet_spark.operators.search import IndexSearcher
    from lucenenet_spark.plans.parser import parse

    s = IndexSearcher(spark, index_dir)
    got = s.search(parse("turn_idx:[2 TO 3]"), 10**6, prune=False).toPandas()
    want = corpus_pdf.reset_index(drop=True)
    want_ids = set(
        want.index[(want["turn_idx"] >= 2) & (want["turn_idx"] <= 3)].astype(int)
    )
    assert set(got["docid"]) == want_ids
    assert (got["score"] == 1.0).all()


def test_simple_query_parser_grammar():
    """SimpleQueryParser: lenient grammar, left-assoc folding, never raises
    (Lucene.Net.QueryParser/Simple/SimpleQueryParser.cs docs)."""
    from lucenenet_spark.plans.parser import simple_parse
    from lucenenet_spark.plans.query import (
        BooleanQuery,
        FuzzyQuery,
        PhraseQuery,
        PrefixQuery,
        TermQuery,
    )

    q = simple_parse("batch | merge -small")
    assert isinstance(q, BooleanQuery)
    assert [c.term for c in q.should] == ["batch", "merge"]
    assert [c.term for c in q.must_not] == ["small"]
    # left-assoc: t1 | t2 + t3 -> AND(OR(t1, t2), t3)   (doc example)
    q2 = simple_parse("t1 | t2 + t3")
    assert isinstance(q2, BooleanQuery) and len(q2.must) == 2
    inner = q2.must[0]
    assert isinstance(inner, BooleanQuery)
    assert [c.term for c in inner.should] == ["t1", "t2"]
    assert q2.must[1].term == "t3"
    # precedence group with prefix
    q3 = simple_parse("batch + (merge | sc*)")
    assert q3.must[0].term == "batch"
    assert isinstance(q3.must[1].should[1], PrefixQuery)
    # phrase with near
    q4 = simple_parse('"value table"~2')
    assert isinstance(q4, PhraseQuery) and q4.slop == 2
    # fuzzy
    q5 = simple_parse("brok~1")
    assert isinstance(q5, FuzzyQuery) and q5.max_edits == 1
    # escapes: trailing \* is literal (then analysis strips it), \- not a NOT
    assert isinstance(simple_parse("term1\\*"), TermQuery)
    assert isinstance(simple_parse("\\-term1"), TermQuery)
    # garbage never raises
    for junk in ["(((((", ")|+", '"unterminated', "a+", "-", "~", "the and"]:
        simple_parse(junk)


def test_simple_query_parser_search(spark, index_dir, oracle_index):
    from lucenenet_spark.operators.search import IndexSearcher
    from lucenenet_spark.plans.parser import simple_parse

    s = IndexSearcher(spark, index_dir)
    got = hits(s.search(simple_parse("popcorn | hello -common3"), 15))
    want = oracle.top_k(
        oracle.boolean_scores(
            oracle_index, should=["popcorn", "hello"], must_not=["common3"]
        ),
        15,
    )
    assert got == want


def test_range_clause_inside_boolean(spark, index_dir, corpus_pdf, oracle_index):
    """A field range as a boolean clause: the constant-score FilteredQuery
    composes through the nested boolean path (score = term score + 1.0
    for docs in range; MUST range restricts)."""
    from lucenenet_spark.operators.search import IndexSearcher
    from lucenenet_spark.plans.parser import parse

    s = IndexSearcher(spark, index_dir)
    q = parse("+popcorn +turn_idx:[2 TO 3]")
    got = hits(s.search(q, 20, prune=False))
    docs = corpus_pdf.reset_index(drop=True)
    in_range = set(
        docs.index[(docs["turn_idx"] >= 2) & (docs["turn_idx"] <= 3)].astype(int)
    )
    base = oracle.term_scores(oracle_index, "popcorn")
    want = sorted(
        (
            (d, np.float32(np.float32(sc) + np.float32(1.0)))
            for d, sc in base.items()
            if d in in_range
        ),
        key=lambda x: (-x[1], x[0]),
    )[:20]
    assert got == want
    assert got
