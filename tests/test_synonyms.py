"""Query-time synonyms: SolrSynonymParser format + QueryBuilder expansion
shapes (plans/synonyms.py; Analysis/Synonym/SolrSynonymParser.cs,
Util/QueryBuilder.cs)."""

from __future__ import annotations

import pytest

from lucenenet_spark.plans.parser import parse
from lucenenet_spark.plans.query import (
    BooleanQuery, MultiPhraseQuery, PhraseQuery, TermQuery,
)
from lucenenet_spark.plans.synonyms import (
    expand_query, parse_solr_synonyms,
)


def test_solr_format():
    m = parse_solr_synonyms(
        "# comment\n"
        "merge, join\n"
        "table => value\n"
        "aa, bb => cc\n"
    )
    # expand=true group: every member maps to the whole group in order
    assert m["merge"] == ("merge", "join")
    assert m["join"] == ("merge", "join")
    # explicit mapping drops the original
    assert m["table"] == ("value",)
    assert m["aa"] == ("cc",) and m["bb"] == ("cc",)
    assert "value" not in m and "cc" not in m
    # all-stopword entries raise like SolrSynonymParser's AnalyzeException
    with pytest.raises(ValueError, match="zero tokens"):
        parse_solr_synonyms("the, merge")


def test_solr_format_expand_false_and_escapes():
    m = parse_solr_synonyms("merge, join", expand=False)
    assert m["join"] == ("merge",) and m["merge"] == ("merge",)
    # escaped comma protects the PARSER split but analysis still applies:
    # "foo,bar" tokenizes to two words -> rejected like any multi-word
    with pytest.raises(ValueError, match="2 tokens"):
        parse_solr_synonyms(r"foo\,bar => baz")
    # digits DO join across a comma (UAX#29 MidNum): "3,000" is one token
    m3 = parse_solr_synonyms(r"3\,000 => 3000")
    assert m3["3,000"] == ("3000",)


def test_entries_are_analyzed():
    # entries run through the index analyzer: stemming applies
    m = parse_solr_synonyms("merges, joins", analyzer="english")
    assert m["merg"] == ("merg", "join")


def test_multiword_rejected():
    with pytest.raises(ValueError, match="multi-word"):
        parse_solr_synonyms("usa => united states")
    with pytest.raises(ValueError, match="=>"):
        parse_solr_synonyms("a => b => c")


def test_term_expansion_shape():
    m = parse_solr_synonyms("merge, join")
    q = expand_query(parse("join"), m)
    assert isinstance(q, BooleanQuery)
    assert [c.term for c in q.should] == ["merge", "join"]
    # unmapped terms pass through
    assert expand_query(parse("xyz"), m) == parse("xyz")


def test_phrase_expansion_shape():
    # single-output mapping rewrites the phrase in place
    m = parse_solr_synonyms("table => value")
    q = expand_query(parse('"table hash"'), m)
    assert isinstance(q, PhraseQuery) and q.terms == ("value", "hash")
    # multi-output mapping becomes a MultiPhraseQuery position
    m2 = parse_solr_synonyms("table, value")
    q2 = expand_query(parse('"table hash"'), m2)
    assert isinstance(q2, MultiPhraseQuery)
    assert q2.term_arrays == (("table", "value"), ("hash",))
    # slop survives
    q3 = expand_query(parse('"table hash"~2'), m2)
    assert q3.slop == 2


def test_boolean_recursion_and_keyword_fields():
    m = parse_solr_synonyms("merge, join")
    q = expand_query(parse("+join -hash role:user"), m)
    assert isinstance(q, BooleanQuery)
    inner = q.must[0]
    assert isinstance(inner, BooleanQuery)
    assert [c.term for c in inner.should] == ["merge", "join"]
    # must_not leaf untouched; keyword field terms expand too only via
    # the text map (role:user is a TermQuery on another field — the map
    # is keyed on analyzed text, 'user' is not in it)
    assert TermQuery(term="hash") in q.must_not


def test_engine_parity(spark, index_dir):
    # OR expansion scores identically to the hand-built BooleanQuery
    from lucenenet_spark.operators.search import IndexSearcher

    s = IndexSearcher(spark, index_dir)
    m = parse_solr_synonyms("merge, join")
    a = s.search(expand_query(parse("join"), m), 10).collect()
    b = s.search(
        BooleanQuery(should=(TermQuery(term="merge"),
                             TermQuery(term="join"))), 10
    ).collect()
    assert [(r.docid, r.score) for r in a] == [
        (r.docid, r.score) for r in b]
