"""Lucene regexp syntax (Util/Automaton/RegExp.cs, flags ALL) vs Java
regex: the grammar differences must translate or raise loudly — passing
the pattern through to rlike silently mis-matches (`\\d` means literal
'd' in Lucene, `^`/`$` are literals, `~`/`&`/`<n-m>` are automaton ops).
"""
import pytest

from lucenenet_spark.functions.regexp import (
    UnsupportedRegexp,
    lucene_regexp_to_java,
)
from lucenenet_spark.plans.query import RegexpQuery

from .conftest import hits


# -- translation unit fixtures -------------------------------------------------


@pytest.mark.parametrize(
    "lucene,java",
    [
        ("ab+c", "ab+c"),
        ("sc[ae]n", "sc[ae]n"),
        ("a|bc*", "a|bc*"),
        ("a{2,3}b", "a{2,3}b"),
        ("(ab)?c", "(?:ab)?c"),
        # \d is the LITERAL d (charexp), never the Java digit class
        ("word\\d", "wordd"),
        # ^ and $ are ordinary characters in the automaton grammar
        ("a^b", "a\\^b"),
        ("a$b", "a\\$b"),
        # quoted literal: every inner char is literal
        ('"a.b"c', "(?:a\\.b)c"),
        # any-string and empty-language
        ("a@", "a(?:.*)"),
        ("a#b", "a(?!x)xb"),
        # empty group = empty string
        ("a()b", "a(?:)b"),
        # escaped punctuation survives escaped
        ("a\\.b", "a\\.b"),
        ("a\\*b", "a\\*b"),
    ],
)
def test_translate(lucene, java):
    assert lucene_regexp_to_java(lucene) == java


@pytest.mark.parametrize(
    "pattern", ["~ab", "a~b", "ab&cd", "word<1-9>", "<10-99>"]
)
def test_unsupported_raise_loudly(pattern):
    with pytest.raises(UnsupportedRegexp):
        lucene_regexp_to_java(pattern)


@pytest.mark.parametrize("pattern", ["a{b", "a{2", "(ab", 'a"bc'])
def test_malformed_raise(pattern):
    with pytest.raises(ValueError):
        lucene_regexp_to_java(pattern)


# -- engine behavior -------------------------------------------------------------


def _matched_terms(searcher, pattern):
    q = RegexpQuery(pattern=pattern)
    got = searcher._stat_rows().filter(searcher._multiterm_cond(q))
    return {r["term"] for r in got.select("term").distinct().collect()}


def test_digit_class_is_literal(searcher, oracle_index):
    """Divergence fixture: 'word\\d' under Java matches word0..word9; under
    Lucene it matches only the term 'wordd' (absent) — so zero hits, while
    the corpus does carry digit-suffixed word terms."""
    digit_terms = {
        t for t in oracle_index.postings if t.startswith("word") and t[4:].isdigit()
    }
    assert digit_terms  # the trap exists in the corpus
    assert _matched_terms(searcher, "word\\d") == set()
    assert hits(searcher.search(RegexpQuery(pattern="word\\d"), 5)) == []


def test_interval_raises_in_search(searcher):
    with pytest.raises(UnsupportedRegexp):
        searcher.search(RegexpQuery(pattern="word<1-9>"), 5).collect()


def test_quoted_and_class_match(searcher, oracle_index):
    want = {
        t
        for t in oracle_index.postings
        if len(t) == 5 and t.startswith("word") and t[4] in "0123456789"
    }
    got = _matched_terms(searcher, '"word"[0123456789]')
    assert got == want and got
