"""Analyzer chain: StandardAnalyzer-equivalent semantics (SURVEY.md §2.2).

Covers every FIXTURES.md §3 edge case plus the stop set and the 255-char
drop rule (StandardAnalyzer.cs:52, StopAnalyzer.cs:52-55).
"""
import pandas as pd

from lucenenet_spark.functions.analysis import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    _tokenize_series,
    tokenize_text,
)


def test_stop_set_is_the_33():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "with" in ENGLISH_STOP_WORDS
    assert "all" not in ENGLISH_STOP_WORDS  # used by the TestTermScorer fixture


def test_empty_and_null():
    assert tokenize_text("") == []
    assert tokenize_text(None) == []


def test_all_stopwords_vanish():
    assert tokenize_text("the of and to in") == []
    assert tokenize_text("The OF And") == []  # lowercase before stop check


def test_lowercase_unicode():
    toks = tokenize_text("Ärger STRASSE café 東京 123 C3PO")
    assert "ärger" in toks and "strasse" in toks and "café" in toks
    assert "東京" in toks and "123" in toks and "c3po" in toks


def test_long_token_dropped():
    text = "x" * 300 + " tail"
    assert tokenize_text(text) == ["tail"]
    assert tokenize_text("y" * MAX_TOKEN_LENGTH) == ["y" * MAX_TOKEN_LENGTH]


def test_punctuation_splits():
    assert tokenize_text("foo-bar foo.bar") == ["foo", "bar", "foo", "bar"]
    # dot-separated digit groups stay whole (UAX#29 MidNum-ish)
    assert tokenize_text("3.14 v1.2.3") == ["3.14", "v1.2.3"]
    assert tokenize_text("a@b.com") == ["b", "com"]  # 'a' is a stopword


def test_repeated_tokens_kept():
    assert tokenize_text("spark spark spark") == ["spark"] * 3


def test_series_matches_scalar():
    texts = [
        "",
        None,
        "The quick brown fox",
        "the of and",
        "x" * 300 + " ok",
        "Ärger 東京 3.14",
    ]
    got = _tokenize_series(pd.Series(texts)).tolist()
    want = [tokenize_text(t) for t in texts]
    assert got == want
