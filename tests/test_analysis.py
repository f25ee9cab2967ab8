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
    assert tokenize_text("foo-bar ac/dc") == ["foo", "bar", "ac", "dc"]
    # MidNumLet '.' joins across letters AND digits (UAX#29 WB6/7/11/12)
    assert tokenize_text("3.14 v1.2.3 foo.bar") == ["3.14", "v1.2.3", "foo.bar"]
    assert tokenize_text("a@b.com") == ["b.com"]  # 'a' is a stopword


# raw-tokenizer expectations lifted verbatim from the reference's
# Lucene.Net.Tests.Analysis.Common/Analysis/Core/TestStandardAnalyzer.cs
# (TestMid, TestApostrophesSA, TestNumericSA, TestAlphanumericSA,
# TestVariousTextSA) — pre-lowercase/stop, so compare on the raw regex.
UAX29_REFERENCE_CASES = {
    "A:B": ["A:B"],  # ':' MidLetter, letter both sides
    "A::B": ["A", "B"],  # consecutive mids split
    "1.2": ["1.2"],
    "A.B": ["A.B"],
    "1..2": ["1", "2"],
    "1,2": ["1,2"],  # ',' MidNum, digit both sides
    "1,,2": ["1", "2"],
    "A.:B": ["A", "B"],
    "A:.B": ["A", "B"],
    "1,.2": ["1", "2"],
    "1.,2": ["1", "2"],
    "O'Reilly's": ["O'Reilly's"],
    "don't": ["don't"],
    "B2B": ["B2B"],
    "2B": ["2B"],
    "21.35": ["21.35"],
    "216.239.63.104": ["216.239.63.104"],
    "some-dashed-phrase": ["some", "dashed", "phrase"],
    "dogs,chase,cats": ["dogs", "chase", "cats"],
    "David has 5000 bones": ["David", "has", "5000", "bones"],
    "a@b.com": ["a", "b.com"],
    "3.com": ["3", "com"],  # '.' needs SAME side types
    "foo_bar _tag x_ ___": ["foo_bar", "_tag", "x_"],  # ExtendNumLet
    "\"QUOTED\" word": ["QUOTED", "word"],
}


def test_uax29_reference_fixtures():
    import re

    from lucenenet_spark.functions.analysis import TOKEN_PATTERN

    rx = re.compile(TOKEN_PATTERN, re.UNICODE)
    for text, want in UAX29_REFERENCE_CASES.items():
        assert rx.findall(text) == want, text


def test_uax29_duckdb_parity_randomized():
    """The RE2 pattern fed to the DuckDB oracles must tokenize EXACTLY like
    the Python pattern used by the Spark UDFs — fuzz over the joinable
    punctuation alphabet."""
    import random
    import re

    import duckdb

    from lucenenet_spark.functions.analysis import (
        TOKEN_PATTERN,
        TOKEN_PATTERN_RE2_SQL,
    )

    rx = re.compile(TOKEN_PATTERN, re.UNICODE)
    rng = random.Random(429)
    alphabet = "ab z19'.,:;_-·’‘@ "
    con = duckdb.connect()
    sql = f"select regexp_extract_all(?, '{TOKEN_PATTERN_RE2_SQL}')"
    for _ in range(400):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 24)))
        assert con.execute(sql, [s]).fetchone()[0] == rx.findall(s), repr(s)


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
