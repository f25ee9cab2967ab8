"""Misc token filters wave 3 — reference-vector parity.

Vectors from TestStemmerOverrideFilter.cs, TestCodepointCountFilter.cs,
TestLimitTokenPositionFilter.cs, TestKeywordMarkerFilter.cs semantics.
"""
from lucenenet_spark.functions.miscfilters3 import (
    codepoint_count_filter,
    limit_token_position,
    stemmer_override_stream,
)
from lucenenet_spark.functions.porter import porter_stem


def test_stemmer_override_vector():
    # TestOverride: "booked" overridden to "books"; Porter must NOT then
    # stem "books" (the override marks it keyword)
    got = stemmer_override_stream(["booked"], {"booked": "books"}, porter_stem)
    assert got == ["books"]
    assert porter_stem("books") == "book"  # i.e. the keyword mark mattered


def test_stemmer_override_unmatched_stems():
    got = stemmer_override_stream(
        ["booked", "walked"], {"booked": "books"}, porter_stem
    )
    assert got == ["books", porter_stem("walked")]


def test_keyword_marker_set_and_pattern():
    # SetKeywordMarkerFilter / PatternKeywordMarkerFilter ahead of Porter
    got = stemmer_override_stream(
        ["walked", "running", "jumping"],
        {},
        porter_stem,
        keyword_set=frozenset({"walked"}),
        keyword_pattern=r"ing$",
    )
    assert got == ["walked", "running", "jumping"]
    # keyword-marked terms are NOT overridden either (reference order:
    # marker runs before override, and override skips keyworded terms)
    got = stemmer_override_stream(
        ["walked"],
        {"walked": "XX"},
        porter_stem,
        keyword_set=frozenset({"walked"}),
    )
    assert got == ["walked"]


def test_codepoint_count_filter_vector():
    # TestFilterWithPosIncr: (2,6) keeps short/ab/foo with position gaps
    toks = "short toolong evenmuchlongertext a ab toolong foo".split()
    t, p = codepoint_count_filter(toks, list(range(len(toks))), 2, 6)
    assert t == ["short", "ab", "foo"]
    # increments 1,4,2 == absolute positions 0,4,6
    assert p == [0, 4, 6]
    # non-BMP char counts as ONE code point
    t, _ = codepoint_count_filter(["\U00029079"], [0], 1, 1)
    assert t == ["\U00029079"]


def test_limit_token_position_vector():
    # TestMaxPosition2: first two tokens survive
    toks = "1 2 3 4 5".split()
    t, p = limit_token_position(toks, list(range(len(toks))), 2)
    assert t == ["1", "2"] and p == [0, 1]
    t, _ = limit_token_position(toks, list(range(len(toks))), 0)
    assert t == []


def test_miscfilters3_udfs(spark):
    from lucenenet_spark.functions.miscfilters3 import (
        codepoint_limit_udf,
        stemmer_override_udf,
    )

    df = spark.createDataFrame(
        [("booked walked query value",), ("aa b cccccccc dd ee ff gg",)],
        "text string",
    )
    rows = df.select(
        stemmer_override_udf(
            {"booked": "books"}, keyword_set=frozenset({"query"})
        )("text").alias("o"),
        codepoint_limit_udf(2, 6, 5)("text").alias("c"),
    ).collect()
    assert rows[0]["o"] == ["books", porter_stem("walked"), "query", "valu"]
    # codepoint (2,6) drops 'b' and 'cccccccc'; position limit 5 keeps
    # raw slots 0..4 only -> aa, dd, ee survive
    assert rows[1]["c"] == ["aa", "dd", "ee"]
