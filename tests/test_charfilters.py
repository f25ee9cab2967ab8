"""CharFilter stage — reference-vector parity.

Vectors from Tests.Analysis.Common/Analysis/CharFilters/
TestMappingCharFilter.cs and Analysis/Pattern/TestPatternReplaceCharFilter.cs.
"""
import pytest

from lucenenet_spark.functions.charfilters import (
    build_charmap,
    mapping_char_filter,
    pattern_replace_char_filter,
)

# TestMappingCharFilter.cs normMap
NORM_MAP = build_charmap(
    {
        "aa": "a",
        "bbb": "b",
        "cccc": "cc",
        "h": "i",
        "j": "jj",
        "k": "kkk",
        "ll": "llll",
        "empty": "",
        "\U0001d122": "fclef",
        "！": "full-width-exclamation",
    }
)

MAPPING_VECTORS = [
    ("x", "x"),  # TestNothingChange
    ("h", "i"),  # Test1to1
    ("j", "jj"),  # Test1to2
    ("k", "kkk"),  # Test1to3
    ("ll", "llll"),  # Test2to4
    ("aa", "a"),  # Test2to1
    ("bbb", "b"),  # Test3to1
    ("cccc", "cc"),  # Test4to2
    ("empty", ""),  # Test5to0
    ("\U0001d122", "fclef"),  # TestNonBMPChar
    ("！", "full-width-exclamation"),  # TestFullWidthChar
    # TestTokenStream
    ("h i j k ll cccc bbb aa", "i i jj kkk llll cc b a"),
]


@pytest.mark.parametrize("inp,want", MAPPING_VECTORS)
def test_mapping_char_filter_vectors(inp, want):
    assert mapping_char_filter(inp, NORM_MAP) == want


def test_mapping_chained():
    # TestChained: two filter passes compose ("aaaa ll h" -> "a llllllll i")
    once = mapping_char_filter("aaaa ll h", NORM_MAP)
    assert once == "aa llll i"
    assert mapping_char_filter(once, NORM_MAP) == "a llllllll i"


def test_mapping_longest_match_wins():
    # greedy longest-match: "ll" beats any 1-char rule; the FST keeps the
    # LAST final state — a 3-char key must beat its own 2-char prefix
    m = build_charmap({"l": "1", "ll": "2", "lll": "3"})
    assert mapping_char_filter("lllll", m) == "32"
    assert mapping_char_filter("llll", m) == "31"


def test_charmap_rejects_empty_key():
    with pytest.raises(ValueError):
        build_charmap({"": "x"})


# TestPatternReplaceCharFilter.cs
PATTERN_VECTORS = [
    ("(aa)\\s+(bb)\\s+(cc)", "\\1\\2\\3", "this is test.", "this is test."),
    ("(aa)\\s+(bb)\\s+(cc)", "", "aa bb cc", ""),
    ("(aa)\\s+(bb)\\s+(cc)", "\\1#\\2#\\3", "aa bb cc", "aa#bb#cc"),
    (
        "(aa)\\s+(bb)\\s+(cc)",
        "\\1##\\2###\\3",
        "aa bb cc dd",
        "aa##bb###cc dd",
    ),
    ("a", "aa", " a  a", " aa  aa"),
    ("(aa)\\s+(bb)\\s+(cc)", "\\1#\\2", "aa  bb   cc dd", "aa#bb dd"),
    (
        "(aa)\\s+(bb)\\s+(cc)",
        "\\1  \\2  \\3",
        "  aa bb cc --- aa bb aa   bb   cc",
        "  aa  bb  cc --- aa bb aa  bb  cc",
    ),
    (
        "(aa)\\s+(bb)",
        "\\1##\\2",
        "  aa bb cc --- aa bb aa. bb aa   bb cc",
        "  aa##bb cc --- aa##bb aa. bb aa##bb cc",
    ),
]


@pytest.mark.parametrize("pat,repl,inp,want", PATTERN_VECTORS)
def test_pattern_replace_char_filter_vectors(pat, repl, inp, want):
    assert pattern_replace_char_filter(inp, pat, repl) == want


def test_pattern_replace_chain():
    # TestChain: a->aa then bb->b
    s = " a bb - ccc . --- bb a . ccc ccc bb"
    out = pattern_replace_char_filter(s, "a", "aa")
    out = pattern_replace_char_filter(out, "bb", "b")
    assert out == " aa b - ccc . --- b aa . ccc ccc b"


def test_charfilter_udfs(spark):
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.charfilters import (
        mapping_filter_udf,
        pattern_replace_filter_udf,
    )

    df = spark.createDataFrame(
        [("h i j k ll cccc bbb aa",), ("aa bb cc dd",)], "text string"
    )
    rows = df.select(
        mapping_filter_udf(dict(NORM_MAP))("text").alias("mapped"),
        pattern_replace_filter_udf(
            "(aa)\\s+(bb)\\s+(cc)", "\\1#\\2#\\3"
        )("text").alias("repl"),
    ).collect()
    assert rows[0]["mapped"] == ["i", "i", "jj", "kkk", "llll", "cc", "b", "a"]
    assert rows[1]["repl"] == ["aa#bb#cc", "dd"]
