"""Miscellaneous token filters — list-level semantics + one UDF sanity.

References: Analysis/Miscellaneous/LengthFilter.cs (FilteringTokenFilter
— position gaps), TruncateTokenFilter.cs, Reverse/ReverseStringFilter.cs,
Pattern/PatternReplaceFilter.cs, LimitTokenCountFilter.cs,
KeywordRepeatFilter.cs + RemoveDuplicatesTokenFilter.cs.
"""
from lucenenet_spark.functions.miscfilters import (
    keyword_repeat_stream,
    length_filter,
    limit_token_count,
    pattern_replace_filter,
    reverse_filter,
    truncate_filter,
)
from lucenenet_spark.functions.porter import porter_stem


def test_length_filter_keeps_position_gaps():
    toks, poss = ["ab", "abc", "abcdefghi", "abcd"], [0, 1, 2, 4]
    t, p = length_filter(toks, poss, 3, 8)
    assert t == ["abc", "abcd"] and p == [1, 4]


def test_truncate_and_reverse():
    assert truncate_filter(["abcdefg", "ab"], 5) == ["abcde", "ab"]
    # ReverseStringFilterTest's canonical example
    assert reverse_filter(["Do", "have", "a", "nice", "day"]) == [
        "oD", "evah", "a", "ecin", "yad"
    ]
    assert reverse_filter(["abc"], marker="") == ["cba"]


def test_pattern_replace_first_vs_all():
    toks = ["a1b2", "x9"]
    assert pattern_replace_filter(toks, "[0-9]", "#") == ["a#b#", "x#"]
    assert pattern_replace_filter(toks, "[0-9]", "#", replace_all=False) == [
        "a#b2", "x#"
    ]


def test_limit_token_count():
    t, p = limit_token_count(["a", "b", "c"], [0, 1, 2], 2)
    assert t == ["a", "b"] and p == [0, 1]


def test_keyword_repeat_removedup():
    # 'merges' stems to 'merg' (pair emitted, same position);
    # 'a'-like unchanged stems collapse (RemoveDuplicates by term+pos)
    got = keyword_repeat_stream(["merges", "dog"], [0, 1], porter_stem)
    assert got == [("merges", 0), ("merg", 0), ("dog", 1)]


def test_misc_chain_udf_matches_list_functions(spark):
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.analysis import tokenize_with_positions
    from lucenenet_spark.functions.miscfilters import misc_chain_udf

    texts = ["the quick brownish foxes jumped over lazy dogs 42 x"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select(misc_chain_udf(3, 8, 5)(F.col("text"))).collect()[0][0]
    toks, poss = tokenize_with_positions(texts[0], "standard")
    toks, _ = length_filter(toks, poss, 3, 8)
    want = reverse_filter(truncate_filter(toks, 5))
    assert got == want
