"""Misc token filters, wave 2 — reference-vector parity.

Vectors transcribed from the reference's own tests:
Tests.Analysis.Common/Analysis/Miscellaneous/TestScandinavianFoldingFilter.cs,
TestScandinavianNormalizationFilter.cs, TestCapitalizationFilter.cs,
TestTrimFilter.cs, TestKeepWordFilter.cs, TestHyphenatedWordsFilter.cs,
Analysis/Core/TestTypeTokenFilter.cs,
Analysis/Pattern/TestPatternCaptureGroupTokenFilter.cs.
"""
import random
import re

import pytest

from lucenenet_spark.functions.miscfilters2 import (
    capitalization_filter,
    hyphenated_words,
    keep_word_filter,
    pattern_capture_tokens,
    scandinavian_fold,
    scandinavian_fold_scan,
    scandinavian_normalize,
    trim_filter,
    type_token_filter,
)

# ---------------------------------------------------------------------------
# Scandinavian folding (TestScandinavianFoldingFilter.cs Test())
# ---------------------------------------------------------------------------
FOLD_VECTORS = [
    ("aeäaeeea", "aaaeea"),
    ("aeäaeeeae", "aaaeea"),
    ("aeaeeeae", "aaeea"),
    ("bøen", "boen"),
    ("åene", "aene"),
    ("blåbærsyltetøj", "blabarsyltetoj"),
    ("blaabaarsyltetoej", "blabarsyltetoj"),
    ("blåbärsyltetöj", "blabarsyltetoj"),
    ("raksmorgas", "raksmorgas"),
    ("räksmörgås", "raksmorgas"),
    ("ræksmørgås", "raksmorgas"),
    ("raeksmoergaas", "raksmorgas"),
    ("ræksmörgaos", "raksmorgas"),
    ("ab", "ab"),
    ("ob", "ob"),
    ("Ab", "Ab"),
    ("Ob", "Ob"),
    ("å", "a"),
    ("aa", "a"),
    ("aA", "a"),
    ("ao", "a"),
    ("aO", "a"),
    ("AA", "A"),
    ("Aa", "A"),
    ("Ao", "A"),
    ("AO", "A"),
    ("æ", "a"),
    ("ä", "a"),
    ("Æ", "A"),
    ("Ä", "A"),
    ("ae", "a"),
    ("aE", "a"),
    ("Ae", "A"),
    ("AE", "A"),
    ("ö", "o"),
    ("ø", "o"),
    ("Ö", "O"),
    ("Ø", "O"),
    ("oo", "o"),
    ("oe", "o"),
    ("oO", "o"),
    ("oE", "o"),
    ("Oo", "O"),
    ("Oe", "O"),
    ("OO", "O"),
    ("OE", "O"),
    ("", ""),
]


@pytest.mark.parametrize("inp,want", FOLD_VECTORS)
def test_scandinavian_fold_vectors(inp, want):
    assert scandinavian_fold(inp) == want
    assert scandinavian_fold_scan(inp) == want


def test_fold_tiled_pass_equals_literal_scan():
    """The regexp_replace-shaped tiled pass must equal the reference's
    index-loop scan on arbitrary input (the SQL-mirror equivalence)."""
    rng = random.Random(58)
    alphabet = "aAeEoOåäæÅÄÆøöØÖbXz "
    for _ in range(3000):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(12)))
        assert scandinavian_fold(s) == scandinavian_fold_scan(s), repr(s)


# ---------------------------------------------------------------------------
# Scandinavian normalization (TestScandinavianNormalizationFilter.cs)
# ---------------------------------------------------------------------------
NORM_VECTORS = [
    ("aeäaeeea", "æææeea"),
    ("aeäaeeeae", "æææeeæ"),
    ("aeaeeeae", "ææeeæ"),
    ("bøen", "bøen"),
    ("bOEen", "bØen"),
    ("åene", "åene"),
    ("blåbærsyltetøj", "blåbærsyltetøj"),
    ("blaabaersyltetöj", "blåbærsyltetøj"),
    ("räksmörgås", "ræksmørgås"),
    ("raeksmörgaos", "ræksmørgås"),
    ("raeksmörgaas", "ræksmørgås"),
    ("raeksmoergås", "ræksmørgås"),
    ("ab", "ab"),
    ("ob", "ob"),
    ("Ab", "Ab"),
    ("Ob", "Ob"),
    ("å", "å"),
    ("aa", "å"),
    ("aA", "å"),
    ("ao", "å"),
    ("aO", "å"),
    ("AA", "Å"),
    ("Aa", "Å"),
    ("Ao", "Å"),
    ("AO", "Å"),
    ("æ", "æ"),
    ("ä", "æ"),
    ("Æ", "Æ"),
    ("Ä", "Æ"),
    ("ae", "æ"),
    ("aE", "æ"),
    ("Ae", "Æ"),
    ("AE", "Æ"),
    ("ö", "ø"),
    ("ø", "ø"),
    ("Ö", "Ø"),
    ("Ø", "Ø"),
    ("oo", "ø"),
    ("oe", "ø"),
    ("oO", "ø"),
    ("oE", "ø"),
    ("Oo", "Ø"),
    ("Oe", "Ø"),
    ("OO", "Ø"),
    ("OE", "Ø"),
    ("", ""),
]


@pytest.mark.parametrize("inp,want", NORM_VECTORS)
def test_scandinavian_norm_vectors(inp, want):
    assert scandinavian_normalize(inp) == want


def test_scandinavian_norm_cte_matches_python():
    import duckdb

    from lucenenet_spark.functions.miscfilters2 import scandinavian_norm_cte

    toks = sorted({t for t, _ in NORM_VECTORS if t})
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE rawtoks AS SELECT * FROM (VALUES %s) t(tok)"
        % ", ".join("(?)" for _ in toks),
        toks,
    )
    rows = con.execute(
        "WITH RECURSIVE %s SELECT tok, norm FROM normmap ORDER BY tok"
        % scandinavian_norm_cte()
    ).fetchall()
    assert {t: n for t, n in rows} == {
        t: scandinavian_normalize(t) for t in toks
    }


# ---------------------------------------------------------------------------
# CapitalizationFilter (TestCapitalizationFilter.cs TestCapitalization())
# ---------------------------------------------------------------------------
KEEP = frozenset({"and", "the", "it", "BIG"})


def test_capitalization_reference_vectors():
    cap = capitalization_filter
    assert cap("kiTTEN", True, KEEP, True) == "Kitten"
    assert cap("and", True, KEEP, True) == "And"
    assert cap("AnD", True, KEEP, True) == "And"
    # first is not forced, but it's not a keep word, either
    assert cap("AnD", True, KEEP, False) == "And"
    assert cap("big", True, KEEP, True) == "Big"
    assert cap("BIG", True, KEEP, True) == "BIG"
    # keyword-tokenized multi-word string, onlyFirstWord
    assert (
        cap("Hello thEre my Name is Ryan", True, KEEP, True)
        == "Hello there my name is ryan"
    )
    # now each (whitespace) token
    toks = "Hello thEre my Name is Ryan".split()
    assert [cap(t, False, KEEP, True) for t in toks] == [
        "Hello", "There", "My", "Name", "Is", "Ryan"
    ]
    # now only the long words (minWordLength=3)
    assert [
        cap(t, False, KEEP, True, min_word_length=3) for t in toks
    ] == ["Hello", "There", "my", "Name", "is", "Ryan"]
    # prefixes
    assert cap("McKinley", True, KEEP, True) == "Mckinley"
    assert cap("McKinley", True, KEEP, True, ok_prefix=("McK",)) == "McKinley"
    # numbers
    assert [
        cap(t, False, KEEP, False) for t in "1st 2nd third".split()
    ] == ["1st", "2nd", "Third"]
    # keep-set + force interplay on a keyword token
    assert cap("the The the", False, KEEP, True) == "The The the"
    # empty term
    assert cap("", True, KEEP, True) == ""


def test_capitalization_max_word_count_restores():
    # exceeding maxWordCount restores the original token verbatim
    assert (
        capitalization_filter("a b c", False, None, True, max_word_count=2)
        == "a b c"
    )
    assert (
        capitalization_filter("a b", False, None, True, max_word_count=2)
        == "A B"
    )


# ---------------------------------------------------------------------------
# Trim / KeepWord / TypeToken
# ---------------------------------------------------------------------------
def test_trim_filter_vectors():
    # TestTrimFilter.cs TestTrim(): chars <= ' ' stripped from both ends
    assert [trim_filter(t) for t in [" a ", "b   ", "cCc", "   ", ""]] == [
        "a", "b", "cCc", "", ""
    ]
    assert trim_filter("\t\n x\x00") == "x"


def test_keep_word_filter_vectors():
    # TestKeepWordFilter.cs TestStopAndGo(), the case-sensitive arm:
    # only the exact-case member survives; its position gap is preserved.
    toks = "xxx yyy aaa zzz BBB ccc ddd EEE".split()
    keep = frozenset({"aaa", "bbb"})
    t, p = keep_word_filter(toks, list(range(len(toks))), keep)
    assert t == ["aaa"] and p == [2]
    # the ignore-case arm, emulated by a case-folded set lookup upstream
    keep_ci = frozenset({"aaa", "bbb", "BBB"})
    t, p = keep_word_filter(toks, list(range(len(toks))), keep_ci)
    assert t == ["aaa", "BBB"] and p == [2, 4]


def test_type_token_filter_vectors():
    from lucenenet_spark.functions.miscfilters2 import standard_typed_scan

    scanned = standard_typed_scan("121 is palindrome, while 123 is not")
    # blacklist <NUM> (TestTypeFilter)
    got = [r[0] for r in type_token_filter(scanned, frozenset({"<NUM>"}))]
    assert got == ["is", "palindrome", "while", "is", "not"]
    # whitelist <NUM> (TestTypeFilterWhitelist)
    got = [
        r[0]
        for r in type_token_filter(scanned, frozenset({"<NUM>"}), True)
    ]
    assert got == ["121", "123"]


# ---------------------------------------------------------------------------
# HyphenatedWordsFilter (TestHyphenatedWordsFilter.cs)
# ---------------------------------------------------------------------------
def test_hyphenated_words_vectors():
    inp = "ecologi-\r\ncal devel-\r\n\r\nop compre-\thensive-hands-on and ecologi-\ncal"
    t, _ = hyphenated_words(inp.split())
    assert t == [
        "ecological", "develop", "comprehensive-hands-on", "and", "ecological"
    ]
    # final hyphen dangler keeps its hyphen (TestHyphenAtEnd)
    inp2 = inp.rsplit(" ", 2)[0] + " and ecology-"
    t, _ = hyphenated_words(inp2.split())
    assert t == [
        "ecological", "develop", "comprehensive-hands-on", "and", "ecology-"
    ]
    # TestOffsets: the combined token sits at the FIRST part's position
    toks = "abc- def geh 1234- 5678-".split()
    t, p = hyphenated_words(toks, list(range(len(toks))))
    assert t == ["abcdef", "geh", "12345678-"] and p == [0, 2, 3]


# ---------------------------------------------------------------------------
# PatternCaptureGroupTokenFilter (TestPatternCaptureGroupTokenFilter.cs)
# ---------------------------------------------------------------------------
def _caps(tok, regexes, preserve):
    return pattern_capture_tokens(
        tok, [re.compile(r) for r in regexes], preserve
    )


CAPTURE_VECTORS = [
    # (input token, patterns, preserve, expected)
    ("foobarbaz", [], False, ["foobarbaz"]),
    ("foobarbaz", [], True, ["foobarbaz"]),
    ("foobarbaz", ["xx"], False, ["foobarbaz"]),
    ("foobarbaz", ["xx"], True, ["foobarbaz"]),
    ("foobarbaz", [".."], False, ["foobarbaz"]),
    ("foobarbaz", [".."], True, ["foobarbaz"]),
    ("foobarbaz", [".(y*)"], False, ["foobarbaz"]),
    ("foobarbaz", [".(y*)"], True, ["foobarbaz"]),
    ("foobarbaz", ["(.+)"], False, ["foobarbaz"]),
    ("foobarbaz", ["(.+)"], True, ["foobarbaz"]),
    ("foobarbaz", ["^(.)"], False, ["f"]),
    ("foobarbaz", ["^(.)"], True, ["foobarbaz", "f"]),
    ("foobarbaz", ["^.(.)."], False, ["o"]),
    ("foobarbaz", ["^.(.)."], True, ["foobarbaz", "o"]),
    ("foobarbaz", ["(.)$"], False, ["z"]),
    ("foobarbaz", ["(.)$"], True, ["foobarbaz", "z"]),
    ("foobarbaz", ["^(.)(.)"], False, ["f", "o"]),
    ("foobarbaz", ["^(.)(.)"], True, ["foobarbaz", "f", "o"]),
    ("foobarbaz", ["^(.).+(.)$"], False, ["f", "z"]),
    ("foobarbaz", ["^(.).+(.)$"], True, ["foobarbaz", "f", "z"]),
    ("foobarbaz", ["(.)(.)$"], False, ["a", "z"]),
    ("foobarbaz", ["(.)(.)$"], True, ["foobarbaz", "a", "z"]),
    (
        "foobarbaz",
        ["(.(.(.)))"],
        False,
        ["foo", "oo", "o", "bar", "ar", "r", "baz", "az", "z"],
    ),
    (
        "foobarbaz",
        ["(.(.(.)))"],
        True,
        ["foobarbaz", "foo", "oo", "o", "bar", "ar", "r", "baz", "az", "z"],
    ),
    ("aaabbbaaa", ["(aaa)", "(bbb)", "(ccc)"], False, ["aaa", "bbb", "aaa"]),
    (
        "aaabbbaaa",
        ["(aaa)", "(bbb)", "(ccc)"],
        True,
        ["aaabbbaaa", "aaa", "bbb", "aaa"],
    ),
    (
        "letsPartyLIKEits1999_dude",
        [
            "([A-Z]{2,})",
            "(?<![A-Z])([A-Z][a-z]+)",
            "(?:^|\\b|(?<=[0-9_])|(?<=[A-Z]{2}))([a-z]+)",
            "([0-9]+)",
        ],
        False,
        ["lets", "Party", "LIKE", "its", "1999", "dude"],
    ),
    (
        "letsPartyLIKEits1999_dude",
        [
            "([A-Z]{2,})",
            "(?<![A-Z])([A-Z][a-z]+)",
            "(?:^|\\b|(?<=[0-9_])|(?<=[A-Z]{2}))([a-z]+)",
            "([0-9]+)",
        ],
        True,
        [
            "letsPartyLIKEits1999_dude",
            "lets",
            "Party",
            "LIKE",
            "its",
            "1999",
            "dude",
        ],
    ),
]


@pytest.mark.parametrize("tok,pats,preserve,want", CAPTURE_VECTORS)
def test_pattern_capture_vectors(tok, pats, preserve, want):
    assert _caps(tok, pats, preserve) == want


def test_pattern_capture_multiword_stream():
    # the "foo bar baz" rows are just the per-token vectors concatenated
    out = [
        s for t in "foo bar baz".split() for s in _caps(t, ["^(.)(.)"], True)
    ]
    assert out == ["foo", "f", "o", "bar", "b", "a", "baz", "b", "a"]


# ---------------------------------------------------------------------------
# UDF sanity over Spark
# ---------------------------------------------------------------------------
def test_miscfilters2_udfs(spark):
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.miscfilters2 import (
        capitalization_udf,
        hyphenated_udf,
        keep_word_udf,
        pattern_capture_udf,
        scandinavian_fold_udf,
        scandinavian_norm_udf,
        type_token_udf,
    )

    df = spark.createDataFrame(
        [
            ("blåbærsyltetøj raeksmoergaas",),
            ("ecologi- cal devel- op and ecology-",),
            ("121 is palindrome, while 123 is not",),
        ],
        "text string",
    )
    rows = df.select(
        scandinavian_fold_udf()("text").alias("fold"),
        scandinavian_norm_udf()("text").alias("norm"),
        capitalization_udf()("text").alias("cap"),
        hyphenated_udf()("text").alias("hyph"),
        keep_word_udf(frozenset({"is", "not"}))("text").alias("keep"),
        type_token_udf(frozenset({"<NUM>"}))("text").alias("nums"),
        pattern_capture_udf(("^(.)",), True)("text").alias("caps"),
    ).collect()
    assert rows[0]["fold"] == ["blabarsyltetoj", "raksmorgas"]
    assert rows[0]["norm"] == ["blåbærsyltetøj", "ræksmørgås"]
    assert rows[1]["hyph"] == ["ecological", "develop", "and", "ecology-"]
    assert rows[2]["keep"] == ["is", "is", "not"]
    assert rows[2]["nums"] == ["121", "123"]
    assert rows[0]["cap"] == ["Blåbærsyltetøj raeksmoergaas"]
    assert rows[0]["caps"] == [
        "blåbærsyltetøj", "b", "raeksmoergaas", "r"
    ]
