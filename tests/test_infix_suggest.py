"""AnalyzingInfixSuggester + BlendedInfixSuggester semantics.

References: Suggest/Analyzing/AnalyzingInfixSuggester.cs (last-token
prefix vs trailing-discarded exact, allTermsRequired, weight-desc sort),
BlendedInfixSuggester.cs (position coefficient, (long) truncation,
LOOKUP_COMP reversed tie-break).
"""
import pytest

from lucenenet_spark.operators.suggest import (
    blended_infix_lookup,
    infix_lookup,
)

ENTRIES = [
    ("lucene in action", 10),
    ("action lucene", 9),
    ("just lucene", 8),
    ("lucy the dog", 7),
    ("unrelated words here", 6),
    ("lucene lucene lucene", 5),
]


@pytest.fixture(scope="module")
def entries(spark):
    return spark.createDataFrame(ENTRIES, "surface string, weight long")


def _surfaces(df):
    return [r["surface"] for r in df.collect()]


def test_last_token_is_prefix(entries):
    got = _surfaces(infix_lookup(entries, "luc", k=10))
    # every suggestion with a token starting 'luc', weight desc
    assert got == [
        "lucene in action", "action lucene", "just lucene",
        "lucy the dog", "lucene lucene lucene",
    ]


def test_trailing_space_forces_exact(entries):
    got = _surfaces(infix_lookup(entries, "luc ", k=10))
    assert got == []  # no token is exactly 'luc'
    got = _surfaces(infix_lookup(entries, "lucene ", k=10))
    assert "lucy the dog" not in got and len(got) == 4


def test_all_terms_required_vs_should(entries):
    # 'action' exact + 'luc' prefix
    got = _surfaces(infix_lookup(entries, "action luc", k=10))
    assert got == ["lucene in action", "action lucene"]
    got = _surfaces(
        infix_lookup(entries, "action luc", k=10, all_terms_required=False)
    )
    # SHOULD: anything matching either term
    assert got == [
        "lucene in action", "action lucene", "just lucene",
        "lucy the dog", "lucene lucene lucene",
    ]


def test_blended_reciprocal_positions(entries):
    got = {
        r["surface"]: r["score"]
        for r in blended_infix_lookup(
            entries, "lucene", k=10, blender="reciprocal"
        ).collect()
    }
    # raw startswith key -> coefficient 1
    assert got["lucene in action"] == 10
    assert got["lucene lucene lucene"] == 5
    # 'action lucene': first match at position 1 -> 9 * 1/2 = 4.5 -> 4
    assert got["action lucene"] == 4
    # 'just lucene': position 1 -> 8 * 1/2 = 4.0 -> 4
    assert got["just lucene"] == 4


def test_blended_linear_and_truncation_toward_zero(spark):
    rows = [("a b c d e f g h i j k l lucene", 100)]
    df = spark.createDataFrame(rows, "surface string, weight long")
    got = blended_infix_lookup(df, "lucene", k=5, blender="linear").collect()
    # position 12 -> coefficient 1 - 1.2 = -0.2 -> 100 * -0.2 = -20
    assert [(r["surface"], r["score"]) for r in got] == [(rows[0][0], -20)]


def test_blended_tiebreak_is_reversed_comparator(spark):
    # equal scores -> surface DESC (LOOKUP_COMP sorts asc and the result
    # list is reversed)
    rows = [("lucene aaa", 5), ("lucene zzz", 5)]
    df = spark.createDataFrame(rows, "surface string, weight long")
    got = _surfaces(blended_infix_lookup(df, "lucene", k=2))
    assert got == ["lucene zzz", "lucene aaa"]


def test_blended_rejects_unknown_blender(entries):
    with pytest.raises(ValueError):
        blended_infix_lookup(entries, "luc", blender="quadratic")
