"""Suggest lookup family — reference-vector parity (FSTCompletionTest.cs,
WFSTCompletionTest.cs, TestTSTLookup semantics)."""
import pytest

from lucenenet_spark.operators.fstlookup import (
    fst_completion_build,
    fst_completion_lookup,
    jaspell_lookup,
    tst_lookup,
    wfst_lookup,
)

# FSTCompletionTest.cs EvalKeys() — buckets given directly
EVAL = {
    "one": 0, "oneness": 1, "onerous": 1, "onesimus": 1,
    "two": 1, "twofold": 1, "twonk": 1,
    "thrive": 1, "through": 1, "threat": 1, "three": 1,
    "foundation": 1, "fourblah": 1, "fourteen": 1,
    "four": 0, "fourier": 0, "fourty": 0,
    "xo": 1,
}


def test_exact_match_high_priority():
    assert fst_completion_lookup(EVAL, "two", 1) == [("two", 1)]


def test_exact_match_low_priority():
    assert fst_completion_lookup(EVAL, "one", 2) == [
        ("one", 0), ("oneness", 1)
    ]


def test_exact_match_reordering():
    assert fst_completion_lookup(EVAL, "four", 4) == [
        ("four", 0), ("fourblah", 1), ("fourteen", 1), ("fourier", 0)
    ]


def test_requested_count():
    assert fst_completion_lookup(EVAL, "four", 2) == [
        ("four", 0), ("fourblah", 1)
    ]
    # no promotion without exactFirst
    assert fst_completion_lookup(EVAL, "one", 2, exact_first=False) == [
        ("oneness", 1), ("onerous", 1)
    ]
    # alphabetical mode
    assert fst_completion_lookup(
        EVAL, "one", 2, higher_weights_first=False
    ) == [("one", 0), ("oneness", 1)]


def test_full_match_list_keeps_natural_order():
    # TestFullMatchList: the list never fills, so no exactFirst fix-up
    assert fst_completion_lookup(EVAL, "one", 10**9) == [
        ("oneness", 1), ("onerous", 1), ("onesimus", 1), ("one", 0)
    ]


def test_miss_and_empty():
    assert fst_completion_lookup(EVAL, "xyz", 1) == []
    assert fst_completion_lookup(EVAL, "", 10) == []


def test_bucket_discretization():
    # FSTCompletionLookup.Build: sorted by weight, bucket = line*b//n,
    # equal weights reuse the previous bucket
    t = fst_completion_build(
        [("a", 5), ("b", 5), ("c", 1), ("d", 9), ("e", 7)], buckets=5
    )
    # sorted: c(1)@0, a(5)@1, b(5)@2(reuses 1's bucket), e(7)@3, d(9)@4
    assert t == {"c": 0, "a": 1, "b": 1, "e": 3, "d": 4}


def test_bucket_range_check():
    with pytest.raises(ValueError):
        fst_completion_build([("a", 1)], buckets=0)
    with pytest.raises(ValueError):
        fst_completion_build([("a", -1)])


# WFSTCompletionTest.cs TestBasic/TestExactFirst/TestNonExactFirst
WKEYS = {"foo": 50, "bar": 10, "barbar": 12, "barbara": 6}


def test_wfst_basic():
    assert wfst_lookup(WKEYS, "f", 2) == [("foo", 50)]
    # no dup exact suggestion
    assert wfst_lookup(WKEYS, "foo", 2) == [("foo", 50)]
    # exactFirst returns 'bar' at topN=1 though barbar is higher
    assert wfst_lookup(WKEYS, "bar", 1) == [("bar", 10)]
    assert wfst_lookup(WKEYS, "b", 2) == [("barbar", 12), ("bar", 10)]
    assert wfst_lookup(WKEYS, "ba", 3) == [
        ("barbar", 12), ("bar", 10), ("barbara", 6)
    ]


def test_wfst_exact_first_modes():
    keys = {"x y": 20, "x": 2}
    for top_n in (1, 2, 3):
        res = wfst_lookup(keys, "x", top_n, exact_first=True)
        assert len(res) == min(top_n, 2)
        assert res[0] == ("x", 2)
        if top_n > 1:
            assert res[1] == ("x y", 20)
    # non-exact-first: pure weight order
    assert wfst_lookup(keys, "x", 2, exact_first=False) == [
        ("x y", 20), ("x", 2)
    ]


def test_tst_lookup():
    keys = {"bar": 10, "barbar": 12, "barbara": 6, "foo": 50}
    # alphabetical arm: first num in sorted order
    assert tst_lookup(keys, "bar", 2) == [("bar", 10), ("barbar", 12)]
    # onlyMorePopular: weight desc over ALL matches
    assert tst_lookup(keys, "bar", 2, only_more_popular=True) == [
        ("barbar", 12), ("bar", 10)
    ]
    assert tst_lookup(keys, "zzz", 3) == []


def test_jaspell_lookup_prefix_slice_quirk():
    # onlyMorePopular asks the trie for num*2 matches FIRST (alphabetical
    # slice), then ranks that slice by weight
    keys = {"aa": 1, "ab": 9, "ac": 2, "ad": 3, "ae": 8}
    assert jaspell_lookup(keys, "a", 2, only_more_popular=True) == [
        ("ab", 9), ("ad", 3)  # slice = aa,ab,ac,ad (num*2=4); ae unseen
    ]
    assert jaspell_lookup(keys, "a", 3) == [
        ("aa", 1), ("ab", 9), ("ac", 2)
    ]
    with pytest.raises(NotImplementedError):
        jaspell_lookup(keys, "a", 2, use_prefix=False)
