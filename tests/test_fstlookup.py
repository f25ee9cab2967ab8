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


# --- Jaspell MatchAlmost (usePrefix=false) -------------------------------
# Literal port of the reference walk for cross-checking the closed-form
# model: TST built by GetOrCreateNode's routing (insertion order matters
# for SHAPE), walked by MatchAlmostRecursion (upTo=false) with mid-walk
# truncation (JaspellTernarySearchTrie.cs).


class _TSTNode:
    __slots__ = ("split", "lo", "eq", "hi", "data", "parent")

    def __init__(self, split, parent):
        self.split, self.parent = split, parent
        self.lo = self.eq = self.hi = None
        self.data = None


class _LiteralTrie:
    def __init__(self):
        self.root = None

    @staticmethod
    def _cmp(a, b):
        return ord(a.lower()) - ord(b.lower())

    def put(self, key, value):
        if self.root is None:
            self.root = _TSTNode(key[0], None)
        node, i = self.root, 0
        while True:
            c = self._cmp(key[i], node.split)
            if c == 0:
                i += 1
                if i == len(key):
                    node.data = value
                    return
                if node.eq is None:
                    node.eq = _TSTNode(key[i], node)
                node = node.eq
            elif c < 0:
                if node.lo is None:
                    node.lo = _TSTNode(key[i], node)
                node = node.lo
            else:
                if node.hi is None:
                    node.hi = _TSTNode(key[i], node)
                node = node.hi

    @staticmethod
    def _key_of(node):
        buf, last, cur = [node.split], node, node.parent
        while cur is not None:
            if cur.eq is last:
                buf.append(cur.split)
            last, cur = cur, cur.parent
        return "".join(reversed(buf))

    def match_almost(self, key, num, diff):
        res = []

        def rec(node, ci, d):
            if (
                node is None
                or (num != -1 and len(res) >= num)
                or d < 0
                or ci >= len(key)
            ):
                return
            c = self._cmp(key[ci], node.split)
            if d > 0 or c < 0:
                rec(node.lo, ci, d)
            nd = d if c == 0 else d - 1
            if len(key) == ci + 1 and nd == 0 and node.data is not None:
                res.append(self._key_of(node))
            rec(node.eq, ci + 1, nd)
            if d > 0 or c > 0:
                rec(node.hi, ci, d)

        rec(self.root, 0, diff)
        return res


def test_jaspell_match_almost_vs_literal_walk():
    # randomized cross-check: the closed-form model must reproduce the
    # literal trie walk for every insertion order, key, diff and cap
    import itertools
    import random

    from lucenenet_spark.operators.fstlookup import jaspell_match_almost

    rng = random.Random(42)
    alphabet = "abcd"
    vocab = sorted(
        {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 5)))
            for _ in range(60)
        }
    )
    for trial in range(30):
        words = vocab[:]
        rng.shuffle(words)  # trie SHAPE varies; the contract must not
        entries = {w: i + 1 for i, w in enumerate(words)}
        trie = _LiteralTrie()
        for w, v in entries.items():
            trie.put(w, v)
        key = rng.choice(vocab) if rng.random() < 0.5 else (
            "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 5)))
        )
        diff = rng.choice([1, 2, 3])
        num = rng.choice([-1, 1, 2, 4])
        want = trie.match_almost(key, num, diff)
        got = [
            k
            for k, _w in jaspell_match_almost(
                entries, key, None if num == -1 else num, diff
            )
        ]
        assert got == want, (key, diff, num, got, want)


def test_jaspell_match_almost_contract():
    from lucenenet_spark.operators.fstlookup import jaspell_match_almost

    entries = {"fast": 5, "part": 3, "sort": 7, "data": 2, "hash": 9,
               "scan": 1, "sorted": 4}
    # exactly-2 mismatches, same length only ("sorted" excluded), lex order
    assert jaspell_match_almost(entries, "sant", None) == [
        ("fast", 5), ("part", 3), ("sort", 7)
    ]
    # mid-walk truncation keeps the lexicographically first `count`
    assert jaspell_match_almost(entries, "sant", 2) == [
        ("fast", 5), ("part", 3)
    ]
    # exactly-diff, not up-to: an exact vocab key is NOT a match at diff=2
    assert ("fast", 5) not in jaspell_match_almost(entries, "fast", None)
    # diff=0 degenerates to exact match
    assert jaspell_match_almost(entries, "fast", None, diff=0) == [
        ("fast", 5)
    ]
    # mismatches compare LOWERCASED chars; first surface + last value win
    # for lowercase-equal keys (Put node collapse)
    entries2 = {"Fast": 5, "fAst": 8}
    assert jaspell_match_almost(entries2, "FENT", None) == [("Fast", 8)]


def test_jaspell_lookup_match_almost_arm():
    entries = {"fast": 5, "part": 3, "sort": 7, "data": 2}
    # plain: first num in walk (lex) order
    assert jaspell_lookup(entries, "sant", 2, use_prefix=False) == [
        ("fast", 5), ("part", 3)
    ]
    # onlyMorePopular: the num*2 lex slice re-ranked by weight desc
    assert jaspell_lookup(
        entries, "sant", 2, only_more_popular=True, use_prefix=False
    ) == [("sort", 7), ("fast", 5)]
    # ... and the slice quirk: num=1 asks for only 2 lex matches, so the
    # heaviest overall ("sort") is unseen
    assert jaspell_lookup(
        entries, "sant", 1, only_more_popular=True, use_prefix=False
    ) == [("fast", 5)]
    assert jaspell_lookup(entries, "zzzz", 3, use_prefix=False) == []
