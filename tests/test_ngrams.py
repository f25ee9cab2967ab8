"""NGram / EdgeNGram / CommonGrams filters (functions/ngram.py) —
CommonGrams verified against every vector in the reference's own
CommonGramsFilterTest.cs (both the indexing filter with position
increments and the query-side state machine)."""

from __future__ import annotations

from lucenenet_spark.functions.ngram import (
    common_grams, common_grams_query, edge_ngrams, ngrams,
)

# CommonGramsFilterTest.cs commonWords (ignoreCase=false there; all our
# tokens are lowercased already)
COMMON = frozenset(["s", "a", "b", "c", "d", "the", "of"])


def test_edge_ngrams():
    assert edge_ngrams("abcde", 1, 3) == ["a", "ab", "abc"]
    assert edge_ngrams("ab", 1, 3) == ["a", "ab"]
    # shorter than minGram: nothing
    assert edge_ngrams("ab", 3, 4) == []
    assert edge_ngrams("abc", 3, 3) == ["abc"]


def test_ngrams_order_and_min_length():
    # positions outer, sizes inner (NGramTokenFilter.cs 4.4+ loop)
    assert ngrams("abcd", 2, 3) == ["ab", "abc", "bc", "bcd", "cd"]
    # token shorter than minGram removed (CodepointCountFilter)
    assert ngrams("a", 2, 3) == []
    assert ngrams("ab", 2, 3) == ["ab"]


# -- CommonGramsFilter: the reference test's exact vectors -------------------
# (terms, positionIncrements) per input

CGF_VECTORS = {
    "the": (["the"], [1]),
    "foo": (["foo"], [1]),
    "brown fox": (["brown", "fox"], [1, 1]),
    "the fox": (["the", "the_fox", "fox"], [1, 0, 1]),
    "fox of": (["fox", "fox_of", "of"], [1, 0, 1]),
    "of the": (["of", "of_the", "the"], [1, 0, 1]),
    "n n n": (["n", "n", "n"], [1, 1, 1]),
    "quick brown fox": (["quick", "brown", "fox"], [1, 1, 1]),
    "n n s": (["n", "n", "n_s", "s"], [1, 1, 0, 1]),
    "quick brown the": (
        ["quick", "brown", "brown_the", "the"], [1, 1, 0, 1]),
    "n s n": (["n", "n_s", "s", "s_n", "n"], [1, 0, 1, 0, 1]),
    "n s s": (["n", "n_s", "s", "s_s", "s"], [1, 0, 1, 0, 1]),
    "s n n": (["s", "s_n", "n", "n"], [1, 0, 1, 1]),
    "s n s": (["s", "s_n", "n", "n_s", "s"], [1, 0, 1, 0, 1]),
    "s s n": (["s", "s_s", "s", "s_n", "n"], [1, 0, 1, 0, 1]),
    "s s s": (["s", "s_s", "s", "s_s", "s"], [1, 0, 1, 0, 1]),
}


def test_common_grams_filter_vectors():
    for text, (terms, incs) in CGF_VECTORS.items():
        got = common_grams(text, COMMON)
        assert [t for t, _p, _g in got] == terms, (text, got)
        # positions reconstruct the increments: pos[i] = pos[i-1]+inc
        pos = -1
        want_pos = []
        for inc in incs:
            pos += inc
            want_pos.append(pos)
        assert [p for _t, p, _g in got] == want_pos, (text, got)


# -- CommonGramsQueryFilter: the reference test's exact vectors ---------------

CGQ_VECTORS = {
    "brown fox": ["brown", "fox"],
    "the fox": ["the_fox"],
    "fox of": ["fox_of"],
    "of the": ["of_the"],
    "the": ["the"],
    "foo": ["foo"],
    "n n n": ["n", "n", "n"],
    "quick brown fox": ["quick", "brown", "fox"],
    "n n s": ["n", "n_s"],
    "quick brown the": ["quick", "brown_the"],
    "n s n": ["n_s", "s_n"],
    "quick the brown": ["quick_the", "the_brown"],
    "n s s": ["n_s", "s_s"],
    "fox of the": ["fox_of", "of_the"],
    "s n n": ["s_n", "n", "n"],
    "the quick brown": ["the_quick", "quick", "brown"],
    "s n s": ["s_n", "n_s"],
    "the fox of": ["the_fox", "fox_of"],
    "s s n": ["s_s", "s_n"],
    "of the fox": ["of_the", "the_fox"],
    "s s s": ["s_s", "s_s"],
    "of the of": ["of_the", "the_of"],
}


def test_common_grams_query_filter_vectors():
    for text, want in CGQ_VECTORS.items():
        got = common_grams_query(text, COMMON)
        assert got == want, (text, got, want)
