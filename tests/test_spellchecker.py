"""StringDistance family + classic SpellChecker — reference-vector parity
(TestJaroWinklerDistance.cs, TestNGramDistance.cs,
TestLevenshteinDistance.cs, TestSpellChecker.cs semantics)."""
import numpy as np
import pytest

from lucenenet_spark.operators.spellchecker import (
    jaro_winkler_distance,
    levenstein_distance,
    lucene_levenshtein_distance,
    ngram_distance,
    suggest_similar,
    suggest_similar_scored,
)


def test_jaro_winkler_vectors():
    d = jaro_winkler_distance
    assert d("al", "al") == np.float32(1.0)
    assert 0.961 < d("martha", "marhta") < 0.962
    assert 0.832 < d("jones", "johnson") < 0.833
    assert 0.958 < d("abcvwxyz", "cabvwxyz") < 0.959
    assert 0.84 < d("dwayne", "duane") < 0.841
    assert 0.813 < d("dixon", "dicksonx") < 0.814
    assert d("fvie", "ten") == np.float32(0.0)
    assert d("zac ephron", "zac efron") > d("zac ephron", "kai ephron")
    assert d("brittney spears", "britney spears") > d(
        "brittney spears", "brittney startzman"
    )


def test_ngram_vectors_n1():
    d = lambda a, b: ngram_distance(a, b, 1)  # noqa: E731
    assert d("al", "al") == pytest.approx(1.0, abs=1e-3)
    assert d("a", "a") == pytest.approx(1.0, abs=1e-3)
    assert d("b", "a") == pytest.approx(0.0, abs=1e-3)
    assert d("martha", "marhta") == pytest.approx(0.6666, abs=1e-3)
    assert d("jones", "johnson") == pytest.approx(0.4285, abs=1e-3)
    assert d("natural", "contrary") == pytest.approx(0.25, abs=1e-3)
    assert d("abcvwxyz", "cabvwxyz") == pytest.approx(0.75, abs=1e-3)
    assert d("dwayne", "duane") == pytest.approx(0.666, abs=1e-3)
    assert d("dixon", "dicksonx") == pytest.approx(0.5, abs=1e-3)
    assert d("six", "ten") == pytest.approx(0.0, abs=1e-3)
    assert d("zac ephron", "zac efron") == pytest.approx(
        d("zac ephron", "kai ephron"), abs=1e-3
    )
    assert d("brittney spears", "britney spears") > d(
        "brittney spears", "brittney startzman"
    )


def test_ngram_vectors_n2():
    d = ngram_distance
    assert d("al", "al") == pytest.approx(1.0, abs=1e-3)
    assert d("a", "aa") == pytest.approx(0.5, abs=1e-3)
    assert d("martha", "marhta") == pytest.approx(0.6666, abs=1e-3)
    assert d("jones", "johnson") == pytest.approx(0.4285, abs=1e-3)
    assert d("natural", "contrary") == pytest.approx(0.25, abs=1e-3)
    assert d("abcvwxyz", "cabvwxyz") == pytest.approx(0.625, abs=1e-3)
    assert d("dwayne", "duane") == pytest.approx(0.5833, abs=1e-3)
    assert d("dixon", "dicksonx") == pytest.approx(0.5, abs=1e-3)
    assert d("six", "ten") == pytest.approx(0.0, abs=1e-3)
    assert d("0012345678", "0012890678") == pytest.approx(
        d("0012345678", "0072385698"), abs=1e-3
    )


def test_ngram_vectors_n3():
    d = lambda a, b: ngram_distance(a, b, 3)  # noqa: E731
    assert d("martha", "marhta") == pytest.approx(0.7222, abs=1e-3)
    assert d("jones", "johnson") == pytest.approx(0.4762, abs=1e-3)
    assert d("natural", "contrary") == pytest.approx(0.2083, abs=1e-3)
    assert d("abcvwxyz", "cabvwxyz") == pytest.approx(0.5625, abs=1e-3)
    assert d("dwayne", "duane") == pytest.approx(0.5277, abs=1e-3)
    assert d("dixon", "dicksonx") == pytest.approx(0.4583, abs=1e-3)
    assert d("0012345678", "0012890678") < d("0012345678", "0072385698")
    assert d("", "al") == pytest.approx(0.0, abs=1e-3)


def test_levenstein_and_lucene_levenshtein():
    assert levenstein_distance("kitten", "sitting") == np.float32(
        np.float32(1.0) - np.float32(np.float32(3) / np.float32(7))
    )
    # transposition counts ONE edit in the Lucene variant
    assert lucene_levenshtein_distance("ab", "ba") == np.float32(
        np.float32(1.0) - np.float32(np.float32(1) / np.float32(2))
    )
    # empty-input quirk: a RAW count, not a similarity
    assert lucene_levenshtein_distance("", "abc") == np.float32(3.0)
    assert lucene_levenshtein_distance("", "") == np.float32(0.0)


def test_suggest_similar_basics(searcher):
    # misspelling of the planted hot term
    got = suggest_similar(searcher, "popcirn", 3)
    assert got and got[0] == "popcorn"
    # word present in the index short-circuits under WHEN_NOT_IN_INDEX
    assert suggest_similar(searcher, "popcorn", 3) == ["popcorn"]
    # SUGGEST_ALWAYS keeps suggesting around a present word
    got = suggest_similar(
        searcher, "popcorn", 3, suggest_mode="SUGGEST_ALWAYS"
    )
    assert "popcorn" not in got  # the word itself is always skipped


def test_suggest_similar_accuracy_and_order(searcher):
    rows = suggest_similar_scored(searcher, "popcirn", 5)
    assert all(s >= np.float32(0.5) for _w, s, _f in rows)
    keys = [(-float(s), -f, w) for w, s, f in rows]
    assert keys == sorted(keys)


def test_suggest_similar_more_popular(searcher):
    # MORE_POPULAR: candidates must beat the source word's own df
    freq = searcher.doc_freqs([("text", "word1")])[("text", "word1")]
    rows = suggest_similar_scored(
        searcher, "word1", 10, suggest_mode="SUGGEST_MORE_POPULAR",
        accuracy=0.3,
    )
    assert rows and all(f >= freq for _w, _s, f in rows)
