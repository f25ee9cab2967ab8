"""ShingleFilter + FreeTextSuggester semantics.

References: Analysis.Common/Analysis/Shingle/ShingleFilter.cs (filler
insertion, isAllFiller suppression, ' ' separator);
Suggest/Suggest/Analyzing/FreeTextSuggester.cs (stupid backoff, ALPHA=0.4,
higher-order grams exclude their candidates from backoff).
"""
from collections import Counter

import pytest

from lucenenet_spark.functions.analysis import (
    shingle_tokens,
    tokenize_text,
    tokenize_with_positions,
)
from lucenenet_spark.operators.suggest import freetext_suggest


def test_shingle_plain_bigrams():
    assert shingle_tokens("alpha beta gamma") == ["alpha beta", "beta gamma"]


def test_shingle_filler_for_stopword():
    # 'into' is an English stopword -> filler slot on both sides
    got = shingle_tokens("sentence into shingles")
    assert got == ["sentence _", "_ shingles"]


def test_shingle_all_filler_suppressed():
    # two adjacent stops -> the middle '_ _' gram is suppressed
    got = shingle_tokens("alpha the of beta")
    assert got == ["alpha _", "_ beta"]
    assert "_ _" not in got


def test_shingle_leading_gap_fills():
    assert shingle_tokens("the dog") == ["_ dog"]


def test_shingle_trigram():
    got = shingle_tokens("alpha beta gamma delta", size=3)
    assert got == ["alpha beta gamma", "beta gamma delta"]


def test_shingle_empty_and_single():
    assert shingle_tokens(None) == []
    assert shingle_tokens("alpha") == []


def _py_freetext(texts, context, alpha=0.4):
    ctx = tokenize_text(context)
    prefix, w1 = ctx[-1], (ctx[-2] if len(ctx) >= 2 else None)
    uni, big = Counter(), Counter()
    for t in texts:
        toks, poss = tokenize_with_positions(t)
        uni.update(toks)
        for (a, pa), (b, pb) in zip(zip(toks, poss), zip(toks[1:], poss[1:])):
            if pb == pa + 1:
                big[(a, b)] += 1
    tot = sum(uni.values())
    out, branch = {}, {}
    for t, c1 in uni.items():
        if not t.startswith(prefix):
            continue
        if w1 is not None and big[(w1, t)]:
            out[t] = big[(w1, t)] / uni[w1]
            branch[t] = "bigram"
        elif w1 is not None:
            out[t] = alpha * c1 / tot
            branch[t] = "backoff"
        else:
            out[t] = c1 / tot
            branch[t] = "unigram"
    return {t: round(s, 6) for t, s in out.items()}, branch


def test_freetext_backoff_parity(spark, corpus_pdf):
    texts = corpus_pdf["text"].tolist()
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = {
        r["token"]: r["score"]
        for r in freetext_suggest(df, "common163 c", k=1000).collect()
    }
    want, branch = _py_freetext(texts, "common163 c")
    assert got == pytest.approx(want, abs=1e-12)
    # both formulas really exercised by this corpus/context
    assert "bigram" in branch.values()
    assert "backoff" in branch.values()


def test_freetext_single_token_context(spark):
    rows = [("alpha beta",), ("alpha gamma beta",), ("beta beta",)]
    df = spark.createDataFrame(rows, ["text"])
    got = {
        r["token"]: r["score"]
        for r in freetext_suggest(df, "b", k=10).collect()
    }
    # pure unigram: c(beta)=4 of 7 tokens, no alpha multiplier
    assert got == {"beta": round(4 / 7, 6)}


def test_freetext_gap_breaks_adjacency(spark):
    # 'the' is stopped: alpha..beta are NOT adjacent -> backoff path only
    rows = [("alpha the beta",), ("alpha beta",), ("gamma beta",)]
    df = spark.createDataFrame(rows, ["text"])
    got = {
        r["token"]: r["score"]
        for r in freetext_suggest(df, "alpha b", k=10).collect()
    }
    # bigram (alpha, beta) counted once (doc 2 only): 1 / c(alpha)=2
    assert got["beta"] == round(1 / 2, 6)


def test_freetext_unknown_w1_all_backoff(spark):
    rows = [("alpha beta",), ("beta gamma",)]
    df = spark.createDataFrame(rows, ["text"])
    got = {
        r["token"]: r["score"]
        for r in freetext_suggest(df, "zzz b", k=10).collect()
    }
    assert got == {"beta": round(0.4 * 2 / 4, 6)}
