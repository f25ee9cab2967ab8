"""Index-level phonetic analyzer chains (round 5z2): PhoneticFilter
appended to the indexing chain — inject's posInc-0 overlaps flow through
tokenization, norm lengths (overlaps discounted), and collection stats
(sumTotalTermFreq counts every emitted token)."""
from __future__ import annotations

import numpy as np
import pytest

from lucenenet_spark.functions.analysis import (
    analyzer_has_overlaps,
    phonetic_spec,
    split_analyzer,
    tokenize_text,
    tokenize_with_offsets,
    tokenize_with_positions,
    validate_analyzer,
)


def test_spec_parsing():
    assert phonetic_spec("standard") is None
    assert phonetic_spec("standard:phonetic=soundex") == ("soundex", True)
    assert phonetic_spec("standard:phonetic=metaphone,replace") == (
        "metaphone", False,
    )
    assert split_analyzer("standard:phonetic=soundex") == ("standard", frozenset())
    assert analyzer_has_overlaps("standard:phonetic=soundex")
    assert not analyzer_has_overlaps("standard:phonetic=soundex,replace")
    assert not analyzer_has_overlaps("standard")
    with pytest.raises(ValueError):
        validate_analyzer("standard:phonetic=nope")
    with pytest.raises(ValueError):
        validate_analyzer("cjk:phonetic=soundex")
    with pytest.raises(ValueError):
        phonetic_spec("standard:phonetic=soundex,bogus")


def test_inject_emission_order_and_positions():
    # PhoneticFilter.IncrementToken: the PHONETIC goes out first with the
    # original's position increment; the saved ORIGINAL follows at
    # posInc 0 — both occupy ONE position slot
    toks, poss = tokenize_with_positions(
        "the batch badge", "standard:phonetic=soundex"
    )
    assert toks == ["B320", "batch", "B320", "badge"]
    assert poss == [1, 1, 2, 2]  # "the" is a stopword: position gap at 0


def test_passthrough_when_code_empty_or_equal():
    # digit-only tokens encode to '' -> pass through as a single emission
    toks, poss = tokenize_with_positions(
        "3000 batch", "standard:phonetic=soundex"
    )
    assert toks == ["3000", "B320", "batch"]
    assert poss == [0, 1, 1]


def test_replace_mode_keeps_count():
    toks, poss = tokenize_with_positions(
        "the batch 3000", "standard:phonetic=metaphone,replace"
    )
    assert toks == ["BX", "3000"]
    assert poss == [1, 2]
    assert tokenize_text("batch", "standard:phonetic=metaphone,replace") == ["BX"]


def test_offsets_cloned_to_overlaps():
    toks, poss, st, en = tokenize_with_offsets(
        "xx batch yy", "standard:phonetic=soundex"
    )
    i = toks.index("B320")
    j = toks.index("batch")
    assert poss[i] == poss[j] and st[i] == st[j] and en[i] == en[j]
    assert (st[j], en[j]) == (3, 8)


@pytest.fixture(scope="module")
def phonetic_index(spark, tmp_path_factory):
    import pandas as pd

    from lucenenet_spark.operators.index_build import IndexBuilder

    n = 120
    words = ["batch", "badge", "merge", "value", "the", "3000"]
    rng = np.random.default_rng(31)
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c-{i//4:05d}" for i in range(n)],
            "turn_idx": [i % 4 for i in range(n)],
            "role": ["user"] * n,
            "text": [
                " ".join(rng.choice(words, size=int(rng.integers(1, 9))))
                for _ in range(n)
            ],
            "tool": [None] * n,
            "ts": pd.Timestamp("2024-01-01"),
        }
    )
    out = str(tmp_path_factory.mktemp("phidx") / "idx")
    m = IndexBuilder(
        spark, out, n_buckets=4, n_segments=4,
        analyzer="standard:phonetic=soundex",
    ).build(spark.createDataFrame(pdf), build_id="t-ph")
    return out, pdf, m


def test_norms_discount_overlaps_stats_count_all(spark, phonetic_index):
    from lucenenet_spark.functions.analysis import tokenize_with_positions
    from lucenenet_spark.operators.index_build import docs_view

    out, pdf, manifest = phonetic_index
    # per doc: norm fieldLength = anchor count (original surviving tokens);
    # sumTotalTermFreq = every emitted token incl. the posInc-0 overlaps
    exp_norm, exp_total = {}, 0
    for _, row in pdf.sort_values(["conv_id", "turn_idx"]).reset_index(
        drop=True
    ).iterrows():
        toks, poss = tokenize_with_positions(
            row["text"], "standard:phonetic=soundex"
        )
        exp_total += len(toks)
        exp_norm[(row["conv_id"], row["turn_idx"])] = len(set(poss))
    assert manifest["sum_ttf"] == exp_total
    got = {
        (r["conv_id"], r["turn_idx"]): r["field_length"]
        for r in docs_view(spark, manifest).collect()
    }
    assert got == exp_norm
    # avgdl counts the doubled stream (BM25Similarity AvgFieldLength over
    # CollectionStatistics.SumTotalTermFreq)
    assert manifest["avgdl"] == float(
        np.float32(np.float64(exp_total) / np.float64(manifest["max_doc"]))
    )


def test_code_term_query_scores_over_code_postings(spark, phonetic_index):
    from lucenenet_spark.operators.search import IndexSearcher
    from lucenenet_spark.plans.query import TermQuery

    out, pdf, manifest = phonetic_index
    s = IndexSearcher(spark, out)
    hits = s.search(TermQuery(term="B320"), 1000).collect()
    # B320 matches every doc containing batch OR badge, with tf = the
    # combined occurrence count
    docs = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = {
        i
        for i, t in enumerate(docs["text"])
        if "batch" in t.split() or "badge" in t.split()
    }
    assert {r["docid"] for r in hits} == exp
    # and the surface terms still match independently
    got_batch = {
        r["docid"]
        for r in s.search(TermQuery(term="batch"), 1000).collect()
    }
    assert got_batch == {
        i for i, t in enumerate(docs["text"]) if "batch" in t.split()
    }
