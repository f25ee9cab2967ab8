"""Grouping extras + value-source facets + DuplicateFilter — engine vs a
pandas/numpy recompute over the same corpus/docids.

References: Grouping/Term/TermAllGroupsCollector.cs (distinct group set,
null group included), Term/TermAllGroupHeadsCollector.cs (head per group
under sortWithinGroup, earliest doc wins ties), Term/
TermDistinctValuesCollector.cs (ord -1 adds null to the unique set),
Facet/Taxonomy/TaxonomyFacetSumValueSource.cs (float32 values[ord] +=
accumulation in doc order), Sandbox/Queries/DuplicateFilter.cs
(KM_USE_FIRST/LAST_OCCURRENCE; PM_FULL_VALIDATION vs PM_FAST_INVALIDATION
keeping field-less docs).
"""
import numpy as np
import pandas as pd
import pytest

from lucenenet_spark.plans.query import TermQuery

TERM = "popcorn"


@pytest.fixture(scope="module")
def meta(corpus_pdf):
    m = corpus_pdf.reset_index(drop=True).copy()
    m["docid"] = m.index
    return m


@pytest.fixture(scope="module")
def engine_hits(searcher, meta):
    """Engine per-doc scores joined with the corpus metadata columns."""
    rows = searcher.scores(TermQuery(term=TERM)).collect()
    h = pd.DataFrame(
        {"docid": [r["docid"] for r in rows], "score": [r["score"] for r in rows]}
    )
    return h.merge(meta[["docid", "conv_id", "role", "tool"]], on="docid")


def test_all_groups(searcher, engine_hits):
    got = [
        r["grp"]
        for r in searcher.all_groups(TermQuery(term=TERM), "conv_id").collect()
    ]
    assert got == sorted(engine_hits["conv_id"].unique())


def test_group_heads_earliest_doc_wins_ties(searcher, engine_hits):
    # role asc within group; many hits share a role inside one conv, so the
    # docid-asc tie-break is genuinely exercised
    got = searcher.group_heads(
        TermQuery(term=TERM), "conv_id", [("role", False, False)]
    ).collect()
    want = (
        engine_hits.sort_values(["conv_id", "role", "docid"])
        .groupby("conv_id", as_index=False)
        .first()[["conv_id", "docid"]]
    )
    assert [(r["grp"], r["docid"]) for r in got] == list(
        want.itertuples(index=False, name=None)
    )


def test_distinct_values_null_counts_as_value(searcher, engine_hits):
    got = {
        r["grp"]: r["n_values"]
        for r in searcher.distinct_values(
            TermQuery(term=TERM), "role", "tool"
        ).collect()
    }
    want = {
        role: g["tool"].nunique() + int(g["tool"].isna().any())
        for role, g in engine_hits.groupby("role")
    }
    assert got == want
    # user/assistant rows carry tool=None only: the null must count as ONE
    # distinct value, like the countOrd == -1 arm
    assert got["user"] == 1 and got["assistant"] == 1
    assert got["tool"] >= 2  # several real tool names, no nulls


def test_facet_sum_value_is_f32_docid_order_fold(searcher, engine_hits):
    got = {
        r["value"]: r["sum_score"]
        for r in searcher.facet_sum_value(TermQuery(term=TERM), "role").collect()
    }
    for role, g in engine_hits.groupby("role"):
        acc = np.float32(0.0)
        for s in g.sort_values("docid")["score"]:
            acc = np.float32(acc + np.float32(s))
        assert got[role] == acc, role


def _ranked(hits: pd.DataFrame, kept: set, k: int):
    sub = hits[hits["docid"].isin(kept)]
    return (
        sub.sort_values(["score", "docid"], ascending=[False, True], kind="mergesort")
        .head(k)["docid"]
        .tolist()
    )


def test_duplicate_filter_full_last(searcher, meta, engine_hits):
    kept = set(meta.groupby("conv_id")["docid"].max())
    got = searcher.duplicate_filter(
        TermQuery(term=TERM), "conv_id", keep="last", mode="full", k=12
    ).collect()
    assert [r["docid"] for r in got] == _ranked(engine_hits, kept, 12)


def test_duplicate_filter_full_first(searcher, meta, engine_hits):
    kept = set(meta.groupby("conv_id")["docid"].min())
    got = searcher.duplicate_filter(
        TermQuery(term=TERM), "conv_id", keep="first", mode="full", k=12
    ).collect()
    assert [r["docid"] for r in got] == _ranked(engine_hits, kept, 12)


def test_duplicate_filter_fast_keeps_fieldless_docs(searcher, meta, engine_hits):
    keyed = meta[meta["tool"].notna()]
    kept = set(keyed.groupby("tool")["docid"].min()) | set(
        meta[meta["tool"].isna()]["docid"]
    )
    got = searcher.duplicate_filter(
        TermQuery(term=TERM), "tool", keep="first", mode="fast", k=12
    ).collect()
    assert [r["docid"] for r in got] == _ranked(engine_hits, kept, 12)
    # full mode on the same key excludes every null-tool doc — the two modes
    # must actually differ on this corpus
    full = searcher.duplicate_filter(
        TermQuery(term=TERM), "tool", keep="first", mode="full", k=12
    ).collect()
    assert [r["docid"] for r in got] != [r["docid"] for r in full]


def test_duplicate_filter_rejects_unknown_modes(searcher):
    with pytest.raises(ValueError):
        searcher.duplicate_filter(TermQuery(term=TERM), "conv_id", keep="middle")
    with pytest.raises(ValueError):
        searcher.duplicate_filter(TermQuery(term=TERM), "conv_id", mode="other")
