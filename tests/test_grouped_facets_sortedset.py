"""TermGroupFacetCollector + SortedSetSortField — engine vs pandas.

References: Grouping/Term/TermGroupFacetCollector.cs (each group counts
once per facet value; missing facet -> missing count),
Sandbox/Queries/SortedSetSortField.cs (MIN/MAX/MIDDLE_MIN/MIDDLE_MAX over
the sorted distinct set, missing first/last).
"""
import pandas as pd
import pytest

from lucenenet_spark.plans.query import TermQuery

TERM = "popcorn"
LABELS = "filter(array(role, tool), x -> x is not null)"


@pytest.fixture(scope="module")
def hitmeta(searcher, corpus_pdf):
    rows = searcher.scores(TermQuery(term=TERM)).collect()
    m = corpus_pdf.reset_index(drop=True).copy()
    m["docid"] = m.index
    return m[m["docid"].isin({r["docid"] for r in rows})]


def test_grouped_facets_counts_each_group_once(searcher, hitmeta):
    got = {
        r["value"]: r["n_groups"]
        for r in searcher.grouped_facets(
            TermQuery(term=TERM), "conv_id", "tool"
        ).collect()
    }
    want = (
        hitmeta.groupby("tool", dropna=False)["conv_id"].nunique().to_dict()
    )
    want = {(None if pd.isna(k) else k): v for k, v in want.items()}
    assert got == want
    # the missing row exists: user/assistant turns carry no tool value
    assert None in got and got[None] >= 1


def _select(vals, selector):
    s = sorted(set(v for v in vals if v is not None))
    if not s:
        return None
    n = len(s)
    return {
        "min": s[0],
        "max": s[-1],
        "middle_min": s[(n - 1) // 2],
        "middle_max": s[n // 2],
    }[selector]


@pytest.mark.parametrize("selector", ["min", "max", "middle_min", "middle_max"])
def test_sorted_set_selectors(searcher, hitmeta, selector):
    got = searcher.sort_by_sorted_set(
        TermQuery(term=TERM), LABELS, selector, k=14
    ).collect()
    keys = {
        row.docid: _select([row.role, row.tool], selector)
        for row in hitmeta.itertuples()
    }
    want = sorted(
        ((keys[d], d) for d in keys),
        key=lambda t: ((t[0] is not None, t[0] or ""), t[1]),
    )[:14]
    assert [(r["sortkey"], r["docid"]) for r in got] == want


def test_sorted_set_reverse_missing_last(searcher, hitmeta):
    got = searcher.sort_by_sorted_set(
        TermQuery(term=TERM), LABELS, "max", k=500, reverse=True,
        missing_last=True,
    ).collect()
    keys = {
        row.docid: _select([row.role, row.tool], "max")
        for row in hitmeta.itertuples()
    }
    # reverse on the key, nulls last, docid asc tie-break
    nonnull = sorted(
        ((k, d) for d, k in keys.items() if k is not None),
        key=lambda t: (_neg(t[0]), t[1]),
    )
    nulls = sorted((None, d) for d, k in keys.items() if k is None)
    assert [(r["sortkey"], r["docid"]) for r in got] == (nonnull + nulls)


def _neg(s: str):
    # descending string order key
    return tuple(-ord(c) for c in s)


def test_sorted_set_rejects_unknown_selector(searcher):
    with pytest.raises(ValueError):
        searcher.sort_by_sorted_set(TermQuery(term=TERM), LABELS, "median")
