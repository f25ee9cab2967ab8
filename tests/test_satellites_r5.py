"""Round-5 satellite collectors: multi-SortField sort, field-sorted
searchAfter, LongRange facets, DiversifiedTopDocsCollector — engine vs a
pandas recompute over the same corpus/docids.

References: Search/Sort.cs + TopFieldCollector.cs (multi-field compare,
paging FieldDoc), Facet/Range/LongRangeFacetCounts.cs (per-range accept),
Misc/Search/DiversifiedTopDocsCollector.cs (per-key cap + global top-k).
"""
import numpy as np
import pandas as pd
import pytest

from lucenenet_spark import oracle
from lucenenet_spark.plans.query import TermQuery

TERM = "popcorn"


@pytest.fixture(scope="module")
def meta(corpus_pdf):
    # docid = row position (conftest sorts by conv_id, turn_idx — the same
    # order the engine index assigns docids in)
    m = corpus_pdf.reset_index(drop=True).copy()
    m["docid"] = m.index
    m["field_length"] = m["text"].map(
        lambda t: len(oracle.tokenize_with_positions(t, "standard")[0])
    )
    return m


@pytest.fixture(scope="module")
def hitmeta(meta, oracle_index):
    docs = sorted(d for d, _tf in oracle_index.postings[TERM])
    return meta[meta["docid"].isin(docs)]


def _sort_key(hm: pd.DataFrame, specs):
    df = hm.copy()
    by, asc = [], []
    for i, (col, reverse, missing_last) in enumerate(specs):
        # encode null placement: pandas can't mix na_position per column,
        # so order on (is_null_rank, value) pairs
        nullrank = df[col].isna().astype(int)
        if not missing_last:
            nullrank = -nullrank
        df[f"_nr{i}"] = nullrank
        by += [f"_nr{i}", col]
        asc += [True, not reverse]
    by.append("docid")
    asc.append(True)
    return df.sort_values(by, ascending=asc, na_position="last")


def test_sort_by_fields_nulls_last(searcher, hitmeta):
    specs = [("tool", False, True), ("turn_idx", True, False)]
    got = searcher.sort_by_fields(TermQuery(term=TERM), specs, k=12).select(
        "docid", "tool", "turn_idx"
    ).collect()
    want = _sort_key(hitmeta, specs).head(12)
    assert [r["docid"] for r in got] == want["docid"].tolist()
    assert [r["tool"] for r in got] == [
        None if pd.isna(t) else t for t in want["tool"]
    ]


def test_sort_by_fields_nulls_first(searcher, hitmeta):
    specs = [("tool", True, False)]  # desc, missing first
    got = searcher.sort_by_fields(TermQuery(term=TERM), specs, k=8).collect()
    want = _sort_key(hitmeta, specs).head(8)
    assert [r["docid"] for r in got] == want["docid"].tolist()


def test_search_after_fields_pages_tile(searcher, hitmeta):
    """Successive pages concatenate to the full field-sorted run."""
    specs = [("turn_idx", False, False)]
    full = searcher.sort_by_fields(
        TermQuery(term=TERM), specs, k=10_000
    ).select("docid", "turn_idx").collect()
    pages, cursor = [], None
    while True:
        if cursor is None:
            page = searcher.sort_by_fields(TermQuery(term=TERM), specs, k=7)
        else:
            page = searcher.search_after_fields(
                TermQuery(term=TERM), specs, [cursor["turn_idx"]],
                int(cursor["docid"]), k=7,
            )
        rows = page.select("docid", "turn_idx").collect()
        if not rows:
            break
        pages += rows
        cursor = rows[-1]
        if len(rows) < 7:
            break
    assert [r["docid"] for r in pages] == [r["docid"] for r in full]


def test_search_after_fields_null_cursor_tail(searcher, hitmeta):
    """missing_last: docs with a NULL field are after any concrete cursor."""
    specs = [("tool", False, True)]
    tools = sorted(t for t in hitmeta["tool"] if pd.notna(t))
    last_tool_doc = int(
        hitmeta[hitmeta["tool"] == tools[-1]]["docid"].max()
    )
    got = searcher.search_after_fields(
        TermQuery(term=TERM), specs, [tools[-1]], last_tool_doc, k=10_000
    ).collect()
    want = hitmeta[hitmeta["tool"].isna()].sort_values("docid")
    assert [r["docid"] for r in got] == want["docid"].tolist()
    assert all(r["tool"] is None for r in got)


def test_facet_ranges_overlap_and_bounds(searcher, hitmeta):
    ranges = [
        ("lt15", 0, 15, True, False),
        ("ge15", 15, 1 << 20, True, True),
        ("all", 0, 1 << 20, True, True),
        ("excl", 10, 20, False, False),  # both bounds exclusive
    ]
    got = {
        r["label"]: r["n"]
        for r in searcher.facet_ranges(
            TermQuery(term=TERM), "field_length", ranges
        ).collect()
    }
    fl = hitmeta["field_length"]
    assert got["lt15"] == int((fl < 15).sum())
    assert got["ge15"] == int((fl >= 15).sum())
    assert got["all"] == len(hitmeta)  # overlapping ranges each count fully
    assert got["excl"] == int(((fl > 10) & (fl < 20)).sum())


def test_diversified_top_k(searcher, oracle_index, meta):
    scores = oracle.term_scores(oracle_index, TERM)
    byconv = {}
    conv = meta.set_index("docid")["conv_id"]
    # per-key top-2 by (score desc, docid asc), then global top-8
    for d, s in scores.items():
        byconv.setdefault(conv[d], []).append((-float(s), d))
    keep = []
    for _c, xs in byconv.items():
        keep += sorted(xs)[:2]
    want = [d for _s, d in sorted(keep)[:8]]
    got = searcher.diversified_top_k(TermQuery(term=TERM), "conv_id", 2, k=8)
    rows = got.collect()
    assert [r["docid"] for r in rows] == want
    for r in rows:
        assert np.float32(r["score"]) == scores[r["docid"]]
    # the cap really binds: per-key multiplicity never exceeds 2
    keys = [r["key"] for r in rows]
    assert max(keys.count(kk) for kk in set(keys)) <= 2
