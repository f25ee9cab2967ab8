"""QueryAutoStopWordAnalyzer (Analysis.Common/Analysis/Query/
QueryAutoStopWordAnalyzer.cs).

The reference scans the index's TermsEnum at construction and collects
every term whose DocFreq is STRICTLY greater than maxDocFreq (the
maxPercentDocs ctor truncates numDocs * maxPercent to int); query-time
analysis then stop-filters those terms, so they vanish from parsed
queries. Here the same df lookups come from the searcher's cached
term-stats scan (term_meta), and the filtered term list feeds an
ordinary BooleanQuery — dropped SHOULD terms simply disappear, exactly
what the wrapped analyzer does to a QueryParser OR query.
"""
from __future__ import annotations

from ..plans.query import BooleanQuery, TermQuery


def auto_stop_terms(
    searcher,
    terms: list[str],
    max_doc_freq: int | None = None,
    max_percent_docs: float | None = None,
    field: str = "text",
) -> tuple[list[str], int]:
    """(surviving terms, effective maxDocFreq). Exactly one of
    max_doc_freq / max_percent_docs must be given."""
    if (max_doc_freq is None) == (max_percent_docs is None):
        raise ValueError("give exactly one of max_doc_freq/max_percent_docs")
    if max_doc_freq is None:
        # (int)(indexReader.NumDocs * maxPercentDocs) — truncation
        max_doc_freq = int(searcher.max_doc * max_percent_docs)
    dfs = searcher.doc_freqs([(field, t) for t in terms])
    kept = [t for t in terms if dfs[(field, t)] <= max_doc_freq]
    return kept, max_doc_freq


def auto_stop_search(
    searcher,
    terms: list[str],
    k: int,
    max_doc_freq: int | None = None,
    max_percent_docs: float | None = None,
    field: str = "text",
):
    """Top-k over the OR of the surviving terms (the parsed query the
    wrapped analyzer would produce). All terms stopped -> empty result
    (the reference parser returns a null/empty BooleanQuery)."""
    kept, _ = auto_stop_terms(
        searcher, terms, max_doc_freq, max_percent_docs, field
    )
    q = BooleanQuery(
        should=tuple(TermQuery(term=t, field=field) for t in kept)
    )
    return searcher.search(q, k)
