"""QueryAutoStopWordAnalyzer — df-threshold stop-set + query filtering.

Reference: Analysis.Common/Analysis/Query/QueryAutoStopWordAnalyzer.cs
(strict df > maxDocFreq collection; maxPercentDocs truncates
numDocs * percent to int; stopped terms vanish from parsed queries).
"""
import numpy as np

from lucenenet_spark.operators.autostop import (
    auto_stop_search,
    auto_stop_terms,
)
from tests.conftest import hits


def test_auto_stop_terms_threshold(searcher):
    dfs = searcher.doc_freqs([("text", "popcorn"), ("text", "word7")])
    hot_df = dfs[("text", "popcorn")]
    assert hot_df > 0
    # threshold exactly at the hot term's df: strict > keeps it
    kept, eff = auto_stop_terms(
        searcher, ["popcorn", "word7"], max_doc_freq=hot_df
    )
    assert kept == ["popcorn", "word7"] and eff == hot_df
    # one below: the hot term is stopped
    kept, _ = auto_stop_terms(
        searcher, ["popcorn", "word7"], max_doc_freq=hot_df - 1
    )
    assert kept == ["word7"]


def test_auto_stop_percent_truncates(searcher):
    # (int)(numDocs * percent) — pick a percent whose product is fractional
    pct = 0.0317
    _, eff = auto_stop_terms(
        searcher, ["popcorn"], max_percent_docs=pct
    )
    assert eff == int(searcher.max_doc * pct)


def test_auto_stop_search_matches_filtered_boolean(searcher):
    from lucenenet_spark.plans.query import BooleanQuery, TermQuery

    dfs = searcher.doc_freqs([("text", "popcorn"), ("text", "word7")])
    thr = dfs[("text", "popcorn")] - 1
    assert dfs[("text", "word7")] <= thr
    got = hits(
        auto_stop_search(
            searcher, ["popcorn", "word7"], k=10, max_doc_freq=thr
        )
    )
    want = hits(
        searcher.search(
            BooleanQuery(should=(TermQuery(term="word7"),)), 10
        )
    )
    assert [(d, np.float32(s)) for d, s in got] == [
        (d, np.float32(s)) for d, s in want
    ]


def test_auto_stop_all_stopped_is_empty(searcher):
    out = auto_stop_search(searcher, ["popcorn"], k=10, max_doc_freq=0)
    assert out.count() == 0
