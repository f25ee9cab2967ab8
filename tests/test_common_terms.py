"""CommonTermsQuery: df-driven high/low split rewrite + scoring parity vs
the pure-Python oracle.

Reference: Lucene.Net.Queries/CommonTermsQuery.cs (Rewrite :153-171,
BuildQuery :193-259, MinNrShouldMatch float semantics :184-191), exercised
by Lucene.Net.Tests.Queries/CommonTermsQueryTest.cs.
"""
import numpy as np
import pytest

from lucenenet_spark import oracle
from lucenenet_spark.plans.query import BooleanQuery, CommonTermsQuery, TermQuery

from .conftest import hits


def _df_of(oracle_index, t):
    return len(oracle_index.postings.get(t, ()))


@pytest.fixture(scope="module")
def vocab(oracle_index):
    """(hot, hot2, mid, rare) picked by df so the split is stable."""
    by_df = sorted(oracle_index.postings, key=lambda t: -len(oracle_index.postings[t]))
    hot, hot2 = by_df[0], by_df[1]
    mids = [t for t in by_df if 5 <= _df_of(oracle_index, t) <= oracle_index.max_doc // 10]
    rares = [t for t in by_df if 1 <= _df_of(oracle_index, t) <= 4]
    return hot, hot2, mids[0], rares[0]


def _check(searcher, oracle_index, q: CommonTermsQuery, k=15):
    want = oracle.top_k(
        oracle.common_terms_scores(
            oracle_index,
            list(q.terms),
            q.max_term_frequency,
            low_occur=q.low_freq_occur,
            high_occur=q.high_freq_occur,
            low_msm=q.low_freq_min_should_match,
            high_msm=q.high_freq_min_should_match,
            boost=q.boost,
            low_boost=q.low_freq_boost,
            high_boost=q.high_freq_boost,
        ),
        k,
    )
    got = hits(searcher.search(q, k))
    assert got == want
    return want


def test_mixed_split_matches_oracle(searcher, oracle_index, vocab):
    hot, hot2, mid, rare = vocab
    q = CommonTermsQuery(terms=(hot, mid, hot2, rare), max_term_frequency=0.1)
    want = _check(searcher, oracle_index, q)
    assert want, "fixture must match documents"
    # the split really is mixed at this threshold
    rw = searcher.rewrite(q)
    assert isinstance(rw, BooleanQuery) and rw.must and rw.should


@pytest.mark.parametrize("low_occur", ["MUST", "SHOULD"])
def test_low_occur_modes(searcher, oracle_index, vocab, low_occur):
    hot, hot2, mid, rare = vocab
    q = CommonTermsQuery(
        terms=(hot, mid, rare), max_term_frequency=0.1, low_freq_occur=low_occur
    )
    assert _check(searcher, oracle_index, q)


def test_high_must_gates_contribution(searcher, oracle_index, vocab):
    hot, hot2, mid, rare = vocab
    q = CommonTermsQuery(
        terms=(hot, hot2, mid), max_term_frequency=0.1, high_freq_occur="MUST"
    )
    assert _check(searcher, oracle_index, q)


def test_all_high_flips_to_conjunction(searcher, oracle_index, vocab):
    hot, hot2, _mid, _rare = vocab
    q = CommonTermsQuery(terms=(hot, hot2), max_term_frequency=0.01)
    rw = searcher.rewrite(q)
    assert isinstance(rw, BooleanQuery) and len(rw.must) == 2 and not rw.should
    want = _check(searcher, oracle_index, q)
    # equals the plain conjunction
    conj = hits(
        searcher.search(
            BooleanQuery(must=tuple(TermQuery(term=t) for t in (hot, hot2))), 15
        )
    )
    assert want == conj


def test_all_low_keeps_occur(searcher, oracle_index, vocab):
    _hot, _hot2, mid, rare = vocab
    q = CommonTermsQuery(
        terms=(mid, rare), max_term_frequency=0.99, low_freq_occur="SHOULD"
    )
    rw = searcher.rewrite(q)
    assert isinstance(rw, BooleanQuery) and len(rw.should) == 2 and not rw.must
    assert _check(searcher, oracle_index, q)


def test_fractional_msm_rounds_half_even(searcher, oracle_index, vocab):
    """3 low SHOULD terms at msm 0.5 -> round(1.5) = 2 (banker's, like
    .NET Math.Round) — one matched low term is NOT enough."""
    hot, _hot2, mid, rare = vocab
    absent = "zzzqabsent"
    q = CommonTermsQuery(
        terms=(hot, mid, rare, absent),
        max_term_frequency=0.1,
        low_freq_occur="SHOULD",
        low_freq_min_should_match=0.5,
    )
    rw = searcher.rewrite(q)
    low_group = rw.must[0]
    assert low_group.min_should_match == 2  # round-half-even of 1.5
    _check(searcher, oracle_index, q)


def test_absent_low_must_term_matches_nothing(searcher, oracle_index, vocab):
    hot, _hot2, mid, _rare = vocab
    q = CommonTermsQuery(terms=(hot, mid, "zzzqabsent"), max_term_frequency=0.1)
    assert _check(searcher, oracle_index, q) == []


def test_single_term_and_empty(searcher, oracle_index, vocab):
    hot, *_ = vocab
    q1 = CommonTermsQuery(terms=(hot,), max_term_frequency=0.1, boost=2.0)
    rw = searcher.rewrite(q1)
    assert isinstance(rw, TermQuery) and rw.boost == 2.0
    assert _check(searcher, oracle_index, q1)
    q0 = CommonTermsQuery(terms=(), max_term_frequency=0.1)
    assert hits(searcher.search(q0, 10)) == []


def test_boosts_fold_multiplicatively(searcher, oracle_index, vocab):
    hot, _hot2, mid, rare = vocab
    q = CommonTermsQuery(
        terms=(hot, mid, rare),
        max_term_frequency=0.1,
        boost=1.5,
        low_freq_boost=2.0,
        high_freq_boost=0.5,
    )
    assert _check(searcher, oracle_index, q)


def test_absolute_threshold(searcher, oracle_index, vocab):
    """max_term_frequency >= 1 classifies by absolute df."""
    hot, _hot2, mid, rare = vocab
    thr = float(_df_of(oracle_index, mid))  # mid itself is NOT high (df > thr is strict)
    q = CommonTermsQuery(terms=(hot, mid, rare), max_term_frequency=thr)
    rw = searcher.rewrite(q)
    low_terms = {c.term for c in (rw.must[0].must or rw.must[0].should)}
    assert low_terms == {mid, rare}
    assert _check(searcher, oracle_index, q)


def test_must_not_occur_rejected(searcher):
    with pytest.raises(ValueError, match="MUST or SHOULD"):
        searcher.rewrite(
            CommonTermsQuery(terms=("a", "b"), low_freq_occur="MUST_NOT")
        )
