"""Spark engine vs pure-Python oracle: exact rank+float32-score parity.

This is the heart of the suite — the TestBoolean2.cs:300-style equivalence
check: every query family is run through the distributed engine and must be
identical (docids AND float32 scores) to the single-node oracle over the
same corpus with the same docID assignment.
"""
import numpy as np
import pytest

from lucenenet_spark import oracle
from lucenenet_spark.plans.parser import parse
from lucenenet_spark.plans.query import (
    BooleanQuery,
    DisMaxQuery,
    FuzzyQuery,
    MatchAllQuery,
    PrefixQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

from .conftest import hits

TERMS = ["popcorn", "word7", "word42", "rare12", "hello", "common3", "the", "absent_xyz"]


def oracle_hits(oidx, k=10, **kw):
    return oracle.top_k(oracle.boolean_scores(oidx, **kw), k)


@pytest.mark.parametrize("term", TERMS)
def test_term_query_parity(searcher, oracle_index, term):
    got = hits(searcher.search(TermQuery(term=term), 10))
    want = oracle.top_k(oracle.term_scores(oracle_index, term), 10)
    assert got == want


def test_term_query_large_k(searcher, oracle_index):
    got = hits(searcher.search(TermQuery(term="popcorn"), 100))
    want = oracle.top_k(oracle.term_scores(oracle_index, "popcorn"), 100)
    assert got == want


def test_boolean_and(searcher, oracle_index):
    q = BooleanQuery(must=(TermQuery(term="popcorn"), TermQuery(term="common3")))
    assert hits(searcher.search(q, 10)) == oracle_hits(
        oracle_index, must=["popcorn", "common3"]
    )


def test_boolean_and3(searcher, oracle_index):
    q = BooleanQuery(
        must=(TermQuery(term="popcorn"), TermQuery(term="common3"), TermQuery(term="common5"))
    )
    assert hits(searcher.search(q, 10)) == oracle_hits(
        oracle_index, must=["popcorn", "common3", "common5"]
    )


def test_boolean_and_absent_term_empty(searcher, oracle_index):
    q = BooleanQuery(must=(TermQuery(term="absent_xyz"), TermQuery(term="popcorn")))
    assert hits(searcher.search(q, 10)) == []


@pytest.mark.parametrize("prune", [True, False])
def test_boolean_or_pruned_and_unpruned(searcher, oracle_index, prune):
    q = BooleanQuery(
        should=(TermQuery(term="popcorn"), TermQuery(term="word7"), TermQuery(term="rare12"))
    )
    got = hits(searcher.search(q, 10, prune=prune))
    assert got == oracle_hits(oracle_index, should=["popcorn", "word7", "rare12"])


def test_forced_block_max_prune_is_rank_safe(spark, index_dir, oracle_index):
    """prune_min_postings=0 forces the WAND path even on tiny corpora; results
    must stay identical to the oracle (ties kept — north-rule safety claim)."""
    from lucenenet_spark.operators.search import IndexSearcher

    s = IndexSearcher(spark, index_dir, prune_min_postings=0)
    for terms in [["popcorn"], ["popcorn", "word7", "hello"], ["word7", "common3"]]:
        q = BooleanQuery(should=tuple(TermQuery(term=t) for t in terms))
        for k in [1, 3, 10]:
            got = hits(s.search(q, k, prune=True))
            assert got == oracle_hits(oracle_index, k=k, should=terms), (terms, k)


def test_boolean_or_wide(searcher, oracle_index):
    terms = [f"word{i}" for i in range(16)]
    q = BooleanQuery(should=tuple(TermQuery(term=t) for t in terms))
    assert hits(searcher.search(q, 10)) == oracle_hits(oracle_index, should=terms)


def test_boolean_mixed(searcher, oracle_index):
    q = parse("+popcorn word7 -rare12")
    got = hits(searcher.search(q, 10))
    want = oracle_hits(oracle_index, must=["popcorn"], should=["word7"], must_not=["rare12"])
    assert got == want


@pytest.mark.parametrize("msm", [2, 3])
def test_min_should_match(searcher, oracle_index, msm):
    terms = ["word7", "popcorn", "rare12", "hello"]
    q = BooleanQuery(should=tuple(TermQuery(term=t) for t in terms), min_should_match=msm)
    got = hits(searcher.search(q, 10, prune=False))
    assert got == oracle_hits(oracle_index, should=terms, min_should_match=msm)


def test_dismax(searcher, oracle_index):
    q = DisMaxQuery(queries=(TermQuery(term="word7"), TermQuery(term="popcorn")), tie_breaker=0.3)
    got = hits(searcher.search(q, 10))
    assert got == oracle.top_k(oracle.dismax_scores(oracle_index, ["word7", "popcorn"], 0.3), 10)


def test_match_all(searcher, oracle_index):
    got = searcher.search(MatchAllQuery(), oracle_index.max_doc + 10, prune=False)
    assert got.count() == oracle_index.max_doc


def test_count(searcher, oracle_index):
    assert searcher.count(TermQuery(term="popcorn")) == len(
        oracle.term_scores(oracle_index, "popcorn")
    )


def test_prefix(searcher, oracle_index):
    want = {d for t, pl in oracle_index.postings.items() if t.startswith("rare1") for d, _ in pl}
    assert searcher.count(PrefixQuery(prefix="rare1")) == len(want)


def test_wildcard(searcher, oracle_index):
    want = {
        d
        for t, pl in oracle_index.postings.items()
        if len(t) == 6 and t.startswith("word7")
        for d, _ in pl
    }
    assert searcher.count(WildcardQuery(pattern="word7?")) == len(want)


def test_term_range(searcher, oracle_index):
    want = {
        d
        for t, pl in oracle_index.postings.items()
        if "word10" <= t <= "word20"
        for d, _ in pl
    }
    q = TermRangeQuery(lower="word10", upper="word20")
    assert searcher.count(q) == len(want)


def test_fuzzy(searcher, oracle_index):
    got = hits(searcher.search(FuzzyQuery(term="popcorm", max_edits=1), 5))
    # constant-score expansion: all matched docs score 1.0f
    assert len(got) == 5
    assert all(s == np.float32(1.0) for _, s in got)


def test_fuzzy_transposition(searcher, oracle_index):
    """Lucene FuzzyQuery defaults transpositions=true: 'popcron' is ONE
    Damerau-Levenshtein edit from 'popcorn' (plain Levenshtein says 2), so
    max_edits=1 must match every popcorn doc (FuzzyQuery.cs,
    LevenshteinAutomata.cs)."""
    from lucenenet_spark.operators.search import dl_distance

    assert dl_distance("popcron", "popcorn") == 1
    assert dl_distance("teh", "the") == 1
    assert dl_distance("ca", "abc") == 2  # unrestricted DL (edit after swap)
    n_popcorn = len(oracle_index.postings["popcorn"])
    got = hits(searcher.search(FuzzyQuery(term="popcron", max_edits=1), 1000))
    assert len(got) >= n_popcorn
    assert {d for d, _ in got} >= {d for d, _ in oracle_index.postings["popcorn"]}


def test_search_after(searcher, oracle_index):
    scores = oracle.boolean_scores(oracle_index, should=["word7", "popcorn"])
    p1 = oracle.top_k(scores, 5)
    want = oracle.search_after(scores, 5, float(p1[-1][1]), p1[-1][0])
    q = BooleanQuery(should=(TermQuery(term="word7"), TermQuery(term="popcorn")))
    got = hits(searcher.search_after(q, 5, float(p1[-1][1]), p1[-1][0]))
    assert got == want


def test_stopword_query_zero_hits(searcher):
    assert searcher.count(TermQuery(term="the")) == 0


def test_empty_boolean_query_zero_hits(searcher):
    # all-stopword query text parses to a clause-less BooleanQuery
    assert searcher.count(parse("the of and")) == 0
    assert hits(searcher.search(BooleanQuery(), 10)) == []


def test_facet_and_grouping(searcher, oracle_index, corpus_pdf):
    n = searcher.count(TermQuery(term="popcorn"))
    fc = {r["role"]: r["count"] for r in searcher.facet_counts(TermQuery(term="popcorn")).collect()}
    assert sum(fc.values()) == n
    g = searcher.group_top_k(TermQuery(term="popcorn"), "conv_id", 2)
    pdf = g.toPandas()
    assert (pdf.groupby("conv_id").size() <= 2).all()
    assert pdf["rank_in_group"].max() <= 2


def test_sort_by_field(searcher, oracle_index):
    got = searcher.sort_by_field(TermQuery(term="popcorn"), ["ts"], k=5).toPandas()
    assert list(got["ts"]) == sorted(got["ts"])


def test_rescore(searcher, oracle_index):
    got = hits(searcher.rescore(TermQuery(term="popcorn"), TermQuery(term="word7"), n=50, k=5))
    first = oracle.term_scores(oracle_index, "popcorn")
    second = oracle.term_scores(oracle_index, "word7")
    top_n = oracle.top_k(first, 50)
    re = {d: float(s) + float(second.get(d, 0.0)) for d, s in top_n}
    want = sorted(re.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(d, pytest.approx(s, abs=1e-6)) for d, s in got] == want


def test_block_join_parent_scores(searcher, oracle_index, corpus_pdf):
    """ToParentBlockJoin analogue: conversation scores from child turns."""
    import numpy as np

    from lucenenet_spark import oracle
    from lucenenet_spark.plans.query import TermQuery

    sc = oracle.term_scores(oracle_index, "popcorn")
    per: dict = {}
    for d in sorted(sc):
        per.setdefault(corpus_pdf["conv_id"].iloc[d], []).append(sc[d])
    for mode in ("max", "total", "avg"):
        if mode == "max":
            want_scores = {c: np.float32(max(v)) for c, v in per.items()}
        else:
            want_scores = {}
            for c, v in per.items():
                t = np.float32(0.0)
                for s in v:
                    t = np.float32(t + s)
                want_scores[c] = (
                    t if mode == "total" else np.float32(t / np.float32(len(v)))
                )
        want = sorted(want_scores.items(), key=lambda kv: (-float(kv[1]), kv[0]))[:10]
        got = [
            (r["parent"], np.float32(r["score"]))
            for r in searcher.to_parent_join(
                TermQuery(term="popcorn"), mode, k=10
            ).collect()
        ]
        assert got == [(c, np.float32(s)) for c, s in want], mode


def test_constant_score_conjunction(searcher, oracle_index):
    """ConstantScoreQuery over a MUST boolean matches exactly the
    conjunction's docs (ConstantScoreQuery.cs wraps the inner query's
    matches, not the union of its terms' postings)."""
    from lucenenet_spark.plans.query import ConstantScoreQuery

    by_df = sorted(oracle_index.postings, key=lambda t: -len(oracle_index.postings[t]))
    t1, t2 = None, None
    for a in by_df[:10]:
        for b in by_df[:10]:
            if a == b:
                continue
            da = {d for d, _tf in oracle_index.postings[a]}
            db = {d for d, _tf in oracle_index.postings[b]}
            if da & db and da - db and db - da:
                t1, t2 = a, b
                break
        if t1:
            break
    assert t1, "fixture needs a co-occurring, non-nested term pair"
    inner = BooleanQuery(must=(TermQuery(term=t1), TermQuery(term=t2)))
    got = {
        r["docid"]: np.float32(r["score"])
        for r in searcher.scores(ConstantScoreQuery(query=inner, boost=2.0)).collect()
    }
    want_docs = set(oracle.boolean_scores(oracle_index, must=[t1, t2]))
    assert set(got) == want_docs and want_docs
    assert all(s == np.float32(2.0) for s in got.values())
    # union of the two postings lists is strictly larger — the old fast
    # path's answer would have been wrong
    union = set(oracle.term_scores(oracle_index, t1)) | set(
        oracle.term_scores(oracle_index, t2)
    )
    assert want_docs < union
