"""Seeded randomized boolean-equivalence — the TestBoolean2.cs:300 pattern:
random query trees over a fixed vocabulary, engine vs brute-force oracle,
rank- and float32-score-identical. Seeds are fixed so failures reproduce.
"""
import random

import numpy as np
import pytest

from lucenenet_spark import oracle
from lucenenet_spark.plans.query import BooleanQuery, DisMaxQuery, TermQuery

from .conftest import hits

VOCAB = [
    "popcorn", "hello", "common1", "common3", "common5", "word1", "word7",
    "word8", "word42", "word100", "absent_zz", "the",
]


def random_bool(rng: random.Random) -> tuple[BooleanQuery, dict]:
    n_must = rng.randint(0, 2)
    n_should = rng.randint(0 if n_must else 1, 4)
    n_not = rng.randint(0, 1)
    must = rng.sample(VOCAB, n_must)
    should = rng.sample(VOCAB, n_should)
    must_not = rng.sample([v for v in VOCAB if v not in must], n_not)
    msm = rng.randint(0, min(2, n_should)) if n_should else 0
    q = BooleanQuery(
        must=tuple(TermQuery(term=t) for t in must),
        should=tuple(TermQuery(term=t) for t in should),
        must_not=tuple(TermQuery(term=t) for t in must_not),
        min_should_match=msm,
    )
    return q, dict(must=must, should=should, must_not=must_not, min_should_match=msm)


@pytest.mark.parametrize("seed", range(12))
def test_random_boolean_equivalence(searcher, oracle_index, seed):
    rng = random.Random(1000 + seed)
    q, kw = random_bool(rng)
    k = rng.choice([1, 3, 10, 50])
    got = hits(searcher.search(q, k, prune=rng.random() < 0.5))
    want = oracle.top_k(oracle.boolean_scores(oracle_index, **kw), k)
    assert got == want, (seed, kw, k)


@pytest.mark.parametrize("seed", range(4))
def test_random_dismax_equivalence(searcher, oracle_index, seed):
    rng = random.Random(2000 + seed)
    terms = rng.sample(VOCAB, rng.randint(2, 4))
    tie = rng.choice([0.0, 0.1, 0.5])
    q = DisMaxQuery(queries=tuple(TermQuery(term=t) for t in terms), tie_breaker=tie)
    got = hits(searcher.search(q, 10))
    want = oracle.top_k(oracle.dismax_scores(oracle_index, terms, tie), 10)
    assert got == want, (seed, terms, tie)


@pytest.mark.parametrize("seed", range(4))
def test_random_nested_boolean(searcher, oracle_index, seed):
    """Nested sub-queries exercise the BooleanScorer2 composition path.

    Oracle equivalence: (inner OR) under MUST — docs must match the inner
    disjunction; score adds the inner sum."""
    rng = random.Random(3000 + seed)
    inner_terms = rng.sample(VOCAB[:8], 2)
    outer = rng.choice([t for t in VOCAB[:8] if t not in inner_terms])
    q = BooleanQuery(
        must=(
            TermQuery(term=outer),
            BooleanQuery(should=tuple(TermQuery(term=t) for t in inner_terms)),
        )
    )
    got = hits(searcher.search(q, 20))
    # brute-force oracle for the nested shape
    s_outer = oracle.term_scores(oracle_index, outer)
    s_inner = oracle.boolean_scores(oracle_index, should=inner_terms)
    docs = set(s_outer) & set(s_inner)
    scores = {
        d: np.float32(np.float32(np.float32(0.0) + s_outer[d]) + s_inner[d])
        for d in docs
    }
    want = oracle.top_k(scores, 20)
    assert got == want, (seed, outer, inner_terms)


@pytest.mark.parametrize("seed", range(8))
def test_random_phrase_equivalence(searcher, oracle_index, corpus_pdf, seed):
    """Random 2-3 term phrases (terms drawn from real adjacent text) at
    random slop: engine must match the oracle bit-for-bit — covers the
    distributed plumbing (multi-block positions, salts, query gaps)."""
    from lucenenet_spark.functions.analysis import tokenize_text
    from lucenenet_spark.plans.query import PhraseQuery

    rng = random.Random(7000 + seed)
    texts = corpus_pdf["text"].tolist()
    row = rng.choice([t for t in texts if len(tokenize_text(t)) >= 3])
    toks = tokenize_text(row)
    i = rng.randrange(len(toks) - 2)
    n = rng.choice([2, 3])
    terms = toks[i : i + n]
    slop = rng.choice([0, 1, 2, 4])
    q = PhraseQuery(terms=tuple(terms), slop=slop)
    want = oracle.top_k(
        oracle.phrase_scores(oracle_index, list(terms), slop=slop), 10
    )
    got = hits(searcher.search(q, 10))
    assert got == want, (terms, slop)


@pytest.mark.parametrize("seed", range(6))
def test_random_span_equivalence(searcher, oracle_index, seed):
    """Random span trees (near/or/first/not over vocab terms)."""
    from lucenenet_spark.operators import spans as sp

    rng = random.Random(9000 + seed)
    terms = rng.sample([v for v in VOCAB if v not in ("absent_zz", "the")], 3)
    t1, t2, t3 = (sp.SpanTermQuery(term=t) for t in terms)
    q = rng.choice(
        [
            sp.SpanNearQuery(clauses=(t1, t2), slop=rng.choice([1, 3, 6]),
                             in_order=rng.random() < 0.5),
            sp.SpanNearQuery(
                clauses=(sp.SpanOrQuery(clauses=(t1, t3)), t2), slop=4
            ),
            sp.SpanFirstQuery(match=t1, end=rng.choice([3, 8])),
            sp.SpanNotQuery(include=t1, exclude=t2),
        ]
    )
    want = oracle.top_k(sp.span_scores_oracle(oracle_index, q), 10)
    got = hits(sp.span_search(searcher, q, 10))
    assert got == want, q
