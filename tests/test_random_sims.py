"""Seeded randomized cross-similarity equivalence sweep.

Random boolean shapes (term + phrase clauses, must/should/must_not, msm)
under classic, the LM models, and DFR/IB members — engine vs the
mixed-boolean oracle recomputations. Complements the per-feature parity
suites with shape × similarity combinations nobody hand-picked.
"""
import random

import pytest

from lucenenet_spark import oracle
from lucenenet_spark.operators.search import IndexSearcher
from lucenenet_spark.plans.query import BooleanQuery, PhraseQuery, TermQuery

from .conftest import hits

SIMS = ["classic", "lmd", "lmjm", "dfr_gb2", "ib_ll"]
TERMS = ["popcorn", "hello", "common1", "common2", "common3", "common5", "word7"]


def _pairs(corpus_pdf):
    from lucenenet_spark.functions.analysis import tokenize_text

    seen = {}
    for text in corpus_pdf["text"]:
        toks = tokenize_text(text)
        for a, b in zip(toks, toks[1:]):
            seen[(a, b)] = seen.get((a, b), 0) + 1
    return [p for p, n in sorted(seen.items(), key=lambda kv: -kv[1])[:6]]


@pytest.mark.parametrize("sim", SIMS)
def test_random_mixed_shapes(spark, index_dir, oracle_index, corpus_pdf, sim):
    rng = random.Random(hash(sim) & 0xFFFF)
    pairs = _pairs(corpus_pdf)
    s = IndexSearcher(spark, index_dir, similarity=sim)
    for trial in range(4):
        n_must = rng.randint(0, 2)
        n_should = rng.randint(0 if n_must else 1, 2)
        use_phrase = rng.random() < 0.7
        specs_must, specs_should, q_must, q_should = [], [], [], []

        def mk(as_phrase):
            if as_phrase:
                p = rng.choice(pairs)
                slop = rng.choice([0, 2])
                return ("phrase", list(p), slop), PhraseQuery(terms=p, slop=slop)
            t = rng.choice(TERMS)
            return t, TermQuery(term=t)

        for i in range(n_must):
            spec, node = mk(use_phrase and i == 0)
            specs_must.append(spec)
            q_must.append(node)
        for i in range(n_should):
            spec, node = mk(use_phrase and not q_must)
            specs_should.append(spec)
            q_should.append(node)
        must_not = []
        q_not = []
        if rng.random() < 0.4:
            t = rng.choice(TERMS)
            must_not.append(t)
            q_not.append(TermQuery(term=t))
        msm = rng.choice([0, 1]) if n_should >= 1 else 0
        q = BooleanQuery(
            must=tuple(q_must),
            should=tuple(q_should),
            must_not=tuple(q_not),
            min_should_match=msm,
        )
        if sim == "classic":
            want = oracle.classic_mixed_boolean_scores(
                oracle_index, must=specs_must, should=specs_should,
                must_not=must_not, min_should_match=msm,
            )
        else:
            want = oracle.sim_mixed_boolean_scores(
                oracle_index, sim, must=specs_must, should=specs_should,
                must_not=must_not, min_should_match=msm,
            )
        got = hits(s.search(q, 12, prune=False))
        assert got == oracle.top_k(want, 12), (sim, trial, q)


def test_classic_phrase_must_not(spark, index_dir, oracle_index, corpus_pdf):
    """Phrase clause under MUST_NOT with classic: matched docs excluded."""
    pair = _pairs(corpus_pdf)[0]
    s = IndexSearcher(spark, index_dir, similarity="classic")
    q = BooleanQuery(
        should=(TermQuery(term="popcorn"),),
        must_not=(PhraseQuery(terms=pair),),
    )
    want = oracle.classic_mixed_boolean_scores(
        oracle_index, should=["popcorn"],
        must_not=[("phrase", list(pair), 0)],
    )
    got = hits(s.search(q, 15, prune=False))
    assert got == oracle.top_k(want, 15)
