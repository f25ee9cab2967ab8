"""NGramPhraseQuery — rewrite parity (TestNGramPhraseQuery.cs TestRewrite)
and search equivalence with the explicitly-positioned phrase."""
import numpy as np

from lucenenet_spark.plans.query import NGramPhraseQuery, PhraseQuery
from tests.conftest import hits


def test_rewrite_vectors(searcher):
    rw = searcher.rewrite
    # bi-gram AB/BC stays un-optimized (< 3 terms) -> plain phrase copy
    q = rw(NGramPhraseQuery(n=2, terms=("AB", "BC")))
    assert isinstance(q, PhraseQuery)
    assert q.terms == ("AB", "BC")
    # ABCD => AB/BC/CD => AB//CD
    q = rw(NGramPhraseQuery(n=2, terms=("AB", "BC", "CD")))
    assert q.terms == ("AB", "CD") and q.positions == (0, 2)
    # tri-gram ABCDEFGH => ABC///DEF//FGH
    q = rw(
        NGramPhraseQuery(
            n=3, terms=("ABC", "BCD", "CDE", "DEF", "EFG", "FGH")
        )
    )
    assert q.terms == ("ABC", "DEF", "FGH") and q.positions == (0, 3, 5)
    # boost survives (LUCENE-4970)
    q = rw(NGramPhraseQuery(n=2, terms=("AB", "BC", "CD"), boost=100.0))
    assert q.boost == 100.0
    # slop disables the optimization
    q = rw(NGramPhraseQuery(n=2, terms=("AB", "BC", "CD"), slop=1))
    assert q.terms == ("AB", "BC", "CD")
    # non-consecutive positions disable it
    q = rw(
        NGramPhraseQuery(
            n=2, terms=("AB", "BC", "CD"), positions=(0, 2, 3)
        )
    )
    assert q.terms == ("AB", "BC", "CD")


def test_search_equals_positioned_phrase(searcher):
    got = hits(
        searcher.search(
            NGramPhraseQuery(
                n=2, terms=("popcorn", "word1", "word2")
            ),
            15,
        )
    )
    want = hits(
        searcher.search(
            PhraseQuery(
                terms=("popcorn", "word2"), positions=(0, 2)
            ),
            15,
        )
    )
    assert [(d, np.float32(s)) for d, s in got] == [
        (d, np.float32(s)) for d, s in want
    ]
