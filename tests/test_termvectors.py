"""Term-vectors channel: per-doc (term, tf, positions) parity vs the
oracle's in-memory positions map, docid pruning, and the missing-channel
guard.

Reference: IndexReader.GetTermVector (Index/IndexReader.cs:492-505);
vectors written once at index time (Codecs/TermVectorsWriter.cs), terms
enumerated in term order.
"""
import pytest

from lucenenet_spark.datagen import transcripts_spark
from lucenenet_spark.operators import termvectors as tv

from .conftest import N_DOCS


@pytest.fixture(scope="module")
def tv_searcher(spark, searcher, index_dir):
    df = transcripts_spark(spark, N_DOCS, partitions=4)
    tv.build_term_vectors(spark, df, index_dir)
    return searcher


def test_term_vectors_match_oracle_positions(tv_searcher, oracle_index):
    docids = [0, 3, 17, N_DOCS - 1]
    rows = tv.term_vectors(tv_searcher, docids=docids).collect()
    got = {}
    for r in rows:
        got.setdefault(r["docid"], {})[r["term"]] = (r["tf"], list(r["positions"]))
    for d in docids:
        want = {}
        for term, by_doc in oracle_index.positions.items():
            if d in by_doc:
                ps = sorted(by_doc[d])
                want[term] = (len(ps), ps)
        assert got.get(d, {}) == want, d


def test_term_vectors_terms_sorted(tv_searcher):
    rows = tv.term_vectors(tv_searcher, docids=[0]).orderBy("term").collect()
    terms = [r["term"] for r in rows]
    assert terms == sorted(terms) and len(set(terms)) == len(terms)


def test_term_vectors_docid_filter(tv_searcher):
    rows = tv.term_vectors(tv_searcher, docids=[5, 7]).collect()
    assert {r["docid"] for r in rows} == {5, 7}


def test_term_vectors_build_idempotent(spark, tv_searcher, index_dir):
    df = transcripts_spark(spark, N_DOCS, partitions=4)
    p1 = tv.build_term_vectors(spark, df, index_dir)
    p2 = tv.build_term_vectors(spark, df, index_dir)
    assert p1 == p2


def test_missing_channel_guard(spark, index_dir_1seg, searcher_1seg):
    with pytest.raises(NotImplementedError, match="term-vectors"):
        tv.term_vectors(searcher_1seg, docids=[0])


def test_mlt_from_term_vectors_matches_text_path(spark, tv_searcher, corpus_pdf):
    """MoreLikeThis via GetTermVector == MoreLikeThis via re-analysis
    (MoreLikeThis.cs:760-800: the two RetrieveTerms paths select the same
    terms when the vector stores the same tokens)."""
    from collections import Counter

    from lucenenet_spark.functions.analysis import tokenize_text
    from lucenenet_spark.operators import mlt

    # docids whose text repeats a term (min_term_freq=2 needs tf >= 2)
    docids = [
        i
        for i, text in enumerate(corpus_pdf["text"])
        if (c := Counter(tokenize_text(text))) and c.most_common(1)[0][1] >= 2
    ][:3]
    assert len(docids) == 3, "fixture needs docs with repeated terms"
    src = transcripts_spark(spark, N_DOCS, partitions=4)
    for d in docids:
        a = [
            (r["docid"], r["score"])
            for r in mlt.more_like_this(tv_searcher, src, docid=d, k=10).collect()
        ]
        b = [
            (r["docid"], r["score"])
            for r in mlt.more_like_this(tv_searcher, None, docid=d, k=10).collect()
        ]
        assert a == b and a, d
