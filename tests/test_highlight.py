"""Highlighting + suggest/spellcheck satellites."""
from lucenenet_spark.operators import highlight as hl
from lucenenet_spark.plans.query import TermQuery


def test_best_window_selection():
    toks = "a b popcorn c d popcorn popcorn e f g".split()
    s, c = hl.best_window(toks, {"popcorn"}, 4)
    assert (s, c) == (2, 2)  # popcorn c d popcorn — earliest 2-match window
    s3, c3 = hl.best_window(toks, {"popcorn"}, 3)
    assert (s3, c3) == (4, 2)  # d popcorn popcorn
    s0, c0 = hl.best_window([], {"x"}, 4)
    assert (s0, c0) == (0, 0)
    s1, c1 = hl.best_window(["x"], {"x"}, 4)
    assert (s1, c1) == (0, 1)  # window clamps to short docs


def test_highlight_marks_hits(spark, searcher, corpus_pdf):
    src = spark.createDataFrame(corpus_pdf)
    out = hl.highlight(
        searcher, TermQuery(term="popcorn"), ["popcorn"], src, k=5
    ).toPandas()
    assert len(out) == 5
    assert (out["n_matches"] >= 1).all()
    assert out["snippet"].str.contains("<b>popcorn</b>").all()
    # stopwords stay readable in the snippet but are never marked
    assert not out["snippet"].str.contains("<b>the</b>").any()


def test_suggest_and_spell(searcher, oracle_index):
    sugg = hl.suggest_terms(searcher, "pop", 5).toPandas()
    assert list(sugg["term"])[:1] == ["popcorn"]
    assert int(sugg["df"][0]) == len(oracle_index.postings["popcorn"])
    sp = hl.spell_suggest(searcher, "popcorm", max_edits=1, k=3).toPandas()
    assert list(sp["term"])[:1] == ["popcorn"]
    assert int(sp["edits"][0]) == 1
    # the query word itself (edits=0) is never suggested
    sp2 = hl.spell_suggest(searcher, "popcorn", max_edits=2, k=5).toPandas()
    assert "popcorn" not in set(sp2["term"])


def test_more_like_this(spark, searcher, corpus_pdf, oracle_index):
    from lucenenet_spark.operators import mlt

    src = spark.createDataFrame(corpus_pdf)
    # find a doc with interesting terms (tf >= 2 of a df >= 5 term)
    docid, terms = next(
        (d, ts)
        for d in range(len(corpus_pdf))
        if (ts := mlt.interesting_terms(searcher, corpus_pdf["text"].iloc[d]))
    )
    out = mlt.more_like_this(searcher, src, docid, k=10).toPandas()
    assert len(out) > 0 and docid not in set(out["docid"])
    # hits genuinely share vocabulary with the source doc
    top = int(out["docid"].iloc[0])
    doc_terms = {
        t for t, pl in oracle_index.postings.items() if any(d == top for d, _ in pl)
    }
    assert doc_terms & set(terms)


def test_highlight_offsets_marks_at_char_offsets(spark, corpus_pdf, tmp_path_factory):
    """Fragments come from INDEXED char offsets (4th IndexOptions level):
    the marked substrings must be literal occurrences of the term in the
    raw text at those offsets."""
    import shutil

    from lucenenet_spark.datagen import transcripts_spark
    from lucenenet_spark.operators.index_build import IndexBuilder
    from lucenenet_spark.operators.search import IndexSearcher

    out = str(tmp_path_factory.mktemp("idxoff") / "main")
    shutil.rmtree(out, ignore_errors=True)
    df = transcripts_spark(spark, 200, partitions=2)
    IndexBuilder(
        spark, out, n_buckets=2, n_segments=2,
        index_options="docs_freqs_positions_offsets",
    ).build(df)
    s = IndexSearcher(spark, out)
    src = spark.createDataFrame(
        transcripts_spark(spark, 200, partitions=2).toPandas()
    )
    # CheckIndex validates the offsets payload too (end>start, per-posting
    # start monotonicity)
    from lucenenet_spark.validate import check_index

    assert check_index(spark, out)["ok"]
    res = hl.highlight_offsets(
        s, TermQuery(term="popcorn"), ["popcorn"], src, k=5
    ).toPandas()
    assert len(res) == 5
    assert (res["n_matches"] >= 1).all()
    assert res["snippet"].str.contains("<b>").all()
    # each marked region is exactly the term as it appears in the text
    import re

    for snip in res["snippet"]:
        for m in re.finditer(r"<b>([^<]*)</b>", snip):
            assert m.group(1).lower() == "popcorn"


def test_highlight_offsets_requires_offsets_index(searcher, spark, corpus_pdf):
    """The conftest index stores positions only -> a clear error, like
    Lucene's PostingsHighlighter IllegalArgumentException on missing
    offsets."""
    import pytest

    src = spark.createDataFrame(corpus_pdf)
    with pytest.raises(NotImplementedError):
        hl.highlight_offsets(searcher, TermQuery(term="popcorn"), ["popcorn"], src)


def test_highlight_offsets_survive_merge(spark, tmp_path_factory):
    """Offsets flow through segment merge (decode -> partials -> re-encode)
    and the merged manifest keeps the index_options level."""
    import shutil

    from lucenenet_spark.datagen import transcripts_spark
    from lucenenet_spark.operators.index_build import IndexBuilder
    from lucenenet_spark.operators.merge import merge_segments
    from lucenenet_spark.operators.search import IndexSearcher

    base = tmp_path_factory.mktemp("idxoffm")
    dirs = []
    for i, (lo, hi) in enumerate([(0, 100), (100, 200)]):
        out = str(base / f"seg{i}")
        pdf = (
            transcripts_spark(spark, 200, partitions=1)
            .toPandas()
            .sort_values(["conv_id", "turn_idx"])
            .iloc[lo:hi]
        )
        IndexBuilder(
            spark, out, n_buckets=2, n_segments=1,
            index_options="docs_freqs_positions_offsets",
        ).build(spark.createDataFrame(pdf), build_id=f"s{i}")
        dirs.append(out)
    merged = str(base / "merged")
    m = merge_segments(spark, dirs, merged, n_buckets=2)
    assert m["index_options"] == "docs_freqs_positions_offsets"
    s = IndexSearcher(spark, merged)
    src = spark.createDataFrame(transcripts_spark(spark, 200, partitions=1).toPandas())
    res = hl.highlight_offsets(
        s, TermQuery(term="popcorn"), ["popcorn"], src, k=3
    ).toPandas()
    assert len(res) == 3 and (res["n_matches"] >= 1).all()
    assert res["snippet"].str.contains("<b>popcorn</b>").all()
