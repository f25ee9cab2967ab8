"""Sandbox fuzzy queries — SlowFuzzyTermsEnum enumeration + boost math
and FuzzyLikeThisQuery over the reference test's own 6-name corpus
(FuzzyLikeThisQueryTest.cs)."""
import datetime

import numpy as np
import pytest

from lucenenet_spark.operators.fuzzylike import (
    _lev,
    fuzzy_like_this,
    fuzzy_like_this_query,
    slow_fuzzy_query,
    slow_fuzzy_variants,
)
from tests.conftest import hits

NAMES = [
    ("jonathon smythe", "1"),
    ("jonathan smith", "2"),
    ("johnathon smyth", "3"),
    ("johnny smith", "4"),
    ("jonny smith", "5"),
    ("johnathon smythe", "6"),
]


@pytest.fixture(scope="module")
def names_searcher(spark, tmp_path_factory):
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from lucenenet_spark.operators.index_build import IndexBuilder
    from lucenenet_spark.operators.search import IndexSearcher

    schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", IntegerType()),
            StructField("role", StringType()),
            StructField("text", StringType()),
            StructField("tool", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("conv-0", i, "user", text, None, t0 + datetime.timedelta(seconds=i))
        for i, (text, _id) in enumerate(NAMES)
    ]
    out = str(tmp_path_factory.mktemp("names") / "idx")
    df = spark.createDataFrame(rows, schema)
    IndexBuilder(spark, out, n_buckets=1, n_segments=1).build(df)
    return IndexSearcher(spark, out)


def test_lev():
    assert _lev("", "abc") == 3
    assert _lev("kitten", "sitting") == 3
    assert _lev("ab", "ba") == 2  # NO transpositions (SlowFuzzy)


def test_variants_closest_edit_distance(names_searcher):
    # TestClosestEditDistanceMatchComesFirst: smith~0.3 prefix 1
    acc = slow_fuzzy_variants(names_searcher, "smith", 0.3, 1)
    got = {v for v, _df, _b in acc}
    assert {"smith", "smyth", "smythe"} <= got
    boosts = {v: b for v, _df, b in acc}
    # exact match has the highest boost, then smyth (ed 1), then smythe
    assert boosts["smith"] > boosts["smyth"] > boosts["smythe"]


def test_variant_boost_math_linear(names_searcher):
    # len('smith')=5, minSim 0.3 -> maxEdits=int(.7*5)=3 > 2 -> LINEAR:
    # sim = 1 - ed/(prefix + min(suffix lens)); boost=(sim-.3)/(1-.3)
    acc = {v: b for v, _d, b in
           slow_fuzzy_variants(names_searcher, "smith", 0.3, 1)}
    scale = np.float32(np.float32(1.0) / np.float32(0.7))
    sim_smyth = np.float32(1.0) - np.float32(
        np.float32(1) / np.float32(1 + 4)
    )
    assert acc["smyth"] == np.float32(
        np.float32(sim_smyth - np.float32(0.3)) * scale
    )


def test_variant_boost_math_automaton(names_searcher):
    # 'smith' len 5, minSim 0.5 -> maxEdits=int(2.5)=2 -> AUTOMATON path:
    # sim over FULL lengths; exact match boosts 1.0 unconditionally
    acc = {v: b for v, _d, b in
           slow_fuzzy_variants(names_searcher, "smith", 0.5, 0)}
    assert acc["smith"] == np.float32(1.0)
    scale = np.float32(np.float32(1.0) / np.float32(0.5))
    sim_smyth = np.float32(1.0) - np.float32(np.float32(1) / np.float32(5))
    assert acc["smyth"] == np.float32(
        np.float32(sim_smyth - np.float32(0.5)) * scale
    )
    sim_smythe = np.float32(1.0) - np.float32(np.float32(2) / np.float32(5))
    assert acc["smythe"] == np.float32(
        np.float32(sim_smythe - np.float32(0.5)) * scale
    )


def test_flt_query_terms_and_top_doc(names_searcher):
    q = fuzzy_like_this_query(names_searcher, "smith", 0.3, 1)
    qterms = {c.query.term for c in q.should}
    assert {"smith", "smyth", "smythe"} <= qterms
    top = hits(fuzzy_like_this(names_searcher, "smith", 6, min_similarity=0.3,
                               prefix_length=1))
    # most similar (contains the exact variant), docid tie-break -> doc "2"
    assert top[0][0] == 1


def test_flt_multiword(names_searcher):
    q = fuzzy_like_this_query(names_searcher, "jonathin smoth", 0.3, 1)
    qterms = {c.query.term for c in q.should}
    assert "jonathan" in qterms and "smith" in qterms
    top = hits(
        fuzzy_like_this(
            names_searcher, "jonathin smoth", 6,
            min_similarity=0.3, prefix_length=1,
        )
    )
    assert top[0][0] == 1  # doc "2": jonathan smith


def test_flt_no_match_first_word(names_searcher):
    # TestNoMatchFirstWordBug: first word has no variants at all
    top = hits(
        fuzzy_like_this(
            names_searcher, "fernando smith", 6,
            min_similarity=0.3, prefix_length=1,
        )
    )
    assert top[0][0] == 1


def test_slow_fuzzy_query(names_searcher):
    got = hits(slow_fuzzy_query(names_searcher, "smith", 0.3, 1, k=6))
    assert len(got) == 6  # every name has some smith-ish variant
    # docs holding the exact term outrank ed-1 docs
    exact_docs = {1, 3, 4}
    assert got[0][0] in exact_docs


def test_max_num_terms_cap(names_searcher):
    q = fuzzy_like_this_query(
        names_searcher, "smith", 0.3, 0, max_num_terms=2
    )
    assert len(q.should) == 2
