"""Shared fixtures: one SparkSession, one corpus, indexes built once.

Mirrors the reference test strategy (SURVEY.md §5): a trusted pure-Python
oracle + the Spark engine over the same corpus with identical docIDs, and an
N-partition vs 1-partition build for TestTopDocsMerge-style equivalence.
"""
from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 500  # small enough for a fast suite, big enough for multi-block terms


@pytest.fixture(scope="session")
def spark():
    from lucenenet_spark.session import get_spark

    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_pdf():
    from lucenenet_spark.datagen import generate_transcripts

    return (
        generate_transcripts(N_DOCS)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="session")
def oracle_index(corpus_pdf):
    from lucenenet_spark import oracle

    return oracle.build_index(corpus_pdf["text"].tolist())


@pytest.fixture(scope="session")
def index_dir(spark, tmp_path_factory):
    """Engine index over the same corpus, multi-segment multi-bucket build."""
    from lucenenet_spark.datagen import transcripts_spark
    from lucenenet_spark.operators.index_build import IndexBuilder

    out = str(tmp_path_factory.mktemp("idx") / "main")
    df = transcripts_spark(spark, N_DOCS, partitions=4)
    # salt_target small so the hot 'popcorn' term actually exercises salting
    IndexBuilder(spark, out, n_buckets=8, n_segments=8, salt_target=60).build(df)
    return out


@pytest.fixture(scope="session")
def index_dir_1seg(spark, tmp_path_factory):
    """Same corpus, single segment/bucket — partition-equivalence baseline."""
    from lucenenet_spark.datagen import transcripts_spark
    from lucenenet_spark.operators.index_build import IndexBuilder

    out = str(tmp_path_factory.mktemp("idx1") / "main")
    df = transcripts_spark(spark, N_DOCS, partitions=1)
    IndexBuilder(spark, out, n_buckets=1, n_segments=1, salt_target=10**9).build(df)
    return out


@pytest.fixture(scope="session")
def searcher(spark, index_dir):
    from lucenenet_spark.operators.search import IndexSearcher

    return IndexSearcher(spark, index_dir)


@pytest.fixture(scope="session")
def searcher_1seg(spark, index_dir_1seg):
    from lucenenet_spark.operators.search import IndexSearcher

    return IndexSearcher(spark, index_dir_1seg)


def hits(df) -> list[tuple[int, "np.float32"]]:
    """Collect a search result into [(docid, float32 score)]."""
    import numpy as np

    return [(r["docid"], np.float32(r["score"])) for r in df.collect()]
