"""Term vectors: an optional doc-major index channel.

Reference: per-document mini inverted index for fields indexed with
storeTermVectors=true — `IndexReader.GetTermVector(docID, field)` returns
the doc's terms with freq and positions (Index/IndexReader.cs:492-505,
written by Codecs/TermVectorsWriter.cs at flush). Lucene pays for the
channel once at index time so per-doc term enumeration never re-analyzes
stored text; consumers are MoreLikeThis, highlighting, "interesting terms".

Spark-first shape: a separate `tvectors/` parquet table under the index
directory, ONE ROW PER (docid, field, term) with tf and the positions
array, range-partitioned and sorted by docid — fetching the vectors of a
top-k result set is a row-group-pruned scan, never a shuffle. Built by one
extra embarrassingly-parallel job (analyze + co-keyed join against the
docid mapping); the posting-list build is untouched. At 10^12 docs the
channel scales exactly like the stored-fields table it mirrors.
"""
from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .index_build import docs_view, load_manifest

TV_SCHEMA = "docid long, field string, term string, tf int, positions array<int>"


def build_term_vectors(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    partitions: int | None = None,
) -> str:
    """Write the tvectors/ channel for an already-committed index.

    transcripts must be the same source the index was built from (per-turn
    text equality is the invariant); the docid mapping comes from the
    index's own docs view, so vectors use the index's docids. Idempotent:
    returns immediately if a channel stamped with the CURRENT manifest's
    (build_id, committed_at) exists; a rebuilt index (docids shift)
    invalidates the stamp and the channel is rebuilt."""
    out = os.path.join(index_dir, "tvectors")
    manifest = load_manifest(index_dir)
    if os.path.exists(os.path.join(out, "_SUCCESS")) and _stamp_matches(
        out, manifest
    ):
        return out
    ids = docs_view(spark, manifest).select("docid", "conv_id", "turn_idx")
    src = transcripts.select("conv_id", "turn_idx", "text")
    joined = ids.join(src, ["conv_id", "turn_idx"]).select("docid", "text")

    analyzer = manifest.get("analyzer", "standard")

    def vectorize(it):
        from ..functions.analysis import tokenize_with_positions

        for pdf in it:
            rows = []
            for docid, text in zip(pdf["docid"], pdf["text"]):
                toks, poss = tokenize_with_positions(text, analyzer)
                by_term: dict[str, list[int]] = {}
                for t, p in zip(toks, poss):
                    by_term.setdefault(t, []).append(p)
                # terms enumerate in term (bytes) order like a TermsEnum
                for t in sorted(by_term):
                    ps = by_term[t]
                    rows.append((int(docid), "text", t, len(ps), ps))
            yield pd.DataFrame(
                rows, columns=["docid", "field", "term", "tf", "positions"]
            )

    n = partitions or spark.sparkContext.defaultParallelism
    (
        joined.repartitionByRange(n, "docid")
        .mapInPandas(vectorize, TV_SCHEMA)
        .write.mode("overwrite")
        .parquet(out)
    )
    _write_stamp(out, manifest)
    return out


def _stamp_of(manifest: dict) -> str:
    return f"{manifest.get('build_id')}@{manifest.get('committed_at')}"


def _write_stamp(out: str, manifest: dict) -> None:
    tmp = os.path.join(out, "_index_stamp.tmp")
    with open(tmp, "w") as f:
        f.write(_stamp_of(manifest))
    os.replace(tmp, os.path.join(out, "_index_stamp"))


def _stamp_matches(out: str, manifest: dict) -> bool:
    p = os.path.join(out, "_index_stamp")
    if not os.path.exists(p):
        return False  # pre-stamp channel: treat as stale, rebuild
    with open(p) as f:
        return f.read() == _stamp_of(manifest)


def term_vectors(searcher, docids: list[int] | None = None) -> DataFrame:
    """GetTermVector analogue: (docid, field, term, tf, positions) rows for
    the given docids (all docs when None). Docid predicates push down to
    the range-sorted parquet (row-group min/max pruning) — fetching k docs'
    vectors touches O(k) row groups."""
    path = os.path.join(searcher.index_dir, "tvectors")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise NotImplementedError(
            "index has no term-vectors channel; run build_term_vectors "
            "(storeTermVectors=false in Lucene terms)"
        )
    df = searcher.spark.read.parquet(path)
    if docids is not None:
        df = df.filter(F.col("docid").isin([int(d) for d in docids]))
    return df
