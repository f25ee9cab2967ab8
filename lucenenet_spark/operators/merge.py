"""Segment merge (compaction): N index segments -> one, Lucene-merge semantics.

Re-derivation of the reference's merge pipeline (SURVEY.md §2.3):
- term-aligned k-way merge of postings (Codecs/TermsConsumer.cs:100-197,
  MappingMultiDocsEnum.cs:106) becomes: decode every segment's blocks,
  shift docids by the segment docBase (Index/MergeState.cs:40-102;
  AtomicReaderContext docBase), union, re-encode with the shared build
  encoder — the shuffle aligns terms, replacing MultiTermsEnum.
- docIDs are remapped by cumulative docBase exactly like SegmentMerger.cs:89-148.
- block-max bounds are RE-derived under the merged corpus stats: the stored
  per-segment bounds used the segment's own avgdl and are not valid upper
  bounds globally — this is why multi-segment searchers disable pruning and
  compaction restores it.
- the heavy stored-doc data is NOT rewritten: the merged manifest references
  the source segments' staging tables with docbases (docs_view unions them),
  like Lucene merges postings/norms but can share doc stores.
- salting is re-planned from EXACT merged df (summed per-segment term_stats,
  a tiny metadata union) rather than the build-time sketch.

The merge is itself a resumable staged job with an atomic manifest commit.
"""
from __future__ import annotations

import json
import math
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..oracle import norm_cache
from .codec import BLOCK_SIZE
from .index_build import (
    FIELD,
    POSTINGS_DDL,
    IndexBuilder,
    load_manifest,
    make_encode_partition,
    salt_expr,
    write_postings,
)

DECODED_DDL = "term string, docid long, tf long, norm_byte short, salt int"


def _decoded_rows(spark: SparkSession, segments: list[dict]) -> DataFrame:
    """Union of all segments' postings decoded to (term, docid, tf, norm) rows
    with docids shifted to the global space."""

    def decode_partition(it):
        from .codec import decode_block

        for pdf in it:
            outs = []
            for r in pdf.itertuples(index=False):
                docids, tfs = decode_block(
                    r.docids_enc, r.tfs_enc, r.first_docid, r.count
                )
                outs.append(
                    pd.DataFrame(
                        {
                            "term": r.term,
                            "docid": docids + r.docbase,
                            "tf": tfs,
                            "norm_byte": np.frombuffer(
                                r.norms_enc, dtype=np.uint8
                            ).astype(np.int16),
                            "salt": 0,
                        }
                    )
                )
            yield pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
                {
                    "term": pd.Series(dtype="object"),
                    "docid": pd.Series(dtype="int64"),
                    "tf": pd.Series(dtype="int64"),
                    "norm_byte": pd.Series(dtype="int16"),
                    "salt": pd.Series(dtype="int32"),
                }
            )

    out = None
    for s in segments:
        df = (
            spark.read.parquet(s["manifest"]["tables"]["postings"])
            .filter(F.col("block_no") >= 0)
            .withColumn("docbase", F.lit(s["docbase"]))
            .select(
                "term", "first_docid", "count", "docids_enc", "tfs_enc",
                "norms_enc", "docbase",
            )
            .mapInPandas(decode_partition, DECODED_DDL)
        )
        out = df if out is None else out.unionByName(df)
    return out


def merge_segments(
    spark: SparkSession,
    segment_dirs: list[str],
    out_dir: str,
    n_buckets: int = 32,
    salt_target: int = 1 << 20,
    block_size: int = BLOCK_SIZE,
    build_id: str = "merge-0",
) -> dict:
    """Compact N segments into one index at out_dir; returns its manifest."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    segments = []
    docbase = 0
    for d in segment_dirs:
        m = load_manifest(d)
        segments.append({"dir": d, "manifest": m, "docbase": docbase})
        docbase += int(m["max_doc"])
    first = segments[0]["manifest"]
    k1, b = float(first["k1"]), float(first["b"])
    max_doc = docbase
    sum_ttf = sum(int(s["manifest"]["sum_ttf"]) for s in segments)
    doc_count = sum(int(s["manifest"]["doc_count"]) for s in segments)
    avgdl = (
        float(np.float32(np.float64(sum_ttf) / np.float64(max_doc)))
        if sum_ttf > 0
        else 1.0
    )
    cache = norm_cache(k1, b, np.float32(avgdl))

    # exact merged df from the tiny per-segment term_stats tables -> salt plan
    ts = None
    for s in segments:
        df = spark.read.parquet(s["manifest"]["tables"]["term_stats"])
        ts = df if ts is None else ts.unionByName(df)
    hot_rows = (
        ts.groupBy("term").agg(F.sum("df").alias("df"))
        .filter(F.col("df") > salt_target)
        .collect()
    )
    hot = {r["term"]: int(math.ceil(r["df"] / salt_target)) for r in hot_rows}

    n_shuffle = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 8)
    lineage = json.dumps(
        {
            "build_id": build_id,
            "stage": "merge",
            "sources": [s["dir"] for s in segments],
            "docbases": [s["docbase"] for s in segments],
        }
    )
    flat = _decoded_rows(spark, segments).withColumn("salt", salt_expr(hot, max_doc))
    encoded = flat.repartition(n_shuffle, "term", "salt").mapInPandas(
        make_encode_partition(cache, n_buckets, block_size, lineage), POSTINGS_DDL
    )
    write_postings(encoded, os.path.join(out_dir, "postings"), n_buckets)

    # stats tables from the new postings metadata (binary cols pruned)
    postings = spark.read.parquet(os.path.join(out_dir, "postings")).filter(
        F.col("block_no") >= 0
    )
    (
        postings.groupBy("term")
        .agg(
            F.sum("count").alias("df"),
            F.sum("sum_tf").alias("ttf"),
            F.max("max_score_bound").alias("max_bound"),
        )
        .select(F.lit(FIELD).alias("field"), "term", "df", "ttf", "max_bound")
        .repartition(max(n_buckets // 4, 1))
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "term_stats"))
    )
    spark.createDataFrame(
        [(FIELD, max_doc, doc_count, sum_ttf, avgdl)],
        "field string, max_doc long, doc_count long, sum_ttf long, avgdl double",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, "field_stats"))

    # checkpoints: the encode meta rows of this merge
    metas = [
        json.loads(r["term"])
        for r in spark.read.parquet(os.path.join(out_dir, "postings"))
        .filter(F.col("block_no") == -1)
        .select("term")
        .collect()
    ]
    from datetime import datetime, timezone

    now = datetime.now(timezone.utc).isoformat()
    spark.createDataFrame(
        [
            (build_id, "merge", i, "done", int(m["postings"]),
             float(m["postings_per_sec"]), m["lineage"], now)
            for i, m in enumerate(metas)
        ],
        "build_id string, stage string, partition_id int, status string,"
        " postings long, postings_per_sec double, lineage string, committed_at string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "build_checkpoints")
    )

    # merged manifest: postings/stats here, doc stores shared from sources
    stagings = []
    for s in segments:
        for sg in s["manifest"].get("stagings") or [
            {
                "path": s["manifest"]["tables"]["staging"],
                "offsets": s["manifest"]["offsets"],
                "docbase": 0,
            }
        ]:
            stagings.append(
                {
                    "path": sg["path"],
                    "offsets": sg["offsets"],
                    "docbase": int(sg.get("docbase", 0)) + s["docbase"],
                }
            )
    manifest = {
        "format_version": 2,
        "build_id": build_id,
        "field": FIELD,
        "k1": k1,
        "b": b,
        "block_size": block_size,
        "n_buckets": n_buckets,
        "salt_target": salt_target,
        "max_doc": max_doc,
        "doc_count": doc_count,
        "sum_ttf": sum_ttf,
        "avgdl": avgdl,
        "stagings": stagings,
        "hot_terms": hot,
        "merged_from": [s["dir"] for s in segments],
        "tables": {
            "staging": stagings[0]["path"],
            "postings": os.path.join(out_dir, "postings"),
            "term_stats": os.path.join(out_dir, "term_stats"),
            "field_stats": os.path.join(out_dir, "field_stats"),
            "build_checkpoints": os.path.join(out_dir, "build_checkpoints"),
        },
        "committed_at": now,
        "merge_elapsed": round(time.time() - t0, 2),
    }
    tmp = os.path.join(out_dir, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "_manifest.json"))  # atomic publish
    return manifest
