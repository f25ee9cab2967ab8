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
    PARTIALS_DDL,
    POSTINGS_DDL,
    load_manifest,
    make_merge_encode,
    split_salts,
    write_postings,
)


def _merged_numeric_fields(segments) -> list[str]:
    """Numeric doc-value columns of the merged index. Like the analyzer,
    the numeric field set is an IndexWriter-level invariant: segments of
    one index always agree, so a mismatch is a caller error, not a merge
    case (FieldInfos dv-type consistency checks raise the same way)."""
    sets = {tuple(s["manifest"].get("numeric_fields") or []) for s in segments}
    if len(sets) > 1:
        raise ValueError(
            f"cannot merge segments with different numeric fields: {sorted(sets)}"
        )
    return list(sets.pop())


def _remap(docids: np.ndarray, deleted: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """DocMap (MergeState.cs:40-102): keep-mask + renumbered ids.

    new_id = old_id - #deleted_below; deleted ids are dropped. `deleted` is
    the broadcast sorted global delete set (the liveDocs bitset analogue)."""
    below = np.searchsorted(deleted, docids, side="left")
    at = np.searchsorted(deleted, docids, side="right")
    keep = below == at  # not present in the deleted set
    return keep, docids - below


def _decoded_partials(
    spark: SparkSession,
    segments: list[dict],
    deleted: np.ndarray,
    hot: dict,
    max_doc: int,
) -> DataFrame:
    """Union of all segments' postings decoded to compact PARTIALS rows (one
    per block, split at new salt boundaries) with docids shifted to the global
    space and deletes applied/renumbered. Block granularity keeps the merge
    shuffle at ~postings/128 rows."""

    def decode_partition(it):
        from .codec import (
            decode_block,
            decode_offsets,
            decode_payloads,
            decode_positions,
        )

        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                docids, tfs = decode_block(
                    r.docids_enc, r.tfs_enc, r.first_docid, r.count
                )
                docids = docids + r.docbase
                norms = np.frombuffer(r.norms_enc, dtype=np.uint8)
                n_pos = int(tfs.sum())
                poss = decode_positions(r.pos_enc, n_pos).astype(np.int32)
                if r.off_enc:
                    st_, en_ = decode_offsets(r.off_enc, n_pos)
                    offs = np.empty(2 * n_pos, dtype=np.int32)
                    offs[0::2] = st_
                    offs[1::2] = en_ - st_
                else:
                    offs = np.empty(0, dtype=np.int32)
                if r.pay_enc:
                    pay_lens, pay_buf = decode_payloads(r.pay_enc, n_pos)
                    pay_lens = pay_lens.astype(np.int32)
                else:
                    pay_lens, pay_buf = np.empty(0, dtype=np.int32), b""
                cum = np.concatenate([[0], np.cumsum(tfs)])
                if deleted.size:
                    keep, docids = _remap(docids, deleted)
                    if not keep.all():
                        # drop the deleted postings' position runs too
                        pos_keep = np.repeat(keep, tfs)
                        poss = poss[pos_keep]
                        if len(offs):
                            offs = offs.reshape(-1, 2)[pos_keep].reshape(-1)
                        if len(pay_lens):
                            byte_keep = np.repeat(pos_keep, pay_lens)
                            pay_buf = (
                                np.frombuffer(pay_buf, dtype=np.uint8)[byte_keep]
                                .tobytes()
                            )
                            pay_lens = pay_lens[pos_keep]
                    docids, tfs, norms = docids[keep], tfs[keep], norms[keep]
                    cum = np.concatenate([[0], np.cumsum(tfs)])
                if not len(docids):
                    continue
                pay_cum = (
                    np.concatenate([[0], np.cumsum(pay_lens.astype(np.int64))])
                    if len(pay_lens)
                    else None
                )
                hkey = r.field + "\x1f" + r.term
                for salt, b0, b1 in split_salts(
                    docids, hot.get(hkey, 1), max_doc
                ):
                    rows.append(
                        (
                            r.field,
                            r.term,
                            salt,
                            int(b1 - b0),
                            int(docids[b0]),
                            docids[b0:b1].tobytes(),
                            tfs[b0:b1].astype(np.int32).tobytes(),
                            norms[b0:b1].tobytes(),
                            poss[cum[b0] : cum[b1]].tobytes(),
                            offs[2 * cum[b0] : 2 * cum[b1]].tobytes()
                            if len(offs)
                            else b"",
                            pay_lens[cum[b0] : cum[b1]].tobytes()
                            if pay_cum is not None
                            else b"",
                            pay_buf[int(pay_cum[cum[b0]]) : int(pay_cum[cum[b1]])]
                            if pay_cum is not None
                            else b"",
                            -1,  # ids already global (offset_map unused)
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "field", "term", "salt", "count", "first_docid", "docids",
                    "tfs", "norms", "poss", "offs", "pay_lens", "pays", "pid",
                ],
            )

    out = None
    for s in segments:
        df = (
            spark.read.parquet(s["manifest"]["tables"]["postings"])
            .filter(F.col("block_no") >= 0)
            .withColumn("docbase", F.lit(s["docbase"]))
            .select(
                "field", "term", "first_docid", "count", "docids_enc",
                "tfs_enc", "norms_enc", "pos_enc", "off_enc", "pay_enc",
                "docbase",
            )
            .mapInPandas(decode_partition, PARTIALS_DDL)
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

    # gather per-segment delete logs -> one sorted global delete set
    from .deletes import DeleteLog

    del_parts = []
    for s in segments:
        arr = DeleteLog(spark, s["dir"]).deleted_array()
        if arr.size:
            del_parts.append(arr + s["docbase"])
    deleted = (
        np.unique(np.concatenate(del_parts)) if del_parts else np.empty(0, np.int64)
    )

    docs_union = None
    if deleted.size:
        # rewrite docs with MergeState.DocMap renumbering (docid - #deleted
        # below); postings get the same remap during decode
        from .index_build import DOC_COLS, docs_view

        num_fields = _merged_numeric_fields(segments)
        for s in segments:
            df = docs_view(spark, s["manifest"])
            if s["docbase"]:
                df = df.withColumn("docid", F.col("docid") + F.lit(s["docbase"]))
            docs_union = df if docs_union is None else docs_union.unionByName(df)
        def remap_docid(ser: pd.Series) -> pd.Series:
            ids = ser.to_numpy(dtype=np.int64)
            keep, new = _remap(ids, deleted)
            out = new.astype("float64")
            out[~keep] = np.nan  # dropped below
            return pd.Series(out, index=ser.index)

        docs_union = (
            docs_union.withColumn(
                "new_docid", F.pandas_udf(remap_docid, "double")(F.col("docid"))
            )
            .filter(F.col("new_docid").isNotNull())
            .select(
                F.col("new_docid").cast("long").alias("docid"),
                *DOC_COLS,
                *num_fields,
            )
        )
        import os as _os

        docs_path = _os.path.join(out_dir, "docs")
        n_ranges = max(len(segments), 2)
        docs_union.repartitionByRange(n_ranges, "docid").sortWithinPartitions(
            "docid"
        ).write.mode("overwrite").parquet(docs_path)
        docs_tbl = spark.read.parquet(docs_path)
        st = docs_tbl.agg(
            F.count("*").alias("max_doc"),
            F.sum(F.when(F.col("field_length") > 0, 1).otherwise(0)).alias("dc"),
            F.sum("field_length").alias("st"),
        ).collect()[0]
        max_doc = int(st["max_doc"])
        doc_count = int(st["dc"])
        sum_ttf = int(st["st"] or 0)
    else:
        max_doc = docbase
        sum_ttf = sum(int(s["manifest"]["sum_ttf"]) for s in segments)
        doc_count = sum(int(s["manifest"]["doc_count"]) for s in segments)

    avgdl = (
        float(np.float32(np.float64(sum_ttf) / np.float64(max_doc)))
        if sum_ttf > 0
        else 1.0
    )

    # per-field stats: text recomputed above; keyword (omitNorms) fields
    # summed from the source manifests, or recounted from the rewritten docs
    # table when a delete-merge renumbered
    from .index_build import FIELD, omit_norms_cache

    kw_fields: list[str] = []
    for s in segments:
        for f, info in (s["manifest"].get("fields") or {}).items():
            if info.get("omit_norms") and f not in kw_fields:
                kw_fields.append(f)
    fields = {
        FIELD: {
            "doc_count": doc_count,
            "sum_ttf": sum_ttf,
            "avgdl": avgdl,
            "omit_norms": False,
        }
    }
    if deleted.size:
        for f in kw_fields:
            cnt = int(
                docs_tbl.filter(
                    F.col(f).isNotNull() & (F.col(f) != "")
                ).count()
            )
            fields[f] = {
                "doc_count": cnt, "sum_ttf": cnt, "avgdl": 1.0, "omit_norms": True,
            }
    else:
        for f in kw_fields:
            s_cnt = sum(
                int((s["manifest"].get("fields") or {}).get(f, {}).get("doc_count", 0))
                for s in segments
            )
            fields[f] = {
                "doc_count": s_cnt, "sum_ttf": s_cnt, "avgdl": 1.0, "omit_norms": True,
            }
    caches = {FIELD: norm_cache(k1, b, np.float32(avgdl))}
    kwc = omit_norms_cache(k1)
    for f in kw_fields:
        caches[f] = kwc

    # exact merged df from the per-segment terms dictionaries -> salt plan
    from .index_build import term_stats_view

    ts = None
    for s in segments:
        df = term_stats_view(spark, s["manifest"]["tables"]["postings"])
        ts = df if ts is None else ts.unionByName(df)
    hot_rows = (
        ts.groupBy("field", "term").agg(F.sum("df").alias("df"))
        .filter(F.col("df") > salt_target)
        .collect()
    )
    hot = {
        r["field"] + "\x1f" + r["term"]: int(math.ceil(r["df"] / salt_target))
        for r in hot_rows
    }

    n_shuffle = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 8)
    lineage = json.dumps(
        {
            "build_id": build_id,
            "stage": "merge",
            "sources": [s["dir"] for s in segments],
            "docbases": [s["docbase"] for s in segments],
        }
    )
    partials = _decoded_partials(spark, segments, deleted, hot, max_doc)
    encoded = partials.repartition(n_shuffle, "field", "term", "salt").mapInPandas(
        make_merge_encode(caches, n_buckets, block_size, lineage), POSTINGS_DDL
    )
    write_postings(encoded, os.path.join(out_dir, "postings"), n_buckets)

    # terms dictionary is embedded in the postings write (block_no = -2 rows)
    from .index_build import local_table

    local_table(
        spark,
        [
            (f, max_doc, info["doc_count"], info["sum_ttf"], info["avgdl"])
            for f, info in fields.items()
        ],
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
    local_table(
        spark,
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

    # merged manifest: postings/stats here; doc stores shared from sources
    # unless deletes forced a renumbering rewrite (docs_table)
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
    # merged payload richness = the weakest source level (a segment without
    # positions/offsets cannot supply them, FieldInfos merge semantics)
    _LEVELS = ["docs_freqs", "docs_freqs_positions", "docs_freqs_positions_offsets"]
    index_options = _LEVELS[
        min(
            _LEVELS.index(
                s["manifest"].get("index_options", "docs_freqs_positions")
            )
            for s in segments
        )
    ]
    # payloads survive the merge only if EVERY source carries the same
    # provider (FieldInfos merge: a payload-less segment poisons the field)
    providers = {s["manifest"].get("payload_provider") for s in segments}
    payload_provider = providers.pop() if len(providers) == 1 else None
    analyzers = {s["manifest"].get("analyzer", "standard") for s in segments}
    if len(analyzers) > 1:
        # segments analyzed with different chains index different term
        # spaces; a merged index would silently mix them (Lucene cannot
        # produce this state: the analyzer is fixed at IndexWriter level)
        raise ValueError(
            f"cannot merge segments with different analyzers: {sorted(analyzers)}"
        )
    analyzer = analyzers.pop()
    manifest = {
        "format_version": 5,
        "build_id": build_id,
        "field": FIELD,
        "index_options": index_options,
        "payload_provider": payload_provider,
        "analyzer": analyzer,
        "numeric_fields": _merged_numeric_fields(segments),
        "fields": fields,
        "k1": k1,
        "b": b,
        "block_size": block_size,
        "n_buckets": n_buckets,
        "salt_target": salt_target,
        "max_doc": max_doc,
        "doc_count": doc_count,
        "sum_ttf": sum_ttf,
        "avgdl": avgdl,
        "stagings": None if deleted.size else stagings,
        "docs_table": os.path.join(out_dir, "docs") if deleted.size else None,
        "n_deletes_applied": int(deleted.size),
        "hot_terms": hot,
        "merged_from": [s["dir"] for s in segments],
        "tables": {
            "staging": stagings[0]["path"],
            "postings": os.path.join(out_dir, "postings"),
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
