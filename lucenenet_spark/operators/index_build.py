"""Index build pipeline: transcripts -> inverted-index tables.

Spark-first re-derivation of Lucene's ingestion lifecycle (SURVEY.md §3.3):

  Lucene                               | here
  -------------------------------------+------------------------------------------
  DocumentsWriterPerThread (DWPT)      | one range partition in mapInPandas
  DocInverter/TermsHash per-doc loop   | vectorized tokenize+count in the UDF
  FreqProxTermsWriter in-RAM postings  | staging table (doc rows + term_counts map)
  flush sort + Lucene41PostingsWriter  | repartition(term,salt)+sort+mapInPandas encode
  NormsConsumer                        | norm_byte column (byte315, numpy)
  segments_N two-phase commit          | atomic _manifest.json rename
  per-thread flush checkpointing       | per-partition checkpoint rows, lineage+rate

Pass structure — the thing that matters at 100 TB (each "pass" reads the heavy
text/term data; everything else is narrow-column or metadata-only):

  pass 1 (text):    range-partition by (conv_id, turn_idx), sort within
                    partitions (Spark external sort, spill-safe), tokenize +
                    per-doc term counts + norm bytes, write staging. Stable
                    docIDs WITHOUT a global sort: docid = offset[pid] +
                    local_rank, offsets from per-partition counts carried in
                    meta rows (driver prefix-sum over <=n_segments ints).
                    Hot-term detection rides along: each partition reports its
                    top terms by local df in its meta row — no extra pass.
  pass 2 (explode): staging -> (term, docid, tf, norm) rows, salted
                    repartition by hash(term, salt), sorted, block-encoded via
                    sliced numpy (no per-group pandas overhead), write postings.
  metadata only:    term_stats = per-term sums over postings BLOCK METADATA
                    (parquet prunes the binary payload columns); field_stats =
                    narrow agg over staging; docs "table" = column-pruned VIEW
                    of staging (no rewrite).

Skew: terms whose estimated df exceeds salt_target are split into contiguous
docid ranges (salt = docid * n_salts // max_doc), so no single encode group
exceeds ~salt_target postings regardless of term hotness; sub-lists stay
docid-sorted and block chains simply interleave by salt at query time.

Resumability: each stage is gated on its marker file (stage output is
deterministic and idempotent); re-running a build skips completed stages.
The final manifest rename is atomic — the PrepareCommit/Commit analogue
(IndexWriter.cs:3868,4092). On a real deployment the parquet writes become
Iceberg appends and the manifest an Iceberg snapshot commit; the sandbox has
no Iceberg runtime so we emulate the atomic-commit contract on parquet+rename.
"""

from __future__ import annotations

import json
import math
import os
import time
import zlib
from collections import Counter
from datetime import datetime, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.analysis import tokenize_text
from ..functions.smallfloat import encode_norm
from ..oracle import norm_cache
from .codec import BLOCK_SIZE, encode_posting_list

FIELD = "text"

STAGING_DDL = (
    "pid int, local_rank long, conv_id string, turn_idx int, role string,"
    " tool string, ts timestamp, field_length int, norm_byte short,"
    " term_counts map<string,int>, meta string"
)

POSTINGS_DDL = (
    "field string, term string, salt int, block_no int, first_docid long,"
    " last_docid long, count int, sum_tf long, max_score_bound float,"
    " docids_enc binary, tfs_enc binary, norms_enc binary, bucket int"
)

POSTINGS_COLS = [c.split()[0] for c in POSTINGS_DDL.split(",")]

DOC_COLS = ["conv_id", "turn_idx", "role", "tool", "ts", "field_length", "norm_byte"]


def term_bucket(term: str, n_buckets: int) -> int:
    """Bucket id for a term — crc32 so Python and Spark agree (F.crc32)."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def salt_expr(hot: dict[str, int], max_doc: int):
    """Salt column for skewed hot terms: contiguous docid ranges.

    salt = docid * n_salts // max_doc for terms in `hot` (term -> n_salts),
    0 otherwise — splits a hot posting list into docid-sorted sub-lists that
    parallel encode tasks handle independently."""
    hot = {t: n for t, n in hot.items() if n > 1}
    if not hot:
        return F.lit(0)
    hot_items = list(hot.items())
    terms_lit = F.array(*[F.lit(t) for t, _ in hot_items])
    salts_lit = F.array(*[F.lit(n) for _, n in hot_items])
    pos = F.array_position(terms_lit, F.col("term"))
    return F.when(
        pos > 0,
        (
            F.col("docid") * F.element_at(salts_lit, pos.cast("int")) / F.lit(max_doc)
        ).cast("int"),
    ).otherwise(F.lit(0))


def make_encode_partition(cache: np.ndarray, n_buckets: int, block: int, lineage: str):
    """Partition function: (term, salt, docid, tf, norm_byte) rows -> encoded
    posting-block rows + one checkpoint meta row. Input partitions are hash-
    partitioned on (term, salt); a single numpy lexsort finds group boundaries
    (no per-group pandas overhead). Shared by the initial build and the
    segment-merge re-encode (SegmentMerger analogue)."""

    def encode_partition(it):
        bufs: list[pd.DataFrame] = []
        for pdf in it:
            if len(pdf):
                bufs.append(pdf)
        if not bufs:
            return
        gt0 = time.time()
        pdf = pd.concat(bufs, ignore_index=True) if len(bufs) > 1 else bufs[0]
        order = np.lexsort(
            (pdf["docid"].to_numpy(), pdf["salt"].to_numpy(), pdf["term"].to_numpy())
        )
        terms = pdf["term"].to_numpy()[order]
        salts = pdf["salt"].to_numpy()[order]
        docids = pdf["docid"].to_numpy()[order]
        tfs = pdf["tf"].to_numpy(dtype=np.int64)[order]
        norms = pdf["norm_byte"].to_numpy()[order].astype(np.uint8)
        change = np.nonzero((terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1]))[0]
        bounds = np.concatenate([[0], change + 1, [len(terms)]])
        out_rows = []
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            term = terms[b0]
            rows = encode_posting_list(
                docids[b0:b1], tfs[b0:b1], norms[b0:b1], cache, block
            )
            bucket = term_bucket(term, n_buckets)
            for i, r in enumerate(rows):
                r["field"] = FIELD
                r["term"] = term
                r["salt"] = int(salts[b0])
                r["bucket"] = bucket
                r["sum_tf"] = int(
                    tfs[b0 + i * block : min(b0 + (i + 1) * block, b1)].sum()
                )
            out_rows.extend(rows)
        out = pd.DataFrame(out_rows)[POSTINGS_COLS]
        elapsed = time.time() - gt0
        yield out
        # per-partition checkpoint meta row (lineage + rate metrics)
        meta = {
            "stage": "encode",
            "postings": int(len(pdf)),
            "blocks": int(len(out)),
            "elapsed_sec": round(elapsed, 3),
            "postings_per_sec": round(len(pdf) / max(elapsed, 1e-9), 1),
            "lineage": lineage,
        }
        yield pd.DataFrame(
            [
                {
                    "field": "meta",
                    "term": json.dumps(meta),
                    "salt": -1,
                    "block_no": -1,
                    "first_docid": -1,
                    "last_docid": -1,
                    "count": 0,
                    "sum_tf": 0,
                    "max_score_bound": 0.0,
                    "docids_enc": b"",
                    "tfs_enc": b"",
                    "norms_enc": b"",
                    "bucket": -1,
                }
            ]
        )[POSTINGS_COLS]

    return encode_partition


def write_postings(encoded: DataFrame, path: str, n_buckets: int) -> None:
    """Read-optimized layout: bucket directories, term-sorted files, so a
    query prunes to |buckets(query terms)| dirs then row-group min/max."""
    (
        encoded.repartition(n_buckets, "bucket")
        .sortWithinPartitions("term", "salt", "block_no")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


class IndexBuilder:
    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        k1: float = 1.2,
        b: float = 0.75,
        n_buckets: int = 32,
        n_segments: int = 32,
        salt_target: int = 1 << 20,
        block_size: int = BLOCK_SIZE,
        top_terms_per_partition: int = 256,
    ):
        self.spark = spark
        self.out_dir = out_dir
        self.k1, self.b = k1, b
        self.n_buckets = n_buckets
        self.n_segments = n_segments
        self.salt_target = salt_target
        self.block_size = block_size
        self.top_terms = top_terms_per_partition

    # -- paths / markers -----------------------------------------------------
    def _p(self, name: str) -> str:
        return os.path.join(self.out_dir, name)

    def _stage_info(self, stage: str) -> dict | None:
        p = self._p(f"_STAGE_{stage}")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return None

    def _mark_stage(self, stage: str, info: dict) -> dict:
        tmp = self._p(f"_STAGE_{stage}.tmp")
        with open(tmp, "w") as f:
            json.dump(info, f)
        os.replace(tmp, self._p(f"_STAGE_{stage}"))
        return info

    # -- stage 1: ingest (the single text pass) ------------------------------
    def ingest(self, transcripts: DataFrame, build_id: str) -> dict:
        info = self._stage_info("staging")
        if info is not None:
            return info
        t0 = time.time()
        top_terms = self.top_terms
        input_lineage = json.dumps({"build_id": build_id, "source": "transcripts"})

        def ingest_partition(it):
            rank = 0
            pid = -1
            postings = 0
            local_df: Counter[str] = Counter()
            gt0 = time.time()
            for pdf in it:
                n = len(pdf)
                if n == 0:
                    continue
                pid = int(pdf["pid"].iloc[0])
                token_counts = []
                lengths = np.empty(n, dtype=np.int32)
                for i, text in enumerate(pdf["text"].to_numpy()):
                    toks = tokenize_text(text)
                    lengths[i] = len(toks)
                    cnt: dict[str, int] = {}
                    for t in toks:
                        cnt[t] = cnt.get(t, 0) + 1
                    token_counts.append(cnt)
                    postings += len(cnt)
                    local_df.update(cnt.keys())
                out = pd.DataFrame(
                    {
                        "pid": np.full(n, pid, dtype=np.int32),
                        "local_rank": rank + np.arange(n, dtype=np.int64),
                        "conv_id": pdf["conv_id"].to_numpy(),
                        "turn_idx": pdf["turn_idx"].to_numpy(),
                        "role": pdf["role"].to_numpy(),
                        "tool": pdf["tool"].to_numpy(),
                        "ts": pdf["ts"].to_numpy(),
                        "field_length": lengths,
                        "norm_byte": encode_norm(lengths).astype(np.int16),
                        "term_counts": token_counts,
                        "meta": None,
                    }
                )
                rank += n
                yield out
            if pid >= 0:
                elapsed = time.time() - gt0
                meta = {
                    "stage": "ingest",
                    "pid": pid,
                    "rows": rank,
                    "postings": postings,
                    "elapsed_sec": round(elapsed, 3),
                    "postings_per_sec": round(postings / max(elapsed, 1e-9), 1),
                    "top_terms": dict(
                        sorted(local_df.items(), key=lambda kv: -kv[1])[:top_terms]
                    ),
                    "lineage": input_lineage,
                }
                yield pd.DataFrame(
                    {
                        "pid": [pid],
                        "local_rank": [-1],
                        "conv_id": [None],
                        "turn_idx": [None],
                        "role": [None],
                        "tool": [None],
                        "ts": [None],
                        "field_length": [0],
                        "norm_byte": [0],
                        "term_counts": [{}],
                        "meta": [json.dumps(meta)],
                    }
                )

        staged = (
            transcripts.repartitionByRange(self.n_segments, "conv_id", "turn_idx")
            .sortWithinPartitions("conv_id", "turn_idx")
            .withColumn("pid", F.spark_partition_id())
            .select(
                "pid", "conv_id", "turn_idx", "role", "text", "tool", "ts"
            )
            .mapInPandas(ingest_partition, STAGING_DDL)
        )
        staged.write.mode("overwrite").parquet(self._p("staging"))

        # driver-side prefix sum over the tiny meta rows -> docid offsets
        metas = [
            json.loads(r["meta"])
            for r in self.spark.read.parquet(self._p("staging"))
            .filter(F.col("local_rank") == -1)
            .select("meta")
            .collect()
        ]
        counts = {m["pid"]: m["rows"] for m in metas}
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        # hot-term estimate: sum of per-partition top-term local dfs. A term
        # hot overall is hot in many partitions, so the truncated per-partition
        # sketches cover it; underestimates only delay salting, never break it.
        est_df: Counter[str] = Counter()
        for m in metas:
            est_df.update(m["top_terms"])
        hot = {
            t: int(math.ceil(df / self.salt_target))
            for t, df in est_df.items()
            if df > self.salt_target
        }
        return self._mark_stage(
            "staging",
            {
                "build_id": build_id,
                "n_docs": acc,
                "offsets": {str(k): v for k, v in offsets.items()},
                "hot_terms": hot,
                "elapsed": round(time.time() - t0, 2),
            },
        )

    # -- docid expression / docs view ----------------------------------------
    @staticmethod
    def _docid_expr(offsets: dict):
        pairs = [x for pid, off in offsets.items() for x in (F.lit(int(pid)), F.lit(off))]
        m = F.create_map(*pairs) if pairs else F.create_map()
        return (F.element_at(m, F.col("pid")) + F.col("local_rank")).alias("docid")

    def _staging_docs(self, offsets: dict) -> DataFrame:
        """docs view: column-pruned staging scan + on-the-fly docid (no rewrite)."""
        return (
            self.spark.read.parquet(self._p("staging"))
            .filter(F.col("local_rank") >= 0)
            .select(self._docid_expr(offsets), *DOC_COLS)
        )

    # -- stage 2: encode postings (the single explode shuffle) ----------------
    def encode_postings(self, build_id: str, staging_info: dict) -> dict:
        info = self._stage_info("postings")
        if info is not None:
            return info
        t0 = time.time()
        offsets = {int(k): v for k, v in staging_info["offsets"].items()}
        max_doc = int(staging_info["n_docs"])
        hot = {t: n for t, n in staging_info["hot_terms"].items() if n > 1}
        avgdl = self._avgdl_from_staging(max_doc)
        cache = norm_cache(self.k1, self.b, avgdl)
        n_buckets = self.n_buckets
        block = self.block_size
        n_shuffle = max(
            int(self.spark.conf.get("spark.sql.shuffle.partitions", "32")), 8
        )

        flat = (
            self.spark.read.parquet(self._p("staging"))
            .filter(F.col("local_rank") >= 0)
            .select(
                self._docid_expr(offsets),
                "norm_byte",
                F.explode("term_counts").alias("term", "tf"),
            )
        )
        flat = flat.withColumn("salt", salt_expr(hot, max_doc))
        lineage = json.dumps({"build_id": build_id, "stage": "encode", "max_doc": max_doc})
        encoded = flat.repartition(n_shuffle, "term", "salt").mapInPandas(
            make_encode_partition(cache, n_buckets, block, lineage), POSTINGS_DDL
        )
        write_postings(encoded, self._p("postings"), n_buckets)
        return self._mark_stage(
            "postings", {"build_id": build_id, "elapsed": round(time.time() - t0, 2)}
        )

    def _avgdl_from_staging(self, max_doc: int) -> np.float32:
        # narrow-column agg (field_length only); float math per BM25Similarity.cs:91-102
        s = (
            self.spark.read.parquet(self._p("staging"))
            .filter(F.col("local_rank") >= 0)
            .agg(F.sum("field_length").alias("s"))
            .collect()[0]["s"]
        )
        self._sum_ttf = int(s or 0)
        if self._sum_ttf <= 0:
            return np.float32(1.0)
        return np.float32(np.float64(self._sum_ttf) / np.float64(max_doc))

    # -- stage 3: metadata-only stats tables ----------------------------------
    def compute_stats(self, build_id: str, staging_info: dict) -> dict:
        info = self._stage_info("stats")
        if info is not None:
            return info
        t0 = time.time()
        max_doc = int(staging_info["n_docs"])
        # term_stats from postings block METADATA (binary cols pruned by parquet)
        postings = self.spark.read.parquet(self._p("postings")).filter(
            F.col("block_no") >= 0
        )
        (
            postings.groupBy("term")
            .agg(
                F.sum("count").alias("df"),
                F.sum("sum_tf").alias("ttf"),
                # per-term global block-max bound: lets the query planner prune
                # without any metadata-collect job (WAND upper bounds)
                F.max("max_score_bound").alias("max_bound"),
            )
            .select(F.lit(FIELD).alias("field"), "term", "df", "ttf", "max_bound")
            .repartition(max(self.n_buckets // 4, 1))
            .write.mode("overwrite")
            .parquet(self._p("term_stats"))
        )
        # field stats: narrow agg over staging
        st = (
            self.spark.read.parquet(self._p("staging"))
            .filter(F.col("local_rank") >= 0)
            .agg(
                F.count("*").alias("max_doc"),
                F.sum(F.when(F.col("field_length") > 0, 1).otherwise(0)).alias(
                    "doc_count"
                ),
                F.sum("field_length").alias("sum_ttf"),
            )
            .collect()[0]
        )
        sum_ttf = int(st["sum_ttf"] or 0)
        avgdl = (
            float(np.float32(np.float64(sum_ttf) / np.float64(max_doc)))
            if sum_ttf > 0
            else 1.0
        )
        self.spark.createDataFrame(
            [(FIELD, int(st["max_doc"]), int(st["doc_count"]), sum_ttf, avgdl)],
            "field string, max_doc long, doc_count long, sum_ttf long, avgdl double",
        ).coalesce(1).write.mode("overwrite").parquet(self._p("field_stats"))
        return self._mark_stage(
            "stats",
            {
                "build_id": build_id,
                "max_doc": int(st["max_doc"]),
                "doc_count": int(st["doc_count"]),
                "sum_ttf": sum_ttf,
                "avgdl": avgdl,
                "elapsed": round(time.time() - t0, 2),
            },
        )

    # -- stage 4: checkpoints + atomic manifest commit ------------------------
    def commit(self, build_id: str, staging_info: dict, stats_info: dict) -> dict:
        ingest_metas = [
            json.loads(r["meta"])
            for r in self.spark.read.parquet(self._p("staging"))
            .filter(F.col("local_rank") == -1)
            .select("meta")
            .collect()
        ]
        encode_metas = [
            json.loads(r["term"])
            for r in self.spark.read.parquet(self._p("postings"))
            .filter(F.col("block_no") == -1)
            .select("term")
            .collect()
        ]
        now = datetime.now(timezone.utc).isoformat()
        rows = [
            (
                build_id,
                m["stage"],
                int(m.get("pid", i)),
                "done",
                int(m["postings"]),
                float(m["postings_per_sec"]),
                m["lineage"],
                now,
            )
            for i, m in enumerate(ingest_metas + encode_metas)
        ]
        self.spark.createDataFrame(
            rows,
            "build_id string, stage string, partition_id int, status string,"
            " postings long, postings_per_sec double, lineage string, committed_at string",
        ).coalesce(1).write.mode("overwrite").parquet(self._p("build_checkpoints"))

        manifest = {
            "format_version": 2,
            "build_id": build_id,
            "field": FIELD,
            "k1": self.k1,
            "b": self.b,
            "block_size": self.block_size,
            "n_buckets": self.n_buckets,
            "salt_target": self.salt_target,
            "max_doc": stats_info["max_doc"],
            "doc_count": stats_info["doc_count"],
            "sum_ttf": stats_info["sum_ttf"],
            "avgdl": stats_info["avgdl"],
            "offsets": staging_info["offsets"],
            "stagings": [
                {
                    "path": self._p("staging"),
                    "offsets": staging_info["offsets"],
                    "docbase": 0,
                }
            ],
            "hot_terms": staging_info["hot_terms"],
            "tables": {
                "staging": self._p("staging"),
                "postings": self._p("postings"),
                "term_stats": self._p("term_stats"),
                "field_stats": self._p("field_stats"),
                "build_checkpoints": self._p("build_checkpoints"),
            },
            "committed_at": now,
        }
        tmp = self._p("_manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._p("_manifest.json"))  # atomic publish (Commit)
        return manifest

    def build(self, transcripts: DataFrame, build_id: str = "build-0") -> dict:
        """Full build: ingest -> encode -> stats -> commit. Idempotent/resumable:
        completed stages (marker files) are skipped on re-run."""
        os.makedirs(self.out_dir, exist_ok=True)
        staging_info = self.ingest(transcripts, build_id)
        self.encode_postings(build_id, staging_info)
        stats_info = self.compute_stats(build_id, staging_info)
        return self.commit(build_id, staging_info, stats_info)


def load_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "_manifest.json")) as f:
        return json.load(f)


def docs_view(spark: SparkSession, manifest: dict) -> DataFrame:
    """The docs 'table': column-pruned staging scan(s) + on-the-fly stable docid.

    A merged index references the staging tables of its source segments (each
    with a docbase) instead of rewriting the heavy text data — the stored-
    fields analogue of Lucene's merge keeping doc data per segment file."""
    stagings = manifest.get("stagings") or [
        {"path": manifest["tables"]["staging"], "offsets": manifest["offsets"], "docbase": 0}
    ]
    out = None
    for sg in stagings:
        offsets = {int(k): v + int(sg.get("docbase", 0)) for k, v in sg["offsets"].items()}
        pairs = [x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
        m = F.create_map(*pairs) if pairs else F.create_map()
        df = (
            spark.read.parquet(sg["path"])
            .filter(F.col("local_rank") >= 0)
            .select(
                (F.element_at(m, F.col("pid")) + F.col("local_rank")).alias("docid"),
                *DOC_COLS,
            )
        )
        out = df if out is None else out.unionByName(df)
    return out
