"""Index build pipeline: transcripts -> inverted-index tables.

Spark-first re-derivation of Lucene's ingestion lifecycle (SURVEY.md §3.3):

  Lucene                               | here
  -------------------------------------+------------------------------------------
  DocumentsWriterPerThread (DWPT)      | one segment group in applyInPandas
  DocInverter/TermsHash per-doc loop   | vectorized tokenize+Counter in the UDF
  FreqProxTermsWriter in-RAM postings  | staging table (docid, term_counts map)
  flush sort + Lucene41PostingsWriter  | groupBy(term,salt).applyInPandas(encode)
  NormsConsumer                        | norm_byte column (byte315, numpy)
  segments_N two-phase commit          | atomic _manifest.json rename
  per-thread flush checkpointing       | per-task checkpoint rows with lineage+rate

Scale design decisions (the 100 TB story):
- docIDs: dense rank over (conv_id, turn_idx) assigned with a two-pass
  prefix-sum (per-segment counts -> driver cumsum -> offset + local rank).
  No global window/sort; the only driver-side data is one count per segment.
- one tokenize pass: token counts per doc are computed inside the ingest UDF
  (map<term,tf>), so term-frequency aggregation never shuffles raw tokens;
  the explode ships (term, docid, tf) triples already combined per doc.
- skew: terms with df > salt_target are salted into contiguous docid ranges
  (salt = docid*n_salts//max_doc), so no single applyInPandas group exceeds
  ~salt_target postings regardless of term hotness. AQE skew-join stays on
  as a backstop.
- layout: encoded blocks are repartitioned by bucket = crc32(term)%n_buckets,
  sorted by (term, salt, block_no) inside each bucket file, and written
  partitionBy(bucket): a query for terms T prunes to |buckets(T)| directories
  and row-group term min/max stats prune within files — the columnar analogue
  of the block-tree terms dict + skip list.
- resumability: each stage is gated on its output manifest; re-running a
  build with the same build_id skips completed stages. Final manifest rename
  is atomic (PrepareCommit/Commit analogue, IndexWriter.cs:3868,4092).

On a real deployment the parquet writes become Iceberg `writeTo(...).append()`
with the manifest replaced by Iceberg's snapshot commit; the sandbox has no
Iceberg runtime so we emulate the atomic-commit contract on parquet + rename.
"""

from __future__ import annotations

import json
import math
import os
import time
import zlib
from datetime import datetime, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions.analysis import tokenize_text
from ..functions.smallfloat import encode_norm
from ..oracle import norm_cache
from .codec import BLOCK_SIZE, encode_posting_list

FIELD = "text"

STAGING_SCHEMA = StructType(
    [
        StructField("seg", IntegerType()),
        StructField("docid", LongType()),
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
        StructField("field_length", IntegerType()),
        StructField("norm_byte", ShortType()),
        StructField("term_counts", MapType(StringType(), IntegerType())),
        StructField("meta", StringType()),
    ]
)

POSTINGS_SCHEMA = StructType(
    [
        StructField("field", StringType()),
        StructField("term", StringType()),
        StructField("salt", IntegerType()),
        StructField("block_no", IntegerType()),
        StructField("first_docid", LongType()),
        StructField("last_docid", LongType()),
        StructField("count", IntegerType()),
        StructField("sum_tf", LongType()),
        StructField("max_score_bound", FloatType()),
        StructField("docids_enc", BinaryType()),
        StructField("tfs_enc", BinaryType()),
        StructField("norms_enc", BinaryType()),
        StructField("bucket", IntegerType()),
    ]
)


def term_bucket(term: str, n_buckets: int) -> int:
    """Bucket id for a term — crc32 so Python and Spark agree (F.crc32)."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def _seg_expr(boundaries: list[str]):
    """Segment id via binary search over broadcast conv_id split points."""
    b = boundaries

    def assign(s: pd.Series) -> pd.Series:
        return pd.Series(np.searchsorted(b, s.fillna("").to_numpy(), side="right"), index=s.index).astype("int32")

    return F.pandas_udf(assign, IntegerType())


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
    ):
        self.spark = spark
        self.out_dir = out_dir
        self.k1, self.b = k1, b
        self.n_buckets = n_buckets
        self.n_segments = n_segments
        self.salt_target = salt_target
        self.block_size = block_size

    # -- paths ---------------------------------------------------------------
    def _p(self, name: str) -> str:
        return os.path.join(self.out_dir, name)

    def _stage_done(self, stage: str) -> bool:
        return os.path.exists(self._p(f"_STAGE_{stage}"))

    def _mark_stage(self, stage: str, info: dict):
        with open(self._p(f"_STAGE_{stage}"), "w") as f:
            json.dump(info, f)

    # -- stage 1: ingest ------------------------------------------------------
    def _conv_boundaries(self, df: DataFrame) -> list[str]:
        """S-1 sorted conv_id split points from a bounded sample (driver-tiny)."""
        sample = (
            df.select("conv_id")
            .distinct()
            .sample(fraction=1.0, seed=42)  # at real scale: small fraction
            .limit(100_000)
            .toPandas()["conv_id"]
            .sort_values()
            .to_numpy()
        )
        if len(sample) <= self.n_segments:
            return sorted(set(sample[:-1].tolist()))
        idx = np.linspace(0, len(sample) - 1, self.n_segments + 1).astype(int)[1:-1]
        return sorted(set(sample[idx].tolist()))

    def ingest(self, transcripts: DataFrame, build_id: str) -> None:
        """Stage 1: tokenize + per-doc term counts + stable docid assignment.

        Two passes over the (narrow) keys for the prefix sum, one pass over
        text. Per-task metrics ride along as meta rows (docid = -1).
        """
        if self._stage_done("staging"):
            return
        t0 = time.time()
        boundaries = self._conv_boundaries(transcripts)
        seg_col = _seg_expr(boundaries)(F.col("conv_id")).alias("seg")
        with_seg = transcripts.select(seg_col, "*")

        # pass 1: per-segment counts -> docid offsets (driver cumsum, tiny)
        counts = {r["seg"]: r["cnt"] for r in with_seg.groupBy("seg").agg(F.count("*").alias("cnt")).collect()}
        offsets = {}
        acc = 0
        for s in sorted(counts):
            offsets[s] = acc
            acc += counts[s]
        n_docs = acc

        k1, b = self.k1, self.b
        block = self.block_size
        input_lineage = json.dumps(
            {"build_id": build_id, "n_docs": n_docs, "n_segments": len(counts), "boundaries_hash": zlib.crc32(json.dumps(boundaries).encode()) & 0xFFFFFFFF}
        )

        def ingest_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
            gt0 = time.time()
            seg = int(key[0])
            pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
            n = len(pdf)
            docids = offsets[seg] + np.arange(n, dtype=np.int64)
            token_counts = []
            lengths = np.empty(n, dtype=np.int32)
            for i, text in enumerate(pdf["text"].to_numpy()):
                toks = tokenize_text(text)
                lengths[i] = len(toks)
                cnt: dict[str, int] = {}
                for t in toks:
                    cnt[t] = cnt.get(t, 0) + 1
                token_counts.append(cnt)
            norm_bytes = encode_norm(lengths).astype(np.int16)
            out = pd.DataFrame(
                {
                    "seg": np.full(n, seg, dtype=np.int32),
                    "docid": docids,
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"].astype("int32"),
                    "role": pdf["role"],
                    "tool": pdf["tool"],
                    "ts": pdf["ts"],
                    "field_length": lengths,
                    "norm_byte": norm_bytes,
                    "term_counts": token_counts,
                    "meta": None,
                }
            )
            elapsed = time.time() - gt0
            postings = int(sum(len(c) for c in token_counts))
            meta_row = out.iloc[:1].copy()
            meta_row["docid"] = -1
            meta_row["term_counts"] = [{}]
            meta_row["meta"] = json.dumps(
                {
                    "stage": "ingest",
                    "seg": seg,
                    "rows": n,
                    "postings": postings,
                    "elapsed_sec": round(elapsed, 3),
                    "postings_per_sec": round(postings / max(elapsed, 1e-9), 1),
                    "lineage": input_lineage,
                }
            )
            return pd.concat([out, meta_row], ignore_index=True) if n else meta_row

        staged = with_seg.groupBy("seg").applyInPandas(ingest_group, STAGING_SCHEMA)
        staged.write.mode("overwrite").parquet(self._p("staging"))
        self._mark_stage("staging", {"n_docs": n_docs, "elapsed": time.time() - t0, "build_id": build_id})

    # -- stage 2: stats -------------------------------------------------------
    def compute_stats(self, build_id: str) -> dict:
        staging = self.spark.read.parquet(self._p("staging")).filter(F.col("docid") >= 0)
        if not self._stage_done("stats"):
            t0 = time.time()
            fs = staging.agg(
                F.count("*").alias("max_doc"),
                F.sum(F.when(F.col("field_length") > 0, 1).otherwise(0)).alias("doc_count"),
                F.sum("field_length").alias("sum_ttf"),
            ).collect()[0]
            field_stats = self.spark.createDataFrame(
                [(FIELD, fs["max_doc"], int(fs["doc_count"]), int(fs["sum_ttf"]),
                  float(np.float32(np.float64(fs["sum_ttf"]) / np.float64(fs["max_doc"])) if fs["sum_ttf"] and fs["sum_ttf"] > 0 else 1.0))],
                "field string, max_doc long, doc_count long, sum_ttf long, avgdl double",
            )
            field_stats.write.mode("overwrite").parquet(self._p("field_stats"))

            # docs table (docvalues + stored-field pointer side), range-laid-out by docid
            docs = staging.drop("term_counts", "meta")
            docs.repartitionByRange(max(self.n_segments // 2, 1), "docid").sortWithinPartitions("docid").write.mode(
                "overwrite"
            ).parquet(self._p("docs"))

            # term_stats: df + ttf per term (map-side combined hash agg)
            flat = staging.select("docid", F.explode("term_counts").alias("term", "tf"))
            ts = flat.groupBy("term").agg(F.count("*").alias("df"), F.sum("tf").alias("ttf"))
            ts.select(F.lit(FIELD).alias("field"), "term", "df", "ttf").repartition(8).write.mode("overwrite").parquet(
                self._p("term_stats")
            )
            self._mark_stage("stats", {"elapsed": time.time() - t0, "build_id": build_id})
        row = self.spark.read.parquet(self._p("field_stats")).collect()[0]
        return row.asDict()

    # -- stage 3: encode postings --------------------------------------------
    def encode_postings(self, build_id: str, field_stats: dict) -> None:
        if self._stage_done("postings"):
            return
        t0 = time.time()
        max_doc = int(field_stats["max_doc"])
        avgdl = np.float32(field_stats["avgdl"])
        cache = norm_cache(self.k1, self.b, avgdl)
        salt_target = self.salt_target
        n_buckets = self.n_buckets
        block = self.block_size

        ts = self.spark.read.parquet(self._p("term_stats"))
        hot = {
            r["term"]: int(math.ceil(r["df"] / salt_target))
            for r in ts.filter(F.col("df") > salt_target).collect()
        }  # hot-term map is tiny (few terms can exceed salt_target)

        staging = self.spark.read.parquet(self._p("staging")).filter(F.col("docid") >= 0)
        flat = staging.select(
            "docid", F.col("norm_byte"), F.explode("term_counts").alias("term", "tf")
        )

        if hot:
            def salt_of(term: pd.Series, docid: pd.Series) -> pd.Series:
                ns = term.map(lambda t: hot.get(t, 1)).to_numpy(dtype=np.int64)
                return pd.Series((docid.to_numpy(dtype=np.int64) * ns // max(max_doc, 1)).astype("int32"), index=term.index)

            salt_udf = F.pandas_udf(salt_of, IntegerType())
            flat = flat.withColumn("salt", salt_udf(F.col("term"), F.col("docid")))
        else:
            flat = flat.withColumn("salt", F.lit(0))

        def encode_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
            term, salt = key[0], int(key[1])
            order = np.argsort(pdf["docid"].to_numpy(), kind="mergesort")
            docids = pdf["docid"].to_numpy()[order]
            tfs = pdf["tf"].to_numpy(dtype=np.int64)[order]
            nbytes = pdf["norm_byte"].to_numpy(dtype=np.uint8)[order]
            rows = encode_posting_list(docids, tfs, nbytes, cache, block)
            out = pd.DataFrame(rows)
            out["sum_tf"] = [int(tfs[i * block : (i + 1) * block].sum()) for i in range(len(rows))]
            out["field"] = FIELD
            out["term"] = term
            out["salt"] = salt
            out["bucket"] = term_bucket(term, n_buckets)
            return out[[f.name for f in POSTINGS_SCHEMA.fields]]

        encoded = flat.groupBy("term", "salt").applyInPandas(encode_group, POSTINGS_SCHEMA)
        # read-optimized layout: one sorted file per bucket directory
        (
            encoded.repartition(n_buckets, "bucket")
            .sortWithinPartitions("term", "salt", "block_no")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(self._p("postings"))
        )
        self._mark_stage("postings", {"elapsed": time.time() - t0, "build_id": build_id})

    # -- stage 4: checkpoints + manifest ---------------------------------------
    def commit(self, build_id: str, field_stats: dict) -> dict:
        ckpt = (
            self.spark.read.parquet(self._p("staging"))
            .filter(F.col("docid") == -1)
            .select("meta")
            .collect()
        )
        checkpoints = [json.loads(r["meta"]) for r in ckpt]
        cp_df = self.spark.createDataFrame(
            [
                (
                    build_id,
                    c["stage"],
                    int(c["seg"]),
                    "done",
                    int(c["postings"]),
                    float(c["postings_per_sec"]),
                    c["lineage"],
                    datetime.now(timezone.utc).isoformat(),
                )
                for c in checkpoints
            ],
            "build_id string, stage string, partition_id int, status string, postings long, postings_per_sec double, lineage string, committed_at string",
        )
        cp_df.coalesce(1).write.mode("overwrite").parquet(self._p("build_checkpoints"))

        manifest = {
            "format_version": 1,
            "build_id": build_id,
            "field": FIELD,
            "k1": self.k1,
            "b": self.b,
            "block_size": self.block_size,
            "n_buckets": self.n_buckets,
            "salt_target": self.salt_target,
            "max_doc": int(field_stats["max_doc"]),
            "doc_count": int(field_stats["doc_count"]),
            "sum_ttf": int(field_stats["sum_ttf"]),
            "avgdl": float(field_stats["avgdl"]),
            "tables": {
                t: self._p(t)
                for t in ["docs", "postings", "term_stats", "field_stats", "build_checkpoints"]
            },
            "committed_at": datetime.now(timezone.utc).isoformat(),
        }
        tmp = self._p("_manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._p("_manifest.json"))  # atomic publish (Commit)
        return manifest

    def build(self, transcripts: DataFrame, build_id: str = "build-0") -> dict:
        """Full build: ingest -> stats -> encode -> commit. Idempotent/resumable:
        completed stages (marker files) are skipped on re-run."""
        os.makedirs(self.out_dir, exist_ok=True)
        self.ingest(transcripts, build_id)
        field_stats = self.compute_stats(build_id)
        self.encode_postings(build_id, field_stats)
        return self.commit(build_id, field_stats)


def load_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "_manifest.json")) as f:
        return json.load(f)
