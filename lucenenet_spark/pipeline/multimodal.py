"""Multimodal columns: opaque binary payloads + typed metadata + feature
extraction over Arrow batches.

The pattern a 100 TB multimodal training pipeline needs from Spark:
  - media as `binary` columns co-resident with typed metadata columns
    (media_type, n_bytes), partition-pruned by the metadata;
  - decode / feature-extraction as `mapInPandas` over Arrow RecordBatches:
    executors stream batches, the UDF sees zero-copy bytes, output is a
    typed row per media item;
  - real codecs behind an import-guard — pillow/torchaudio/av are not in
    this container, so `decode_media` raises NotImplementedError for real
    formats and a DETERMINISTIC FAKE format ("SMF1") exercises the whole
    plumbing (schema, batch shape, partitioning) in tests and the gate.

Fake format SMF1 (Synthetic Media Format): magic b"SMF1" + 1 byte media
kind + 2 bytes width + 2 bytes height + 1 byte fps + payload. Generated
deterministically from a document's content hash.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KINDS = ["image", "audio", "video"]

try:  # real decoders, absent in this environment
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def synth_media(content_key: bytes, kind_idx: int) -> bytes:
    """Deterministic SMF1 payload derived from a content key."""
    h = hashlib.md5(content_key).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    fps = 1 + h[2] % 30
    payload = (h * ((width * height) // 16 + 1))[: width * height]
    return (
        b"SMF1"
        + bytes([kind_idx])
        + width.to_bytes(2, "big")
        + height.to_bytes(2, "big")
        + bytes([fps])
        + payload
    )


def attach_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Add (media binary, media_type string) columns — the table shape a
    multimodal corpus has; payloads are deterministic SMF1."""

    def gen(it):
        for pdf in it:
            kinds, blobs = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                ki = int(did) % len(KINDS)
                kinds.append(KINDS[ki])
                key = "" if pd.isna(text) else str(text)
                blobs.append(synth_media(key.encode(), ki))
            out = pdf[[id_col]].copy()
            out["media_type"] = kinds
            out["media"] = blobs
            yield out

    return df.select(id_col, text_col).mapInPandas(
        gen, f"{id_col} long, media_type string, media binary"
    )


def decode_media(blob: bytes) -> dict:
    """Parse one media payload. SMF1 is decoded for real; genuine formats
    need codec libraries that are stubbed out in this container."""
    if blob[:4] == b"SMF1":
        kind = KINDS[blob[4]]
        width = int.from_bytes(blob[5:7], "big")
        height = int.from_bytes(blob[7:9], "big")
        fps = blob[9]
        payload = blob[10:]
        return {
            "kind": kind,
            "width": width,
            "height": height,
            "n_frames": fps if kind == "video" else 1,
            "n_bytes": len(blob),
            "mean_intensity": float(np.frombuffer(payload, dtype=np.uint8).mean())
            if payload
            else 0.0,
        }
    if not HAVE_PIL:
        raise NotImplementedError(
            "real media decoding requires pillow/av/torchaudio (not installed); "
            "only the SMF1 synthetic format is decodable here"
        )
    raise NotImplementedError("unsupported media format")


def media_features(df: DataFrame, media_col: str = "media", id_col: str = "doc_id") -> DataFrame:
    """Feature extraction over Arrow batches: one typed row per media item.

    This is the real plumbing a decode/resize/frame-sample stage uses —
    swap `decode_media` for a codec call and nothing else changes."""

    def extract(it):
        for pdf in it:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[media_col]):
                m = decode_media(bytes(blob))
                rows.append(
                    (
                        int(did), m["kind"], m["width"], m["height"],
                        m["n_frames"], m["n_bytes"], round(m["mean_intensity"], 4),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "kind", "width", "height", "n_frames", "n_bytes",
                    "mean_intensity",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        extract,
        f"{id_col} long, kind string, width int, height int, n_frames int,"
        " n_bytes long, mean_intensity double",
    )


def media_features_sql(table: str = "documents", text: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB oracle for attach_media + media_features: every feature is a
    pure function of md5(text) and doc_id (the SMF1 payload is the 16-byte
    digest tiled to width*height bytes), so the whole extraction is
    re-expressible in SQL: b[i] = digest byte i, width/height/fps from
    b[0..2], mean over the tiled payload = (full_reps*sum(b) +
    sum(prefix)) / n computed exactly in integers then divided."""
    digest = f"md5(COALESCE({text}, ''))"
    b = (
        f"list_transform(generate_series(1, 16), "
        f"i -> CAST('0x' || substring({digest}, 2*i - 1, 2) AS INT))"
    )
    return f"""WITH feat AS (
  SELECT {id_col},
         CASE CAST({id_col} % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         {b} AS b
  FROM {table}
),
dims AS (
  SELECT {id_col}, kind,
         16 + b[1] % 240 AS width,
         16 + b[2] % 240 AS height,
         1 + b[3] % 30 AS fps,
         list_sum(b) AS bsum, b
  FROM feat
)
SELECT {id_col}, kind, width, height,
       CASE WHEN kind = 'video' THEN fps ELSE 1 END AS n_frames,
       CAST(10 + width * height AS BIGINT) AS n_bytes,
       round(CAST((width * height // 16) * bsum
                  + COALESCE(list_sum(list_slice(b, 1, width * height % 16)), 0)
             AS DOUBLE) / (width * height), 4) AS mean_intensity
FROM dims"""


def frame_sample(df: DataFrame, every_n: int = 5, media_col: str = "media", id_col: str = "doc_id") -> DataFrame:
    """Video frame sampling shape: one output row per sampled frame with a
    deterministic frame payload slice (real pipelines emit decoded tensors)."""

    def sample(it):
        for pdf in it:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[media_col]):
                m = decode_media(bytes(blob))
                if m["kind"] != "video":
                    continue
                for f in range(0, m["n_frames"], every_n):
                    rows.append((int(did), f, m["width"], m["height"]))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "width", "height"]
            )

    return df.select(id_col, media_col).mapInPandas(
        sample, f"{id_col} long, frame_idx int, width int, height int"
    )
