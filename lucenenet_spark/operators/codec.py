"""Posting-block codec: delta + fixed-width bit-packed (FOR) blocks, numpy.

Re-derivation of the *capability* of Lucene41's postings format
(src/Lucene.Net/Codecs/Lucene41/Lucene41PostingsWriter.cs:283-354 — 128-int
FOR-packed blocks of docID deltas and term frequencies; ForUtil.cs:33-124 —
per-block bit width) re-designed for columnar storage: each 128-posting block
is one parquet row carrying two binary payloads plus skip/block-max metadata
columns. The multi-level skip list (Lucene41SkipWriter.cs:28-75) collapses to
the flat metadata columns (first_docid/last_docid/max_score_bound) which a
columnar scan prunes directly — Spark's analogue of Advance().

Wire format per payload:  [width:1 byte][bit-packed big-endian values]
  width == 0 encodes an all-equal block: the single value follows as 8-byte
  big-endian (Lucene's all-equal optimization, Lucene41PostingsFormat.cs:38-40).
docids payload packs deltas: docid[0] - first_docid (==0, elided is NOT done:
we pack deltas[i] = docid[i] - docid[i-1] for i>=1, n-1 values), tfs payload
packs raw tf values (n values). Norm bytes ride along raw (1 byte/posting) so
scoring never joins back to a norms table.

All encode/decode is vectorized numpy — this code runs inside Arrow-batched
UDFs on executors; there is no per-row Python.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # Lucene41PostingsFormat.cs:375


def _pack(values: np.ndarray) -> bytes:
    """Fixed-width bit-pack non-negative int64 values (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return bytes([0]) + (0).to_bytes(8, "big")
    mx = int(v.max())
    if int(v.min()) == mx:
        return bytes([0]) + mx.to_bytes(8, "big")
    width = max(1, mx.bit_length())
    # bit matrix (n, width), MSB first, then packbits
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return bytes([width]) + np.packbits(bits.reshape(-1)).tobytes()


def _unpack(buf: bytes, n: int) -> np.ndarray:
    """Inverse of _pack; returns int64 array of length n."""
    width = buf[0]
    if width == 0:
        val = int.from_bytes(buf[1:9], "big")
        return np.full(n, val, dtype=np.int64)
    raw = np.frombuffer(buf, dtype=np.uint8, offset=1)
    bits = np.unpackbits(raw)[: n * width].reshape(n, width)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    return (bits.astype(np.uint64) << shifts[None, :]).sum(axis=1).astype(np.int64)


def encode_block(docids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """Encode one block (docids strictly ascending). Returns (docids_enc, tfs_enc)."""
    docids = np.asarray(docids, dtype=np.int64)
    deltas = np.diff(docids)
    return _pack(deltas), _pack(np.asarray(tfs, dtype=np.int64))


def decode_block(
    docids_enc: bytes, tfs_enc: bytes, first_docid: int, count: int
) -> tuple[np.ndarray, np.ndarray]:
    """Decode one block -> (docids ascending int64, tfs int64)."""
    if count == 1:
        deltas = np.empty(0, dtype=np.int64)
    else:
        deltas = _unpack(docids_enc, count - 1)
    docids = np.empty(count, dtype=np.int64)
    docids[0] = first_docid
    if count > 1:
        np.cumsum(deltas, out=docids[1:])
        docids[1:] += first_docid
    tfs = _unpack(tfs_enc, count)
    return docids, tfs


def block_max_bound(
    tfs: np.ndarray, norm_bytes: np.ndarray, cache: np.ndarray
) -> float:
    """max over block of tf/(tf + cache[norm_byte]) — the term-independent part
    of the BM25 upper bound (weight multiplies in at query time).

    This is the block-max metadata the north rule requires (absent in Lucene
    4.8's skip entries — SURVEY.md §4.1); pruning with it is rank-safe.
    """
    tf = np.asarray(tfs, dtype=np.float32)
    norm = cache[np.asarray(norm_bytes, dtype=np.uint8)]
    return float(np.max(tf / (tf + norm)))


def decode_positions(pos_enc: bytes, n_positions: int) -> np.ndarray:
    """Decode a block's positions payload -> flat int64 array (length =
    sum of the block's tfs; split per posting by cumsum(tfs))."""
    if n_positions == 0:
        return np.empty(0, dtype=np.int64)
    return _unpack(pos_enc, n_positions)


def decode_offsets(off_enc: bytes, n_positions: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode a block's offsets payload -> (starts, ends) int64 arrays of
    length = sum of the block's tfs (aligned with the positions payload).
    Wire format: one packed array of 2*n values [s0, e0-s0, s1, e1-s1, …]
    (lengths instead of ends keep the bit width small)."""
    if n_positions == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    flat = _unpack(off_enc, 2 * n_positions)
    starts = flat[0::2]
    return starts, starts + flat[1::2]


def _packed_len(buf: bytes, n: int) -> int:
    """Byte length of a _pack(values) prefix of n values inside buf."""
    width = buf[0]
    if width == 0:
        return 9
    return 1 + (n * width + 7) // 8


def encode_payloads(lens: np.ndarray, payload_buf: bytes) -> bytes:
    """Encode per-occurrence payload bytes (the PayloadAttribute channel —
    Lucene41PostingsWriter.cs stores payload length + bytes inside the pos
    block). Wire format: _pack(lens) ++ concatenated payload bytes; no
    header needed — the packed-lengths prefix size is derivable from its
    width byte and the occurrence count."""
    return _pack(np.asarray(lens, dtype=np.int64)) + payload_buf


def decode_payloads(pay_enc: bytes, n_positions: int) -> tuple[np.ndarray, bytes]:
    """Decode a block's payloads payload -> (lens int64 array aligned with
    the positions payload, concatenated payload bytes). A zero len means
    'no payload at this occurrence'."""
    if n_positions == 0 or not pay_enc:
        return np.zeros(n_positions, dtype=np.int64), b""
    plen = _packed_len(pay_enc, n_positions)
    lens = _unpack(pay_enc[:plen], n_positions)
    return lens, pay_enc[plen:]


def decode_float_payloads(pay_enc: bytes, n_positions: int) -> np.ndarray:
    """Decode payloads that are all 4-byte big-endian float32
    (PayloadHelper.EncodeSingle — Analysis.Common/Analysis/Payloads/
    PayloadHelper.cs); occurrences without a payload decode as NaN."""
    lens, buf = decode_payloads(pay_enc, n_positions)
    out = np.full(n_positions, np.nan, dtype=np.float32)
    if not len(buf):
        return out
    has = lens == 4
    if not has.all():
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        vals = np.frombuffer(
            b"".join(
                buf[int(s) : int(s) + 4] for s, h in zip(starts, has) if h
            ),
            dtype=">f4",
        )
        out[has] = vals
        return out
    out[:] = np.frombuffer(buf, dtype=">f4", count=n_positions)
    return out


def encode_posting_list(
    docids: np.ndarray,
    tfs: np.ndarray,
    norm_bytes: np.ndarray,
    cache: np.ndarray,
    block_size: int = BLOCK_SIZE,
    positions: np.ndarray | None = None,
    offsets: np.ndarray | None = None,
    payload_lens: np.ndarray | None = None,
    payload_bytes: bytes | None = None,
) -> list[dict]:
    """Split one term's (sorted) postings into encoded block rows.

    positions: flat per-occurrence token positions, aligned with the
    postings via tfs (posting i owns positions[cum_tf[i]:cum_tf[i+1]]) —
    the DOCS_AND_FREQS_AND_POSITIONS payload
    (Lucene41PostingsWriter.cs:283-354 writes pos blocks alongside doc
    blocks). None -> DOCS_AND_FREQS only (pos_enc = b"").
    offsets: flat interleaved [start, end-start] per occurrence
    (2*len(positions) values) — the …_AND_OFFSETS level
    (FieldInfo.cs:315-356; Lucene41 stores startOffset/length deltas in
    the pos block). None -> off_enc = b"".
    payload_lens/payload_bytes: per-occurrence payload byte lengths
    (aligned with positions; 0 = no payload) + their concatenated bytes —
    the PayloadAttribute channel (Lucene41 stores payload length + bytes
    in the pos block). None -> pay_enc = b"".

    Returns list of dicts matching the postings table schema (minus
    field/term/salt, which the caller adds).
    """
    n = len(docids)
    out = []
    cum = None
    pay_starts = None
    if positions is not None:
        cum = np.concatenate([[0], np.cumsum(np.asarray(tfs, dtype=np.int64))])
        if payload_lens is not None:
            pay_starts = np.concatenate(
                [[0], np.cumsum(np.asarray(payload_lens, dtype=np.int64))]
            )
    for b0 in range(0, n, block_size):
        b1 = min(b0 + block_size, n)
        d, t, nb = docids[b0:b1], tfs[b0:b1], norm_bytes[b0:b1]
        de, te = encode_block(d, t)
        pe = oe = ye = b""
        if positions is not None:
            p = positions[cum[b0] : cum[b1]]
            pe = _pack(np.asarray(p, dtype=np.int64)) if len(p) else b""
            if offsets is not None:
                o = offsets[2 * cum[b0] : 2 * cum[b1]]
                oe = _pack(np.asarray(o, dtype=np.int64)) if len(o) else b""
            if pay_starts is not None and len(p):
                ye = encode_payloads(
                    payload_lens[cum[b0] : cum[b1]],
                    payload_bytes[int(pay_starts[cum[b0]]) : int(pay_starts[cum[b1]])],
                )
        out.append(
            {
                "block_no": b0 // block_size,
                "first_docid": int(d[0]),
                "last_docid": int(d[-1]),
                "count": int(b1 - b0),
                "max_score_bound": block_max_bound(t, nb, cache),
                "docids_enc": de,
                "tfs_enc": te,
                "norms_enc": np.asarray(nb, dtype=np.uint8).tobytes(),
                "pos_enc": pe,
                "off_enc": oe,
                "pay_enc": ye,
            }
        )
    return out
