"""Lucene SmallFloat byte315 norm quantization, vectorized in numpy.

Semantics of reference `src/Lucene.Net/Util/SmallFloat.cs:132-186`
(floatToByte315 / byte315ToFloat: 3 mantissa bits, 5 exponent bits,
zero-exponent 15) and the BM25 norm decode table
`src/Lucene.Net/Search/Similarities/BM25Similarity.cs:142-154`
(NORM_TABLE[b] = 1 / byte315ToFloat(b)^2).

All functions operate on numpy arrays and are exact bit-level ports of the
*semantics* (float32 bit patterns), not of the C# code.
"""

from __future__ import annotations

import numpy as np

_EXP_OFFSET = (63 - 15) << 3  # 384


def float_to_byte315(f: np.ndarray) -> np.ndarray:
    """Vectorized floatToByte315. Input any float dtype; computed on float32 bits.

    Reference: SmallFloat.cs:146-159 (SingleToSByte315).
    """
    f32 = np.asarray(f, dtype=np.float32)
    bits = f32.view(np.int32)
    smallfloat = bits >> (24 - 3)
    out = (smallfloat - _EXP_OFFSET).astype(np.int64)
    # underflow: <= zero-point -> 0 if f <= 0 else 1
    under = smallfloat <= _EXP_OFFSET
    out[under] = np.where(bits[under] <= 0, 0, 1)
    # overflow (incl. +inf from 1/sqrt(0)): -> 255 (sbyte -1)
    out[smallfloat >= _EXP_OFFSET + 0x100] = 255
    return out.astype(np.uint8)


def byte315_to_float(b: np.ndarray) -> np.ndarray:
    """Vectorized byte315ToFloat. Reference: SmallFloat.cs:179-186."""
    b = np.asarray(b, dtype=np.uint8).astype(np.int32)
    bits = (b << (24 - 3)) + ((63 - 15) << 24)
    out = bits.astype(np.int32).view(np.float32).copy()
    out[b == 0] = np.float32(0.0)
    return out


def _build_norm_table() -> np.ndarray:
    """BM25 NORM_TABLE: 256 float32 values 1/(byte315ToFloat(b))^2.

    Reference: BM25Similarity.cs:142-154. NORM_TABLE[0] is +inf (1/0^2);
    Lucene stores inf there too — byte 0 only arises for boost<=0, never for
    real docs.
    """
    f = byte315_to_float(np.arange(256, dtype=np.uint8))
    with np.errstate(divide="ignore"):
        return (np.float32(1.0) / (f * f)).astype(np.float32)


NORM_TABLE: np.ndarray = _build_norm_table()

# Classic (TF-IDF / DefaultSimilarity) decode table: raw byte315ToFloat —
# DecodeNormValue(norm) = NORM_TABLE[b] with NORM_TABLE[i] = Byte315ToSingle(i)
# (DefaultSimilarity.cs:105-108,54-61). Index-time bytes are IDENTICAL to
# BM25's (both encode boost/sqrt(fieldLength)), so similarity is a pure
# query-time choice.
DECODE_TABLE: np.ndarray = byte315_to_float(np.arange(256, dtype=np.uint8))


def encode_norm(field_lengths: np.ndarray, boost: float = 1.0) -> np.ndarray:
    """Norm byte per doc: floatToByte315(boost / (float)sqrt(fieldLength)).

    Matches BM25Similarity.ComputeNorm/EncodeNormValue
    (BM25Similarity.cs:110-122,156-160): sqrt computed in float64, cast to
    float32, then a float32 division. fieldLength == 0 gives +inf -> byte 255
    (saturation), matching the reference; such docs never match any term.
    """
    lengths = np.asarray(field_lengths, dtype=np.float64)
    with np.errstate(divide="ignore"):
        f = np.float32(boost) / np.sqrt(lengths).astype(np.float32)
    return float_to_byte315(f)


def norm_length_byte_boundaries(max_len: int = 1 << 22) -> list[tuple[int, int, int]]:
    """(byte, min_fieldLength, max_fieldLength) runs for lengths 1..max_len.

    Used to embed the exact quantization in ANSI-SQL oracles (a ~100-row
    BETWEEN-join replaces float bit-twiddling). Monotone: byte is
    non-increasing in length.
    """
    # sample boundaries by exponential sweep then refine: byte changes are
    # sparse (<=256 runs). Compute directly on a log-spaced grid + binary
    # search at change points.
    runs: list[tuple[int, int, int]] = []
    lo = 1
    b_lo = int(encode_norm(np.array([lo]))[0])
    while lo <= max_len:
        # exponential gallop for the end of this run
        step = 1
        hi = lo
        while True:
            nxt = min(hi + step, max_len)
            if nxt == hi:
                break
            if int(encode_norm(np.array([nxt]))[0]) == b_lo:
                hi = nxt
                step *= 2
                if hi == max_len:
                    break
            else:
                break
        # binary search exact boundary in (hi, min(hi+step, max_len)]
        lo2, hi2 = hi, min(hi + step, max_len)
        while lo2 < hi2:
            mid = (lo2 + hi2 + 1) // 2
            if int(encode_norm(np.array([mid]))[0]) == b_lo:
                lo2 = mid
            else:
                hi2 = mid - 1
        runs.append((b_lo, lo, lo2))
        lo = lo2 + 1
        if lo <= max_len:
            b_lo = int(encode_norm(np.array([lo]))[0])
    return runs
