"""byte315 quantization: vectorized numpy vs an independent scalar port.

Reference semantics: src/Lucene.Net/Util/SmallFloat.cs:132-186 and the BM25
norm decode table BM25Similarity.cs:142-154.
"""
import math
import struct

import numpy as np
import pytest

from lucenenet_spark.functions.smallfloat import (
    NORM_TABLE,
    byte315_to_float,
    encode_norm,
    float_to_byte315,
    norm_length_byte_boundaries,
)


def scalar_float_to_byte315(f: float) -> int:
    """Independent scalar re-derivation of SmallFloat.SingleToSByte315."""
    bits = struct.unpack("<i", struct.pack("<f", np.float32(f)))[0]
    small = bits >> 21
    if small <= (63 - 15) << 3:
        return 0 if bits <= 0 else 1
    if small >= ((63 - 15) << 3) + 0x100:
        return 255
    return (small - ((63 - 15) << 3)) & 0xFF


def scalar_byte315_to_float(b: int) -> float:
    bits = ((b & 0xFF) << 21) + ((63 - 15) << 24)
    return struct.unpack("<f", struct.pack("<i", bits))[0]


def test_encode_matches_scalar_sweep():
    vals = np.concatenate(
        [
            np.array([0.0, -1.0, -1e-30, 1e-38, 1e38, np.inf, 5e-9, 1.0, 0.5]),
            1.0 / np.sqrt(np.arange(1, 5000, dtype=np.float64)),
            np.float32(10) ** np.linspace(-9, 9, 500),
        ]
    ).astype(np.float32)
    got = float_to_byte315(vals)
    want = np.array([scalar_float_to_byte315(float(v)) for v in vals], dtype=np.uint8)
    np.testing.assert_array_equal(got, want)


def test_decode_matches_scalar_all_bytes():
    got = byte315_to_float(np.arange(256, dtype=np.uint8))
    want = np.array([scalar_byte315_to_float(b) for b in range(256)], dtype=np.float32)
    # scalar decode of byte 0 gives a tiny denormal-ish value; Lucene maps 0 -> 0
    want[0] = 0.0
    np.testing.assert_array_equal(got, want)


def test_roundtrip_monotone_and_lossy():
    # encode(decode(b)) == b for all representable bytes >= 1
    b = np.arange(1, 256, dtype=np.uint8)
    np.testing.assert_array_equal(float_to_byte315(byte315_to_float(b)), b)


def test_norm_byte_edge_cases():
    # fieldLength 0 -> 1/sqrt(0)=+inf -> saturated byte 255 (FIXTURES.md §3)
    assert encode_norm(np.array([0]))[0] == 255
    # length 1 -> 1.0 -> byte for 1.0f
    assert encode_norm(np.array([1]))[0] == scalar_float_to_byte315(1.0)
    # monotone: longer docs -> smaller 1/sqrt -> byte non-increasing
    bs = encode_norm(np.arange(1, 3000))
    assert (np.diff(bs.astype(np.int32)) <= 0).all()


def test_norm_table_definition():
    f = byte315_to_float(np.arange(256, dtype=np.uint8))
    with np.errstate(divide="ignore"):
        expect = (np.float32(1.0) / (f * f)).astype(np.float32)
    assert math.isinf(NORM_TABLE[0])
    np.testing.assert_array_equal(NORM_TABLE[1:], expect[1:])


def test_boundaries_cover_and_agree():
    runs = norm_length_byte_boundaries(max_len=100_000)
    # contiguous cover of 1..max_len
    assert runs[0][1] == 1
    for (b0, lo0, hi0), (b1, lo1, hi1) in zip(runs, runs[1:]):
        assert lo1 == hi0 + 1
        assert b1 != b0
    assert runs[-1][2] == 100_000
    # spot-check membership agrees with direct encoding
    probe = np.array([1, 2, 3, 7, 100, 101, 5000, 99_999])
    direct = encode_norm(probe)
    for p, d in zip(probe.tolist(), direct.tolist()):
        b = next(b for b, lo, hi in runs if lo <= p <= hi)
        assert b == d, (p, b, d)
