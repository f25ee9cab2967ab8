"""SweetSpotSimilarity (Lucene.Net.Misc/Misc/SweetSpotSimilarity.cs) —
DefaultSimilarity with a plateau length norm and a baseline tf.

The split follows Lucene's own: LengthNorm is an INDEX-time choice (it is
baked into the stored norm byte at ComputeNorm time), BaselineTf a
query-time one. Here the index side is IndexBuilder(norm_spec=
"sweetspot:<min>:<max>:<steepness>") and the query side is
IndexSearcher(similarity="sweetspot[:<tf_base>:<tf_min>]").

ComputeLengthNorm (SweetSpotSimilarity.cs:142-149):
    f32( 1.0 / sqrt_f64( f32(steep * f32(|n-min| + |n-max| - (max-min)))
                         + 1.0f ) )
— the abs-sum is integer, cast to float once; steep multiply and the +1
are float32; the sqrt and the 1.0/ division run in double; one final cast
back to float32. Defaults (1, 1, 0.5) degrade to 1/sqrt(n), i.e. the
DefaultSimilarity byte stream (TestSweetSpotComputeNorm's base case).

BaselineTf (SweetSpotSimilarity.cs:172-180):
    freq == 0        -> 0
    freq <= tf_min   -> tf_base
    else             -> f32(sqrt_f64( f32(f32(freq + f32(tf_base^2))
                                          - tf_min) ))
Defaults (0, 0) degrade to sqrt(freq), i.e. DefaultSimilarity.Tf.
"""
from __future__ import annotations

import numpy as np

from .smallfloat import DECODE_TABLE, encode_norm, float_to_byte315


def compute_length_norm(
    lengths: np.ndarray, ln_min: int, ln_max: int, steep: float
) -> np.ndarray:
    """Vectorized ComputeLengthNorm over int lengths -> float32 norms."""
    n = np.asarray(lengths, dtype=np.int64)
    abssum = (
        np.abs(n - ln_min) + np.abs(n - ln_max) - (ln_max - ln_min)
    ).astype(np.float32)
    x = (np.float32(steep) * abssum + np.float32(1.0)).astype(np.float32)
    return (np.float64(1.0) / np.sqrt(x.astype(np.float64))).astype(
        np.float32
    )


def parse_norm_spec(spec: str):
    """'standard' -> None; 'sweetspot:<min>:<max>:<steep>' -> (l, h, s)."""
    if spec == "standard":
        return None
    kind, *ps = spec.split(":")
    if kind != "sweetspot" or len(ps) != 3:
        raise ValueError(f"unknown norm_spec {spec!r}")
    return int(ps[0]), int(ps[1]), float(ps[2])


def norm_encoder(spec: str):
    """lengths -> norm bytes for the given norm_spec (executor-safe)."""
    params = parse_norm_spec(spec)
    if params is None:
        return encode_norm
    l, h, s = params

    def enc(field_lengths: np.ndarray, boost: float = 1.0) -> np.ndarray:
        norm = compute_length_norm(field_lengths, l, h, s)
        return float_to_byte315(np.float32(boost) * norm)

    return enc


def baseline_tf(
    freq: np.ndarray, tf_base: np.float32, tf_min: np.float32
) -> np.ndarray:
    """Vectorized BaselineTf over float32 freqs (postings never carry 0)."""
    freq = np.asarray(freq, dtype=np.float32)
    bb = np.float32(tf_base * tf_base)
    op = ((freq + bb) - tf_min).astype(np.float32)
    with np.errstate(invalid="ignore"):  # freq <= tf_min rows masked below
        tfv = np.sqrt(op.astype(np.float64)).astype(np.float32)
    tfv = np.where(freq <= tf_min, tf_base, tfv).astype(np.float32)
    return np.where(freq == 0, np.float32(0.0), tfv).astype(np.float32)


def sweet_norm_runs(spec: str, max_len: int = 1 << 14) -> list[tuple[int, int, float]]:
    """(min_len, max_len, decoded_norm) runs for lengths 1..max_len under the
    sweet encoder — the quantization table an ANSI-SQL oracle embeds as a
    VALUES join (like norm_length_byte_boundaries for the standard byte).
    The sweet norm is not monotone in length, so runs are found by a plain
    linear sweep over the (bounded) gate-corpus length domain."""
    enc = norm_encoder(spec)
    lens = np.arange(1, max_len + 1, dtype=np.int64)
    bytes_ = enc(lens)
    dec = DECODE_TABLE[bytes_]
    runs: list[tuple[int, int, float]] = []
    start = 0
    for i in range(1, len(lens) + 1):
        if i == len(lens) or dec[i] != dec[start]:
            runs.append((int(lens[start]), int(lens[i - 1]), float(dec[start])))
            start = i
    return runs
