"""Posting-block codec round-trip — the BasePostingsFormatTestCase analogue.

The reference round-trips random postings through each codec and verifies
enumeration + stats (src/Lucene.Net.TestFramework/Index/BasePostingsFormatTestCase.cs).
Here: property-based round-trip of the delta+bitpack block codec plus the
block-max metadata invariants.
"""
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucenenet_spark.functions.smallfloat import NORM_TABLE
from lucenenet_spark.oracle import norm_cache
from lucenenet_spark.operators.codec import (
    BLOCK_SIZE,
    block_max_bound,
    decode_block,
    encode_block,
    encode_posting_list,
)


@given(
    docids=st.lists(st.integers(0, 2**40), min_size=1, max_size=300, unique=True),
    tf_seed=st.integers(0, 2**31),
)
@settings(max_examples=60, deadline=None)
def test_block_roundtrip(docids, tf_seed):
    docids = np.array(sorted(docids), dtype=np.int64)
    rng = np.random.default_rng(tf_seed)
    tfs = rng.integers(1, 1000, size=len(docids)).astype(np.int64)
    de, te = encode_block(docids, tfs)
    d2, t2 = decode_block(de, te, int(docids[0]), len(docids))
    np.testing.assert_array_equal(d2, docids)
    np.testing.assert_array_equal(t2, tfs)


def test_all_equal_block_is_tiny():
    # Lucene's all-equal optimization (Lucene41PostingsFormat.cs:38-40):
    # constant deltas/tfs must collapse to the 9-byte width-0 payload
    docids = np.arange(0, 128 * 7, 7, dtype=np.int64)
    tfs = np.full(128, 3, dtype=np.int64)
    de, te = encode_block(docids, tfs)
    assert len(de) == 9 and len(te) == 9
    d2, t2 = decode_block(de, te, 0, 128)
    np.testing.assert_array_equal(d2, docids)
    np.testing.assert_array_equal(t2, tfs)


def test_singleton_block():
    de, te = encode_block(np.array([42], dtype=np.int64), np.array([5], dtype=np.int64))
    d2, t2 = decode_block(de, te, 42, 1)
    assert d2.tolist() == [42] and t2.tolist() == [5]


def test_encode_posting_list_blocks_and_bounds():
    n = 300
    rng = np.random.default_rng(7)
    docids = np.cumsum(rng.integers(1, 50, size=n)).astype(np.int64)
    tfs = rng.integers(1, 20, size=n).astype(np.int64)
    nbytes = rng.integers(100, 130, size=n).astype(np.uint8)
    cache = norm_cache(1.2, 0.75, np.float32(25.0))
    rows = encode_posting_list(docids, tfs, nbytes, cache)
    assert [r["block_no"] for r in rows] == [0, 1, 2]
    assert [r["count"] for r in rows] == [128, 128, 44]
    # block chain strictly monotone (CheckIndex invariant)
    assert rows[0]["last_docid"] < rows[1]["first_docid"]
    got_d, got_t, got_n = [], [], []
    for r in rows:
        d, t = decode_block(r["docids_enc"], r["tfs_enc"], r["first_docid"], r["count"])
        got_d.append(d)
        got_t.append(t)
        got_n.append(np.frombuffer(r["norms_enc"], dtype=np.uint8))
        # block-max bound really is the max of the per-doc score kernel
        tf32 = t.astype(np.float32)
        kern = tf32 / (tf32 + cache[np.frombuffer(r["norms_enc"], dtype=np.uint8)])
        assert r["max_score_bound"] == float(np.max(kern))
    np.testing.assert_array_equal(np.concatenate(got_d), docids)
    np.testing.assert_array_equal(np.concatenate(got_t), tfs)
    np.testing.assert_array_equal(np.concatenate(got_n), nbytes)


def test_block_max_bound_dominates_scores():
    # bound * weight >= every true score in the block, for any weight >= 0
    rng = np.random.default_rng(11)
    tfs = rng.integers(1, 100, size=128).astype(np.int64)
    nb = rng.integers(1, 256, size=128).astype(np.uint8)
    cache = norm_cache(1.2, 0.75, np.float32(10.0))
    bound = block_max_bound(tfs, nb, cache)
    w = np.float32(3.7)
    scores = (w * tfs.astype(np.float32)) / (tfs.astype(np.float32) + cache[nb])
    assert (scores <= np.float32(bound) * w + 1e-6).all()


@given(
    st.lists(
        st.tuples(st.integers(1, 5), st.integers(0, 10000)), min_size=1, max_size=300
    ),
    st.integers(0, 2**40),
)
@settings(max_examples=40, deadline=None)
def test_positions_roundtrip(tf_posbase, base):
    """encode_posting_list(positions=...) + decode_positions round-trips the
    flat per-occurrence positions, split per posting by cumsum(tf)."""
    import numpy as np

    from lucenenet_spark.operators.codec import (
        decode_positions,
        encode_posting_list,
    )
    from lucenenet_spark.oracle import norm_cache

    docids = np.cumsum([1 + (p % 3) for _tf, p in tf_posbase]) + base
    tfs = np.array([tf for tf, _p in tf_posbase], dtype=np.int64)
    rng = np.random.RandomState(7)
    positions = np.concatenate(
        [
            np.sort(rng.choice(pb + 500, size=tf, replace=False))
            for tf, pb in tf_posbase
            for _ in [None]
        ]
    ).astype(np.int64) if len(tf_posbase) else np.empty(0, np.int64)
    norms = rng.randint(100, 200, size=len(docids)).astype(np.uint8)
    cache = norm_cache(1.2, 0.75, np.float32(20.0))
    rows = encode_posting_list(
        np.asarray(docids, dtype=np.int64), tfs, norms, cache, 128,
        positions=positions,
    )
    cum = np.concatenate([[0], np.cumsum(tfs)])
    got = []
    i = 0
    for r in rows:
        b0, b1 = i, min(i + 128, len(docids))
        n_pos = int(cum[b1] - cum[b0])
        got.append(decode_positions(r["pos_enc"], n_pos))
        i = b1
    assert np.array_equal(np.concatenate(got), positions)


def test_offsets_round_trip():
    """DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS payload: interleaved
    [start, len] pairs per occurrence round-trip per block."""
    import numpy as np

    from lucenenet_spark.operators.codec import (
        decode_offsets,
        decode_positions,
        encode_posting_list,
    )
    from lucenenet_spark.oracle import norm_cache

    rng = np.random.default_rng(7)
    n = 300
    docids = np.sort(rng.choice(100000, size=n, replace=False))
    tfs = rng.integers(1, 5, size=n).astype(np.int64)
    total = int(tfs.sum())
    positions = rng.integers(0, 500, size=total).astype(np.int64)
    starts = rng.integers(0, 4000, size=total).astype(np.int64)
    lens = rng.integers(1, 30, size=total).astype(np.int64)
    offs = np.empty(2 * total, dtype=np.int64)
    offs[0::2] = starts
    offs[1::2] = lens
    norms = rng.integers(0, 256, size=n).astype(np.uint8)
    cache = norm_cache(1.2, 0.75, np.float32(20.0))
    rows = encode_posting_list(
        docids, tfs, norms, cache, 128, positions=positions, offsets=offs
    )
    cum = np.concatenate([[0], np.cumsum(tfs)])
    got_s, got_e = [], []
    for r in rows:
        b0 = r["block_no"] * 128
        b1 = min(b0 + 128, n)
        np_block = int(cum[b1] - cum[b0])
        p = decode_positions(r["pos_enc"], np_block)
        assert (p == positions[cum[b0] : cum[b1]]).all()
        s, e = decode_offsets(r["off_enc"], np_block)
        got_s.append(s)
        got_e.append(e)
    got_s = np.concatenate(got_s)
    got_e = np.concatenate(got_e)
    assert (got_s == starts).all()
    assert (got_e == starts + lens).all()
