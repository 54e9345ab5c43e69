"""Pallas pack-walk kernel (ops/pack_walk_pallas.py) vs the XLA pack.

The production-geometry kernel is exercised on real TPU; interpret mode
executes each traced op individually, so these tests use tiny geometry
overrides that still cover every code path (level-1 select-accumulate,
shift-up insertion barrel, masked RMW window sweep, cross-step word
sharing, zero-length/absent items, compact-width overflow clipping)."""

import numpy as np
import pytest

from x3_tpu.params import Parameters


def _random_pairs(rng, F, B, P, NB):
    """Well-formed pair streams: val < 2^len, block bits bounded so a block
    spans <= NB buffer words from any in-word start offset (the encode
    front's invariant: <= 16+6+16*L bits per block)."""
    maxbits = NB * 32 - 31
    mlen = rng.integers(0, 33, (F, B, P)).astype(np.int32)
    scale = np.maximum(1, (mlen.sum(axis=2, keepdims=True) // maxbits) + 1)
    mlen = mlen // scale
    mlen[:, B // 2 :, :] = np.where(
        rng.random((F, B - B // 2, P)) < 0.3, 0, mlen[:, B // 2 :, :]
    )
    mval = (
        rng.integers(0, 2**32, (F, B, P), dtype=np.uint64)
        & ((1 << mlen.astype(np.uint64)) - 1)
    ).astype(np.uint32)
    ends = np.cumsum(mlen, axis=2)
    bb = ends[:, :, -1]
    be = np.cumsum(bb, axis=1)
    boff = (be - bb).astype(np.int32)
    return mval, mlen, boff


def test_pack_walk_matches_xla_pack(rng):
    import jax.numpy as jnp

    from x3_tpu.ops.encode_kernel import _pack_pairs
    from x3_tpu.ops.pack_walk_pallas import pack_frames_walk

    F, B, P, L, W = 3, 8, 3, 4, 16
    geo = (2, 256, 2, 3)  # U=2, TF=256, K=2, NB=3 — multi-step, multi-window
    mval, mlen, boff = _random_pairs(rng, F, B, P, NB=geo[3])
    ref_w, _, _ = _pack_pairs(jnp.asarray(mval), jnp.asarray(mlen), W, 12)
    got = pack_frames_walk(
        jnp.asarray(mval), jnp.asarray(mlen), jnp.asarray(boff), W, L, True, geo
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref_w))


def test_pack_walk_overflow_clips_like_xla(rng):
    """Frames whose payload exceeds the compact W produce garbage tails but
    must not corrupt other lanes (the fits_width escalation contract)."""
    import jax.numpy as jnp

    from x3_tpu.ops.encode_kernel import _pack_pairs
    from x3_tpu.ops.pack_walk_pallas import pack_frames_walk

    F, B, P, L, W = 2, 12, 3, 4, 4  # W tiny: later blocks overflow
    geo = (2, 256, 2, 3)
    mval, mlen, boff = _random_pairs(rng, F, B, P, NB=geo[3])
    mlen[:, :, :] = np.maximum(mlen, 8)  # force overflow past W*32 bits
    mval = (mval & ((1 << mlen.astype(np.uint64)) - 1)).astype(np.uint32)
    ends = np.cumsum(mlen, axis=2)
    bb = ends[:, :, -1]
    be = np.cumsum(bb, axis=1)
    boff = (be - bb).astype(np.int32)
    ref_w, _, _ = _pack_pairs(jnp.asarray(mval), jnp.asarray(mlen), W, 12)
    got = pack_frames_walk(
        jnp.asarray(mval), jnp.asarray(mlen), jnp.asarray(boff), W, L, True, geo
    )
    n_ok = int(np.argmax(be[0] > W * 32)) if (be[0] > W * 32).any() else B
    # Words fully before the first overflowing block agree exactly.
    safe_words = max(0, int(boff[0, n_ok]) // 32 - 1) if n_ok < B else W
    np.testing.assert_array_equal(
        np.asarray(got)[:, :safe_words], np.asarray(ref_w)[:, :safe_words]
    )


def test_pack_geometry_invariants():
    from x3_tpu.ops.encode_kernel import frame_geometry
    from x3_tpu.ops.pack_walk_pallas import _pack_geometry, pallas_pack_fits

    params = Parameters()
    _, B, L, WFULL = frame_geometry(params)
    P = 1 + (L + 1) // 2
    for W in (512, 1024, 2048, 4096, WFULL):
        for F in (512, 768):
            got = _pack_geometry(W, B, L, P, F)
            assert got is not None
            U, TF, K, NB = got
            assert U % 8 == 0 and (U * P) % 8 == 0
            assert NB * 32 >= 16 + 6 + 16 * L
            assert K * 64 >= 63 + U * (NB + 1) + NB  # window covers U blocks
            pad_w = K * 64 + (-(W + K * 64)) % 64
            scoped = (
                (W + pad_w) * TF * 4
                + U * P * TF * 16
                + U * TF * 8
                + K * 64 * TF * 4
            )
            assert scoped <= 14_500_000
    assert _pack_geometry(40_000, B, L, P, 768) is None
    assert not pallas_pack_fits(40_000, B, L, P, 768)
    assert pallas_pack_fits(512, B, L, P, 768)


def test_pack_walk_full_literal_block_at_word_tail():
    """A literal-heavy block (326 bits: 6-bit header + 20x16-bit samples)
    starting at in-word offset >= 27 spans 12 buffer words; the production
    NB must cover it (round-5 fix: the old floor-divided NB=11 silently
    dropped such a block's last word)."""
    import jax.numpy as jnp

    from x3_tpu.ops.encode_kernel import _pack_pairs
    from x3_tpu.ops.pack_walk_pallas import _pack_geometry, pack_frames_walk

    F, B, P, L, W = 2, 2, 11, 20, 32
    # Production NB for L=20 must span a 326-bit block from offset 31.
    U, TF, K, NB = 2, 256, 3, _pack_geometry(2048, 500, L, P, 768)[3]
    assert NB * 32 - 31 >= 6 + 16 * L, "NB must cover a full literal block"

    mval = np.zeros((F, B, P), np.uint32)
    mlen = np.zeros((F, B, P), np.int32)
    # Block 0: 27 bits total -> block 1 starts at in-word offset 27.
    mlen[:, 0, 0] = 27
    mval[:, 0, 0] = 0x501_FACE
    # Block 1: literal block shape — 6-bit header pair + ten 32-bit pairs.
    mlen[:, 1, 0] = 6
    mval[:, 1, 0] = 0x2F
    mlen[:, 1, 1:] = 32
    mval[:, 1, 1:] = np.arange(1, 11, dtype=np.uint32)[None, :] * 0x0F0F_0F0F
    ends = np.cumsum(mlen, axis=2)
    bb = ends[:, :, -1]
    be = np.cumsum(bb, axis=1)
    boff = (be - bb).astype(np.int32)

    ref_w, _, _ = _pack_pairs(jnp.asarray(mval), jnp.asarray(mlen), W, 12)
    got = pack_frames_walk(
        jnp.asarray(mval), jnp.asarray(mlen), jnp.asarray(boff), W, L, True,
        (U, TF, K, NB),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref_w))
