"""Fused Pallas encode kernel (ops/encode_fused_pallas.py) vs the XLA pack.

The production-geometry kernel runs on real TPU; interpret mode executes
each traced op individually, so these tests use tiny geometries that still
cover every code path (in-kernel front, pair merge, level-1, insertion
barrel, both window sweeps, scratch carries across steps, lane padding,
compact-width overflow, dummy frames)."""

import numpy as np
import pytest

from tests.conftest import make_mixed
from x3_tpu.params import Parameters

TINY = Parameters(block_len=4, blocks_per_frame=8)  # 33 samples/frame


def _frames(rng, params, F, short_tail=True):
    spf = params.samples_per_frame
    wav = make_mixed(rng, F * spf)
    frames = wav.reshape(F, spf).astype(np.int16)
    n_valid = np.full(F, spf, np.int32)
    if short_tail and F >= 3:
        n_valid[-1] = spf - 2      # partial frame
        n_valid[-2] = 1            # single-sample frame
        n_valid[-3] = 0            # dummy frame
        frames[-3] = 0
    return frames, n_valid


def _ref(frames, n_valid, params, W):
    import jax.numpy as jnp

    from x3_tpu.ops.encode_kernel import encode_frames

    o = encode_frames(jnp.asarray(frames), jnp.asarray(n_valid), params, "block", W, None)
    return o


@pytest.mark.parametrize("sweep", ["linear", "dyn", "blockrmw"])
def test_fused_matches_xla_pack(rng, sweep):
    import jax.numpy as jnp

    from x3_tpu.ops.encode_fused_pallas import encode_frames_fused_words
    from x3_tpu.ops.encode_kernel import frame_geometry

    params = TINY
    _, B, L, W = frame_geometry(params)
    frames, n_valid = _frames(rng, params, 11)
    ref = _ref(frames, n_valid, params, W)
    # U=3 does not divide B=8 -> padded blocks; TF=256 > F=11 -> padded lanes.
    words, total_bits, blockfit, stats = encode_frames_fused_words(
        jnp.asarray(frames), jnp.asarray(n_valid), params, W, True, (3, 256, 2, sweep)
    )
    np.testing.assert_array_equal(np.asarray(total_bits), np.asarray(ref["total_bits"]))
    np.testing.assert_array_equal(np.asarray(blockfit), np.asarray(ref["blockfit_bits"]))
    np.testing.assert_array_equal(np.asarray(stats), np.asarray(ref["stats"]))
    np.testing.assert_array_equal(np.asarray(words), np.asarray(ref["payload_words"]))


def test_fused_compact_width_overflow_contract(rng):
    """Frames whose payload exceeds a compact W rung must still report exact
    total_bits/blockfit/stats (the escalation contract); fitting lanes'
    words stay exact."""
    import jax.numpy as jnp

    from x3_tpu.ops.encode_fused_pallas import encode_frames_fused_words
    from x3_tpu.ops.encode_kernel import fits_width, frame_geometry

    params = TINY
    _, B, L, WFULL = frame_geometry(params)
    Wc = 8  # compact: full-scale frames overflow this
    frames, n_valid = _frames(rng, params, 9)
    ref_full = _ref(frames, n_valid, params, WFULL)
    ref_c = _ref(frames, n_valid, params, Wc)
    words, total_bits, blockfit, stats = encode_frames_fused_words(
        jnp.asarray(frames), jnp.asarray(n_valid), params, Wc, True, (2, 256, 2, "dyn")
    )
    np.testing.assert_array_equal(np.asarray(total_bits), np.asarray(ref_full["total_bits"]))
    np.testing.assert_array_equal(np.asarray(blockfit), np.asarray(ref_full["blockfit_bits"]))
    np.testing.assert_array_equal(np.asarray(stats), np.asarray(ref_full["stats"]))
    nb = np.asarray(ref_full["nbytes"])
    fits = nb <= (Wc - 2) * 4
    assert fits.any() and (~fits).any(), "need both fitting and overflowing lanes"
    np.testing.assert_array_equal(
        np.asarray(words)[fits], np.asarray(ref_c["payload_words"])[fits]
    )


def test_fused_roundtrips_through_decoder(rng):
    """Fused-encoded payloads decode back bit-exactly via the XLA decoder."""
    import jax.numpy as jnp

    from x3_tpu.ops.decode_kernel import decode_frames
    from x3_tpu.ops.encode_fused_pallas import encode_frames_fused_words
    from x3_tpu.ops.encode_kernel import frame_geometry

    params = TINY
    _, _, _, W = frame_geometry(params)
    F = 7
    frames, n_valid = _frames(rng, params, F, short_tail=False)
    words, total_bits, _, _ = encode_frames_fused_words(
        jnp.asarray(frames), jnp.asarray(n_valid), params, W, True, (2, 256, 2, "dyn")
    )
    nbytes = (np.asarray(total_bits) + 7) // 8
    nbytes = nbytes + (nbytes & 1)
    w = np.asarray(words)
    pb = np.zeros((F, W * 4), np.uint8)
    pb[:, 0::4] = (w >> 24) & 0xFF
    pb[:, 1::4] = (w >> 16) & 0xFF
    pb[:, 2::4] = (w >> 8) & 0xFF
    pb[:, 3::4] = w & 0xFF
    out, err = decode_frames(
        jnp.asarray(pb), jnp.asarray(n_valid), jnp.asarray(nbytes.astype(np.int32)), params
    )
    assert not np.asarray(err).any()
    spf = params.samples_per_frame
    np.testing.assert_array_equal(np.asarray(out)[:, :spf], frames)


def test_fused_geometry_and_fits():
    """The TPU routing table: the fused kernel covers only the wide rungs
    where it measured ahead of the XLA pipeline (round 5 sweeps), with
    int16-tile-safe U and the dyn sweep."""
    from x3_tpu.ops.encode_fused_pallas import _auto_geometry, fused_encode_fits
    from x3_tpu.ops.encode_kernel import frame_geometry, width_rungs

    params = Parameters()
    _, B, L, WFULL = frame_geometry(params)
    # Measured optimum (v5e, F=768 — ROADMAP R5-1) reproduced exactly.
    assert _auto_geometry(4096, B, L, 768) == (4, 256, 2, "dyn")
    assert _auto_geometry(WFULL, B, L, 768) == (4, 256, 2, "dyn")
    # Narrow rungs stay on the XLA pipeline (fused measured behind there).
    for W in width_rungs(params):
        if W < 4096:
            assert _auto_geometry(W, B, L, 768) is None
            assert not fused_encode_fits(params, W, 768)
        else:
            geo = _auto_geometry(W, B, L, 768)
            U, TF, K, sweep = geo
            assert (U * L) % 16 == 0 and TF == 256 and K >= 2 and sweep == "dyn"
            assert fused_encode_fits(params, W, 768)
    assert not fused_encode_fits(params, WFULL, 64)  # tiny batch
    big = Parameters(block_len=60, blocks_per_frame=5)
    assert not fused_encode_fits(big, 4096, 768)  # unrolled-walk bound
