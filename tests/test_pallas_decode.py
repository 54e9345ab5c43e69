"""Pallas decode kernel (ops/decode_pallas.py) vs the XLA kernel and oracle.

The full-geometry kernel is exercised on real TPU (where it compiles in
seconds); interpret mode executes each traced op individually, so the CPU
test uses a tiny geometry to keep the trace small while covering the same
code paths (one-hot window select, barrel realign, unrolled walk, scratch
carry across grid steps, error flags)."""

import numpy as np
import pytest

from tests.conftest import make_mixed
from x3_tpu.models import oracle
from x3_tpu.params import Parameters

TINY = Parameters(block_len=4, blocks_per_frame=8)  # 33 samples/frame


def _frames_of(blob: bytes):
    payloads, counts = [], []
    off = 0
    while off < len(blob):
        h = blob[off : off + 20]
        plen = int.from_bytes(h[6:8], "big")
        counts.append(int.from_bytes(h[4:6], "big"))
        payloads.append(blob[off + 20 : off + 20 + plen])
        off += 20 + plen
    return payloads, counts


def _decode_both(payloads, counts, params, W):
    import jax.numpy as jnp

    from x3_tpu.ops.decode_kernel import decode_frames
    from x3_tpu.ops.decode_pallas import decode_frames_pallas

    buf = np.zeros((len(payloads), W * 4), np.uint8)
    for i, p in enumerate(payloads):
        buf[i, : len(p)] = np.frombuffer(p, np.uint8)
    ns = np.asarray(counts, np.int32)
    pls = np.asarray([len(p) for p in payloads], np.int32)
    ref = decode_frames(jnp.asarray(buf), jnp.asarray(ns), jnp.asarray(pls), params)
    got = decode_frames_pallas(
        jnp.asarray(buf), jnp.asarray(ns), jnp.asarray(pls), params, interpret=True
    )
    return ref, got


def test_pallas_matches_xla_and_oracle(rng):
    spf = TINY.samples_per_frame
    wav = np.concatenate(
        [
            make_mixed(rng, spf),
            np.clip(np.cumsum(rng.integers(-200, 201, spf)), -32768, 32767),
            rng.integers(-32768, 32768, spf),  # pass-through blocks
            make_mixed(rng, spf - 5),  # partial tail
        ]
    ).astype(np.int16)
    payloads, counts = _frames_of(oracle.encode(wav, TINY))
    (ref, referr), (got, goterr) = _decode_both(payloads, counts, TINY, W=64)
    assert not np.asarray(referr).any() and not np.asarray(goterr).any()
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    pos = 0
    for i, c in enumerate(counts):
        np.testing.assert_array_equal(np.asarray(got)[i, :c], wav[pos : pos + c])
        pos += c


def test_pallas_error_flags(rng):
    """Corrupt blocks must produce the same per-frame error verdicts."""
    spf = TINY.samples_per_frame
    wav = make_mixed(rng, 2 * spf).astype(np.int16)
    payloads, counts = _frames_of(oracle.encode(wav, TINY))
    bad = []
    for p in payloads:
        b = bytearray(p)
        b[2] ^= 0xFF  # mangle inside the first block
        bad.append(bytes(b))
    (_, referr), (_, goterr) = _decode_both(bad, counts, TINY, W=64)
    np.testing.assert_array_equal(np.asarray(goterr), np.asarray(referr))


def test_pallas_dma_words_geometry(rng):
    """The dma_words TPU geometry (single-buffered VMEM scratch filled by
    one async copy per lane tile — the production default on chip) must be
    bit-identical to the pipelined path."""
    spf = TINY.samples_per_frame
    wav = np.concatenate(
        [make_mixed(rng, spf), rng.integers(-32768, 32768, spf)]
    ).astype(np.int16)
    payloads, counts = _frames_of(oracle.encode(wav, TINY))
    import jax.numpy as jnp

    from x3_tpu.ops.decode_kernel import decode_frames
    from x3_tpu.ops.decode_pallas import decode_frames_pallas

    W = 64
    buf = np.zeros((len(payloads), W * 4), np.uint8)
    for i, p in enumerate(payloads):
        buf[i, : len(p)] = np.frombuffer(p, np.uint8)
    ns = jnp.asarray(counts, jnp.int32)
    pls = jnp.asarray([len(p) for p in payloads], jnp.int32)
    ref, referr = decode_frames(jnp.asarray(buf), ns, pls, TINY)
    got, goterr = decode_frames_pallas(
        jnp.asarray(buf), ns, pls, TINY, interpret=True, geometry=(2, 256, True)
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(goterr), np.asarray(referr))


def test_pallas_select_structures(rng):
    """The window-select structure variants (tlP two-level factored one-hot,
    funnel compare-halving — sweepable via geometry[3]) must be bit-identical
    to the default linear one-hot sweep.  W=256 gives the tiny geometry
    enough slabs (Wg=6, qmax=4) for multi-stage tl/funnel paths."""
    spf = TINY.samples_per_frame
    wav = np.concatenate(
        [make_mixed(rng, spf), rng.integers(-32768, 32768, spf)]
    ).astype(np.int16)
    payloads, counts = _frames_of(oracle.encode(wav, TINY))
    import jax.numpy as jnp

    from x3_tpu.ops.decode_pallas import decode_frames_pallas

    W = 256
    buf = np.zeros((len(payloads), W * 4), np.uint8)
    for i, p in enumerate(payloads):
        buf[i, : len(p)] = np.frombuffer(p, np.uint8)
    ns = jnp.asarray(counts, jnp.int32)
    pls = jnp.asarray([len(p) for p in payloads], jnp.int32)
    ref, referr = decode_frames_pallas(
        jnp.asarray(buf), ns, pls, TINY, interpret=True, geometry=(2, 256, False)
    )
    for sel in ("tl2", "tl4", "funnel", "dyn"):
        got, goterr = decode_frames_pallas(
            jnp.asarray(buf), ns, pls, TINY,
            interpret=True, geometry=(2, 256, False, sel),
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref), err_msg=sel)
        np.testing.assert_array_equal(np.asarray(goterr), np.asarray(referr), err_msg=sel)


def test_auto_geometry_invariants():
    """The TPU routing table: measured rung optima, Mosaic's 8-divisible
    out-block constraint, the scoped-VMEM budget, and the too-wide
    fallback to the XLA scan."""
    from x3_tpu.ops.decode_pallas import (
        _auto_geometry,
        _pad_words,
        pallas_decode_fits,
    )
    from x3_tpu.ops.encode_kernel import block_buffer_words, frame_geometry

    params = Parameters()
    _, B, L, WFULL = frame_geometry(params)
    WIN = block_buffer_words(params)
    maxadv = (6 + 16 * L + 31) // 32 + 1
    # Measured optima (v5e, F=6144 — ROADMAP R5-2: the round-5 dyn
    # bounded-dynamic-sweep pins, +17-86% over the round-4 structures)
    # are reproduced exactly.
    assert _auto_geometry(512, B, L, 6144, WIN, maxadv) == (8, 2048, True, "dyn")
    assert _auto_geometry(1024, B, L, 6144, WIN, maxadv) == (8, 2048, True, "dyn")
    assert _auto_geometry(2048, B, L, 6144, WIN, maxadv) == (8, 1024, True, "dyn")
    assert _auto_geometry(4096, B, L, 6144, WIN, maxadv) == (24, 512, True, "dyn")
    assert _auto_geometry(WFULL, B, L, 6144, WIN, maxadv) == (8, 512, True, "dyn")
    # Non-rung widths / foreign L stay on the compile-safe legacy table
    # (dyn's compile-crash boundary sits just above the verified pins).
    assert _auto_geometry(3072, B, L, 6144, WIN, maxadv)[3] == "linear"
    assert _auto_geometry(512, B, 60, 6144, WIN, maxadv)[3] == "linear"
    for W in (512, 1024, 2048, 4096, WFULL):
        for F in (512, 768, 2048, 6144):
            got = _auto_geometry(W, B, L, F, WIN, maxadv)
            assert got is not None
            U, TF, dma, sel = got
            assert (U * L) % 8 == 0 and dma
            assert sel in ("linear", "tl4", "dyn")
            K = max(2, -(-(64 - 1 + WIN + U * maxadv) // 64))
            w_pad = W + _pad_words(W, 64, K)
            assert w_pad * TF * 4 + K * 64 * TF * 4 + U * L * TF * 4 <= 14_500_000
            assert TF >= 256
    # Small batches clamp the tile so padding can't dominate.
    assert _auto_geometry(512, B, L, 512, WIN, maxadv)[1] == 512
    # Absurdly wide geometry-general buffers stay on the scan.
    assert _auto_geometry(40_000, B, L, 6144, WIN, maxadv) is None
    assert not pallas_decode_fits(params, 40_000, None, 6144)
    assert not pallas_decode_fits(params, 512, None, 256)  # tiny batch
    assert pallas_decode_fits(params, 512, None, 6144)
    # Foreign-geometry overrides route by their own L.
    big = Parameters(block_len=60, blocks_per_frame=5)
    assert not pallas_decode_fits(big, 512, None, 6144)


def test_pallas_rejects_scan_geometry():
    big = Parameters(block_len=60, blocks_per_frame=5)
    import jax.numpy as jnp

    from x3_tpu.ops.decode_pallas import decode_frames_pallas

    with pytest.raises(NotImplementedError):
        decode_frames_pallas(
            jnp.zeros((1, 256), jnp.uint8),
            jnp.ones(1, jnp.int32),
            jnp.ones(1, jnp.int32),
            big,
            interpret=True,
        )


def test_foreign_device_kind_gets_conservative_geometry(monkeypatch):
    """_auto_geometry's pins are v5e measurements; a foreign TPU kind must
    fall back to the conservative geometry (U=16, linear select) with a
    one-time warning instead of silently running mis-tuned (VERDICT r4
    weak 3)."""
    import warnings

    from x3_tpu.ops import decode_pallas as dp
    from x3_tpu.ops.encode_kernel import block_buffer_words, frame_geometry

    params = Parameters()
    _, B, L, _ = frame_geometry(params)
    WIN = block_buffer_words(params)
    maxadv = (6 + 16 * L + 31) // 32 + 1

    monkeypatch.setenv("X3_DEVICE_KIND_OVERRIDE", "TPU v6 lite")
    monkeypatch.setattr(dp, "_warned_foreign_kind", False)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        for W in (512, 2048, 4096):
            got = dp._auto_geometry(W, B, L, 6144, WIN, maxadv)
            assert got is not None
            U, _, dma, sel = got
            assert U == 16 and dma and sel == "linear"
    assert any("pallas_decode_sweep" in str(w.message) for w in rec)
    # The warning fires once, not per call.
    assert sum("pallas_decode_sweep" in str(w.message) for w in rec) == 1

    # Back on the tuned kind the table is restored.
    monkeypatch.setenv("X3_DEVICE_KIND_OVERRIDE", "TPU v5 lite")
    assert dp._auto_geometry(4096, B, L, 6144, WIN, maxadv) == (24, 512, True, "dyn")
