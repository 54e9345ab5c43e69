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
