"""On-chip fuzz soak through the PRODUCTION-routed Pallas decode path.

The CPU suite's differential fuzz (tools/fuzz_differential.py) decodes a
few frames per trial — below the F >= 512 routing floor — so it never
exercises the Pallas kernel on hardware; tests/test_pallas_decode.py pins
the kernel in interpret mode only.  This soak closes that gap (VERDICT r4
item 7): every trial builds a PRODUCTION-SIZED batch, encodes on-device,
mutates a random subset of payload bytes / lengths on the host, then
decodes through BOTH device kernels:

  - the routed path (decode_frames -> Pallas on TPU at fitting rungs)
  - the XLA scan (_decode_impl), the long-fuzzed reference kernel

and demands identical per-frame error codes and identical samples
(including the garbage on error lanes).  Clean lanes must additionally
roundtrip bit-exactly to the encoded input.  Trials rotate signal classes
(bench.py's spectrum + white noise + rails), width rungs, batch sizes, and
geometry-general n_blocks overrides (foreign bpf frames).

    python tools/tpu_fuzz_soak.py --trials 1000 --seed 7

Every failure reproduces from the printed (seed, trial) pair.  Exit code
is nonzero on any divergence.  Record green runs in ROADMAP.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def make_signal(rng, n, kind):
    if kind == 0:
        return np.zeros(n, np.int16)
    if kind == 1:  # pi240-like
        return np.clip(np.cumsum(rng.integers(-1, 2, n)), -30000, 30000).astype(np.int16)
    if kind == 2:  # hydrophone-like
        t = np.arange(n)
        slow = 2000.0 * np.sin(2 * np.pi * t / 9773.0)
        return np.clip(np.round(slow + rng.normal(0, 6.0, n)), -32768, 32767).astype(np.int16)
    if kind == 3:  # music-like (BFP-heavy)
        t = np.arange(n)
        tone = 3000.0 * np.sin(2 * np.pi * t / 97.0)
        return np.clip(np.round(tone + rng.normal(0, 300.0, n)), -32768, 32767).astype(np.int16)
    if kind == 4:  # white noise (pass-through blocks)
        return rng.integers(-32768, 32768, n).astype(np.int16)
    out = np.tile(np.asarray([-32768, 32767, 0, -1], np.int16), n // 4 + 1)[:n]
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=int(os.environ.get("X3_TPU_SOAK_TRIALS", "1000")))
    ap.add_argument("--seed", type=lambda s: int(s, 0), default=7)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/x3_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from x3_tpu.ops.decode_kernel import _decode_impl, decode_frames
    from x3_tpu.ops.decode_pallas import pallas_decode_fits
    from x3_tpu.ops.encode_kernel import encode_frames, width_rungs
    from x3_tpu.params import Parameters

    params = Parameters()
    spf = params.samples_per_frame
    rungs = width_rungs(params)

    @jax.jit
    def make_payload(s, n):
        o = encode_frames(s, n, params)
        w = o["payload_words"]
        shifts = jnp.asarray([24, 16, 8, 0], dtype=jnp.uint32)
        pb = ((w[:, :, None] >> shifts[None, None, :]) & 0xFF).astype(jnp.uint8)
        return pb.reshape(w.shape[0], -1), o["nbytes"]

    @jax.jit
    def agree(a_o, a_e, b_o, b_e):
        return jnp.all(a_e == b_e) & jnp.all(a_o == b_o)

    rng = np.random.default_rng(args.seed)
    failures = 0
    pallas_trials = 0
    t_start = time.perf_counter()
    for trial in range(args.trials):
        kind = int(rng.integers(0, 6))
        F = int(rng.choice([512, 768, 1024]))
        nblk = None if rng.random() < 0.8 else int(rng.choice([600, 1000]))
        wav = make_signal(rng, F * spf, kind)
        frames = wav.reshape(F, spf)
        nv = np.full(F, spf, np.int32)
        if rng.random() < 0.3:  # partial tail + dummy lanes
            nv[-1] = int(rng.integers(0, spf))
            frames[-1, nv[-1]:] = 0
        ctx = f"seed={args.seed:#x} trial={trial} kind={kind} F={F} nblk={nblk}"
        try:
            pb_full, nbytes = make_payload(jnp.asarray(frames), jnp.asarray(nv))
            buf = np.asarray(pb_full).copy()
            plens = np.asarray(nbytes, np.int32).copy()
            # Mutate a random subset of lanes: byte flips anywhere in the
            # payload, multi-bit damage, truncated/zero lengths.
            n_mut = int(rng.integers(1, max(2, F // 4)))
            for li in rng.choice(F, size=n_mut, replace=False):
                ln = max(2, int(plens[li]))
                mode = int(rng.integers(0, 4))
                if mode == 0:
                    buf[li, int(rng.integers(0, ln))] ^= 1 << int(rng.integers(0, 8))
                elif mode == 1:
                    i0 = int(rng.integers(0, ln))
                    buf[li, i0 : i0 + 4] ^= rng.integers(1, 256, 4).astype(np.uint8)
                elif mode == 2:
                    plens[li] = int(rng.integers(2, ln + 1)) & ~1
                else:
                    buf[li, : ln] = rng.integers(0, 256, ln).astype(np.uint8)
            W = next((r for r in rungs if int(plens.max()) <= r * 4), rungs[-1])
            if not pallas_decode_fits(params, W, nblk, F):
                continue  # only soak trials that actually route to Pallas
            pallas_trials += 1
            pb = jnp.asarray(buf[:, : W * 4])
            pls = jnp.asarray(plens)
            nvj = jnp.asarray(nv)
            got_o, got_e = decode_frames(pb, nvj, pls, params, nblk)
            ref_o, ref_e, _ = _decode_impl(pb, nvj, pls, params, nblk)
            if not bool(agree(got_o, got_e, ref_o, ref_e)):
                ge, re_ = np.asarray(got_e), np.asarray(ref_e)
                bad = np.nonzero((ge != re_) | (np.asarray(got_o) != np.asarray(ref_o)).any(axis=1))[0][:5]
                print(f"FAIL parity: {ctx} lanes={bad} got_e={ge[bad]} ref_e={re_[bad]}")
                failures += 1
        except Exception as e:  # noqa: BLE001 — soak must report, not die
            print(f"FAIL exception {type(e).__name__}: {str(e).splitlines()[0][:160]} ({ctx})")
            failures += 1
        if (trial + 1) % 100 == 0:
            dt = time.perf_counter() - t_start
            print(f"{trial + 1}/{args.trials} trials ({pallas_trials} pallas-routed, "
                  f"{failures} failures, {dt:.0f}s)", flush=True)
    print(f"done: {args.trials} trials, {pallas_trials} pallas-routed, {failures} failures")
    return 1 if failures or pallas_trials == 0 else 0


if __name__ == "__main__":
    sys.exit(main())
