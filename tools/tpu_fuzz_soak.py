"""On-chip fuzz soak through the PRODUCTION-routed Pallas decode path.

The CPU suite's differential fuzz (tools/fuzz_differential.py) decodes a
few frames per trial — below the F >= 512 routing floor — so it never
exercises the Pallas kernel on hardware; tests/test_pallas_decode.py pins
the kernel in interpret mode only.  This soak closes that gap (VERDICT r4
item 7): every trial decodes a PRODUCTION-SIZED mutated batch through
BOTH device kernels:

  - the routed path (decode_frames -> Pallas on TPU at fitting rungs)
  - the XLA scan (_decode_impl), the long-fuzzed reference kernel

and demands identical per-frame error codes and identical samples
(including the garbage on error lanes).  Mutations are applied ON DEVICE
(byte-flip scatters from tiny host index arrays, device-PRNG wild lanes,
truncated payload lengths) and the comparison is a device scalar — no
bulk host<->device transfer per trial, which is what the tunnel's
~20-30 MB/s links cannot afford.  Trials rotate signal classes
(bench.py's spectrum + white noise + rails), width rungs (via the class),
batch sizes, and geometry-general n_blocks overrides (foreign bpf).

    python tools/tpu_fuzz_soak.py --trials 1000 --seed 7

Every failure reproduces from the printed (seed, trial) pair.  Exit code
is nonzero on any divergence (or if nothing routed to Pallas).  Record
green runs in ROADMAP.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

MAXMUT = 64  # byte-flip scatter slots per trial (padded, masked by lane < F)


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

    @functools.partial(jax.jit, static_argnums=(2,))
    def make_payload(s, n, W):
        o = encode_frames(s, n, params)
        w = o["payload_words"][:, :W]
        shifts = jnp.asarray([24, 16, 8, 0], dtype=jnp.uint32)
        pb = ((w[:, :, None] >> shifts[None, None, :]) & 0xFF).astype(jnp.uint8)
        return pb.reshape(w.shape[0], -1), o["nbytes"]

    @functools.partial(jax.jit, static_argnums=(6,))
    def mutate_and_check(pb, nv, plens, flips, wild_mask, key, nblk):
        """Apply mutations on device, decode through both kernels, return
        (all_agree, n_error_lanes_ref)."""
        lane, pos, val = flips[:, 0], flips[:, 1], flips[:, 2].astype(jnp.uint8)
        flip = jnp.zeros_like(pb).at[lane, pos].set(val, mode="drop")
        pb2 = pb ^ flip
        wild = jax.random.randint(key, pb.shape, 0, 256, jnp.uint8)
        pb2 = jnp.where(wild_mask[:, None], wild, pb2)
        got_o, got_e = decode_frames(pb2, nv, plens, params, nblk)
        ref_o, ref_e, _ = _decode_impl(pb2, nv, plens, params, nblk)
        agree = jnp.all(got_e == ref_e) & jnp.all(got_o == ref_o)
        return agree, jnp.sum((ref_e != 0).astype(jnp.int32))

    rng = np.random.default_rng(args.seed)
    failures = 0
    pallas_trials = 0
    err_lanes_total = 0
    # Pre-encode one clean payload per (kind, F, nblk-ness) combo; mutations
    # vary per trial on device, so the base payload can be reused.
    base_cache: dict = {}
    t_start = time.perf_counter()
    for trial in range(args.trials):
        kind = int(rng.integers(0, 6))
        F = int(rng.choice([512, 768, 1024]))
        nblk = None if rng.random() < 0.8 else int(rng.choice([600, 1000]))
        ctx = f"seed={args.seed:#x} trial={trial} kind={kind} F={F} nblk={nblk}"
        try:
            ck = (kind, F)
            if ck not in base_cache:
                wav = make_signal(rng, F * spf, kind)
                frames = wav.reshape(F, spf)
                nv = np.full(F, spf, np.int32)
                nv[-1] = int(rng.integers(0, spf))  # partial tail lane
                frames[-1, nv[-1]:] = 0
                fr_d = jax.device_put(frames)
                nv_d = jax.device_put(nv)
                _, nbytes = make_payload(fr_d, nv_d, rungs[-1])
                plens_h = np.asarray(nbytes, np.int32)
                W = next((r for r in rungs if int(plens_h.max()) <= r * 4), rungs[-1])
                pb, _ = make_payload(fr_d, nv_d, W)
                jax.block_until_ready(pb)
                base_cache[ck] = (pb, nv_d, plens_h, W)
            pb, nv_d, plens_h, W = base_cache[ck]
            if not pallas_decode_fits(params, W, nblk, F):
                continue  # only soak trials that actually route to Pallas
            pallas_trials += 1
            # Host-side tiny mutation plan: byte flips, truncations, wild lanes.
            n_mut = int(rng.integers(1, MAXMUT))
            flips = np.zeros((MAXMUT, 3), np.int32)
            flips[:, 0] = F  # pad slots: guaranteed OOB, dropped by the scatter
            for i in range(n_mut):
                li = int(rng.integers(0, F))
                ln = max(2, int(plens_h[li]))
                flips[i] = (li, int(rng.integers(0, min(ln, W * 4))),
                            int(rng.integers(1, 256)))
            plens = plens_h.copy()
            for li in rng.choice(F, size=max(1, F // 16), replace=False):
                ln = max(2, int(plens[li]))
                plens[li] = int(rng.integers(2, ln + 1)) & ~1
            wild_mask = np.zeros(F, bool)
            wild_mask[rng.choice(F, size=max(1, F // 32), replace=False)] = True
            agree, nerr = mutate_and_check(
                pb, nv_d, jax.device_put(plens), jax.device_put(flips),
                jax.device_put(wild_mask), jax.random.PRNGKey(trial), nblk,
            )
            err_lanes_total += int(nerr)
            if not bool(agree):
                print(f"FAIL parity: {ctx}", flush=True)
                failures += 1
        except Exception as e:  # noqa: BLE001 — soak must report, not die
            print(f"FAIL exception {type(e).__name__}: {str(e).splitlines()[0][:160]} ({ctx})", flush=True)
            failures += 1
        if (trial + 1) % 100 == 0:
            dt = time.perf_counter() - t_start
            print(f"{trial + 1}/{args.trials} trials ({pallas_trials} pallas-routed, "
                  f"{err_lanes_total} error lanes, {failures} failures, {dt:.0f}s)",
                  flush=True)
    print(f"done: {args.trials} trials, {pallas_trials} pallas-routed, "
          f"{err_lanes_total} error lanes, {failures} failures")
    return 1 if failures or pallas_trials == 0 else 0


if __name__ == "__main__":
    sys.exit(main())
