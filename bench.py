"""Benchmark the TPU X3 codec against the reference's CPU numbers.

Prints ONE JSON line:
  {"metric": "encode_throughput", "value": <MB/s>, "unit": "MB/s",
   "vs_baseline": <value / 80 MB/s>, ...details}

Baseline: the Rust reference encodes ~80 MB/s and decodes ~52 MB/s
single-core (BASELINE.md, /root/reference/test/timings.csv).  The
north-star target is >1 GB/s encode per TPU chip with bit-exact output.

Timing methodology: every measured call is a jitted function whose scalar
result is materialized on host (int(...)), which forces completion even on
backends where block_until_ready on bulk outputs is unreliable.  Device
throughput is measured with inputs resident on device; the end-to-end file
throughput (including host framing, transfers, and assembly) is reported
separately — on this sandbox's tunneled TPU the transfer path dominates it.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# For subprocesses; the in-process config is set in main() (jax may already
# be imported by the sandbox sitecustomize, making env vars too late).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/x3_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BASELINE_ENCODE_MBS = 80.0  # timings.csv EH120: 72.0 MB / 0.90 s
BASELINE_DECODE_MBS = 52.0  # timings.csv EH120 decode


def make_corpus(n_frames: int, spf: int, seed: int = 7) -> np.ndarray:
    """Low-entropy hydrophone-like corpus (drift + small noise), matching the
    workload class of the reference's timings.csv."""
    rng = np.random.default_rng(seed)
    n = n_frames * spf
    t = np.arange(n, dtype=np.float64)
    slow = 2000.0 * np.sin(2 * np.pi * t / 9773.0)
    noise = rng.normal(0.0, 6.0, n)
    return np.clip(np.round(slow + noise), -32768, 32767).astype(np.int16)


def make_class_corpus(name: str, n_frames: int, spf: int, seed: int = 7) -> np.ndarray:
    """Synthetic corpora spanning the reference's benchmark spectrum
    (/root/reference/test/timings.csv): 'music' ~1.3x (wideband, BFP-heavy,
    full-width rungs), 'hydrophone' ~2.9x (the headline class), 'pi240'
    ~7x (very compressible, short Rice codes — timings.csv:13 class)."""
    rng = np.random.default_rng(seed)
    n = n_frames * spf
    if name == "hydrophone":
        return make_corpus(n_frames, spf, seed)
    if name == "music":
        # Wideband program material: tonal base + broadband noise, diffs
        # ~10-11 bits -> mostly BFP blocks; calibrated to the reference's
        # music-class ratio (~1.33x, timings.csv:2-6).
        t = np.arange(n, dtype=np.float64)
        tone = 3000.0 * np.sin(2 * np.pi * t / 97.0) + 2000.0 * np.sin(2 * np.pi * t / 23.0)
        noise = rng.normal(0.0, 300.0, n)
        return np.clip(np.round(tone + noise), -32768, 32767).astype(np.int16)
    if name == "pi240":
        # Very quiet sensor floor: tiny first differences (mostly 0/±1),
        # Rice-0/1 codes a few bits long.
        d = np.round(rng.normal(0.0, 0.45, n)).astype(np.int64)
        return np.clip(np.cumsum(d), -30000, 30000).astype(np.int16)
    raise ValueError(name)


def timed(fn, args, reps: int, passes: int = 3) -> float:
    """Best-of-N rep-amortized timing: min over `passes` independent
    `reps`-rep averages.  A single pass is weather on this host — its
    hypervisor steal phases inflate one-shot averages by up to ±2x
    (BENCH_r04 device encode read 13% under the builder's session sweeps
    for unchanged kernels; VERDICT r4 weak 2) — while the min of >= 3
    back-to-back passes tracks the builder's A/B methodology."""
    int(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(reps)]
        int(outs[-1])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def wait_for_backend(jax, jnp, deadline_s: float) -> None:
    """Block until the device backend answers a trivial computation.

    The sandbox's tunneled TPU goes through outages where every call fails
    UNAVAILABLE (connection refused) and then recovers on its own; the driver
    runs this script exactly once per round, so a transient outage would lose
    the round's bench artifact.  Retry a tiny probe with backoff up to the
    deadline before giving up."""
    t0 = time.perf_counter()
    delay = 15.0
    while True:
        try:
            int(jax.jit(jnp.sum)(jnp.arange(8)))
            return
        except Exception as e:  # noqa: BLE001 - backend errors vary by platform
            if time.perf_counter() - t0 + delay > deadline_s:
                raise
            print(f"# backend unavailable ({type(e).__name__}); retrying in {delay:.0f}s", flush=True)
            time.sleep(delay)
            delay = min(delay * 1.5, 120.0)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/x3_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    wait_for_backend(jax, jnp, float(os.environ.get("X3_BENCH_TUNNEL_WAIT", "1800")))

    from x3_tpu.models import oracle
    from x3_tpu.models.encoder import encode
    from x3_tpu.ops.decode_kernel import decode_frames
    from x3_tpu.ops.encode_kernel import (
        block_width_rungs,
        encode_frames,
        fits_block_width,
        fits_width,
        frame_geometry,
        width_rungs,
    )
    from x3_tpu.params import Parameters

    params = Parameters()
    spf = params.samples_per_frame
    S, B, L, W = frame_geometry(params)

    # Encode's sweet spot moved to F=768 with the compact width + compact
    # block-buffer rungs (11.0 GB/s at F=768 vs 9.6 at F=512 / 8.8 at
    # F=1024 on the hydrophone corpus).
    batch_frames = int(os.environ.get("X3_BENCH_BATCH", "768"))
    # Per-call dispatch on the tunneled TPU costs ~1-2 ms; enough reps
    # amortize it so the number reflects device time, not RPC latency.
    reps = int(os.environ.get("X3_BENCH_REPS", "50"))
    # Decode batches wider than encode: the Pallas kernel tiles lanes so
    # there is no wide-batch cliff, and F=6144 sits near the per-class
    # optimum (measured round 4: pi240 +12% at F>=12288 but hydrophone,
    # the headline class, -7% there; the XLA-scan fallback's F=8192 spill
    # is handled by in-jit sub-batching either way).
    dec_batch = int(os.environ.get("X3_BENCH_DECODE_BATCH", "6144"))

    @jax.jit
    def make_payload_fn(s, n):
        o = encode_frames(s, n, params)
        w = o["payload_words"]
        shifts = jnp.asarray([24, 16, 8, 0], dtype=jnp.uint32)
        pb = ((w[:, :, None] >> shifts[None, None, :]) & 0xFF).astype(jnp.uint8)
        return pb.reshape(w.shape[0], -1), o["nbytes"]  # nbytes kept for debugging

    def bench_class(wav: np.ndarray):
        """Device encode + decode MB/s for one corpus at its adaptive
        rungs (the specialization models/encoder.py steady-states on)."""
        frames = wav.reshape(-1, spf)
        n_valid = np.full(len(frames), spf, np.int32)
        dev_frames = jax.device_put(frames[:batch_frames])
        dev_nvalid = jax.device_put(n_valid[:batch_frames])
        in_mb = batch_frames * spf * 2 / 1e6

        # --- device encode (input-resident, scalar-synced) ---
        probe = encode_frames(dev_frames, dev_nvalid, params)
        probe_nbytes = np.asarray(probe["nbytes"])
        probe_blockfit = np.asarray(probe["blockfit_bits"])
        w_rung = next(w for w in width_rungs(params) if fits_width(probe_nbytes, w, params))
        nw_rung = next(
            nw for nw in block_width_rungs(params) if fits_block_width(probe_blockfit, nw, params)
        )
        enc_sync = jax.jit(
            lambda s, n: (
                lambda o: jnp.sum(o["crc"]) + jnp.sum(o["total_bits"]) + jnp.sum(o["payload_words"].astype(jnp.int32))
            )(encode_frames(s, n, params, "block", w_rung, nw_rung))
        )
        dev_encode_mbs = in_mb / timed(enc_sync, (dev_frames, dev_nvalid), reps)

        # --- device decode (payload bytes are produced on-device so the
        #     tunnel's slow D2H path never enters the measurement) ---
        dec_frames_in = jax.device_put(frames[:dec_batch])
        dec_nvalid = jax.device_put(n_valid[:dec_batch])
        dev_payload, dev_plens = make_payload_fn(dec_frames_in, dec_nvalid)
        # Decode at the compact width rung the file pipeline would pick
        # (lens are known before decode; decode_frames infers W from the
        # buffer).
        dec_w = next(
            r for r in width_rungs(params) if int(np.asarray(dev_plens).max(initial=0)) <= r * 4
        )
        dev_payload = jax.jit(lambda p: p[:, : dec_w * 4])(dev_payload)
        jax.block_until_ready(dev_payload)
        comp_mb = float(np.asarray(probe["nbytes"]).sum()) / 1e6
        dec_mb = dec_batch * spf * 2 / 1e6
        dec_sync = jax.jit(
            lambda pb, n, pl: (lambda de: jnp.sum(de[0].astype(jnp.int32)) + de[1].sum())(
                decode_frames(pb, n, pl, params)
            )
        )
        dev_decode_mbs = dec_mb / timed(dec_sync, (dev_payload, dec_nvalid, dev_plens), reps)

        # --- decode correctness on the bench corpus (compared on device) ---
        @jax.jit
        def check(pb, n, pl, s):
            de, err = decode_frames(pb, n, pl, params)
            return jnp.all(de == s) & ~err.any()

        decode_exact = bool(check(dev_payload, dec_nvalid, dev_plens, dec_frames_in))
        ratio = in_mb / (float(probe_nbytes.sum()) / 1e6)
        return {
            "encode_mbs": round(dev_encode_mbs, 1),
            "decode_mbs": round(dev_decode_mbs, 1),
            "ratio": round(ratio, 2),
            "decode_exact": decode_exact,
            "width_rung": w_rung,
            "block_width_rung": nw_rung,
            "decode_width_rung": dec_w,
            "compressed_mb": round(comp_mb, 2),
        }

    def decode_parity_check() -> bool:
        """On-chip Pallas/scan decode parity on a mutated batch: the routed
        path (Pallas on TPU) and the XLA scan must agree on per-frame error
        codes AND samples (including garbage lanes) — the
        tools/tpu_decode_parity.py rotation folded into every driver run
        (VERDICT r4 item 4).  On CPU both sides route to the scan and the
        check degenerates to self-consistency (still reported)."""
        from x3_tpu.ops.decode_kernel import _decode_impl

        Fp = 768
        wavp = make_class_corpus("hydrophone", Fp, spf)
        frames = jax.device_put(wavp.reshape(-1, spf)[:Fp])
        nv = jax.device_put(np.full((Fp,), spf, np.int32))
        pb_full, nbytes = make_payload_fn(frames, nv)
        buf = np.asarray(pb_full).copy()
        plens = np.asarray(nbytes, np.int32).copy()
        for i in range(Fp):
            ln, m = int(plens[i]), i % 6
            if m == 0:
                buf[i, 2] ^= 0xFF
            elif m == 1:
                buf[i, ln // 2] ^= 0x81
            elif m == 2:
                buf[i, ln - 1] ^= 0x0F
            elif m == 3:
                plens[i] = max(2, ln // 2)
        Wp = next(r for r in width_rungs(params) if int(plens.max()) <= r * 4)
        pb = jax.device_put(buf[:, : Wp * 4])
        pls = jax.device_put(plens)
        got_o, got_e = decode_frames(pb, nv, pls, params)
        ref_o, ref_e, _ = _decode_impl(pb, nv, pls, params, None)
        ok = bool(jnp.all(got_e == ref_e) & jnp.all(got_o == ref_o))
        # The rotation must actually produce error lanes, or the check is vacuous.
        return ok and int(np.asarray(ref_e != 0).sum()) > 0

    n_corpus_frames = max(batch_frames, dec_batch)
    wav = make_class_corpus("hydrophone", n_corpus_frames, spf)
    in_mb = batch_frames * spf * 2 / 1e6

    # Per-class spread across the reference's benchmark spectrum
    # (timings.csv holds 78-90 MB/s encode across ALL classes; the device
    # pipeline must state its own spread just as honestly).
    classes = {}
    for cname in ("hydrophone", "music", "pi240"):
        cwav = wav if cname == "hydrophone" else make_class_corpus(cname, n_corpus_frames, spf)
        classes[cname] = bench_class(cwav)

    decode_parity_ok = decode_parity_check()

    hydro = classes["hydrophone"]
    dev_encode_mbs = hydro["encode_mbs"]
    dev_decode_mbs = hydro["decode_mbs"]
    decode_exact = hydro["decode_exact"]
    w_rung, nw_rung, dec_w = hydro["width_rung"], hydro["block_width_rung"], hydro["decode_width_rung"]
    comp_mb = hydro["compressed_mb"]

    # --- end-to-end jax encode (host framing + transfers + assembly) ---
    e2e_mb = wav.nbytes / 1e6
    res = encode(wav, params, batch_frames=batch_frames)  # warm
    t0 = time.perf_counter()
    res = encode(wav, params, batch_frames=batch_frames)
    e2e_jax_encode_mbs = e2e_mb / (time.perf_counter() - t0)
    ratio = wav.nbytes / len(res.data)

    # --- bit-exactness spot check vs the oracle (first 2 frames) ---
    n_check = 2 * spf
    exact = res.data.startswith(oracle.encode(wav[:n_check], params))

    # --- end-to-end FILE conversion, auto-routed engine, PER CLASS (the
    #     reference's 80/52 MB/s baselines are end-to-end file numbers,
    #     timings.csv:74).  Best-of-N back-to-back per direction: this
    #     sandbox host has hypervisor steal-time phases that poison
    #     single-shot wall timings by up to ±2x (ROADMAP round-3 notes);
    #     best-of-5 matches the builder's A/B methodology so BENCH_rN e2e
    #     numbers are comparable across rounds. ---
    import tempfile

    from x3_tpu.files import wav_to_x3a, x3a_to_wav
    from x3_tpu.utils.wav import read_wav, write_wav

    e2e_reps = int(os.environ.get("X3_BENCH_E2E_REPS", "5"))

    def bench_e2e(cwav: np.ndarray) -> dict:
        mb = cwav.nbytes / 1e6
        with tempfile.TemporaryDirectory() as td:
            wp, xp, bp = f"{td}/b.wav", f"{td}/b.x3a", f"{td}/back.wav"
            write_wav(wp, cwav, 96000)
            wav_to_x3a(wp, xp)  # warm (builds the native lib on first use)
            enc_ts, dec_ts = [], []
            for _ in range(e2e_reps):
                t0 = time.perf_counter()
                wav_to_x3a(wp, xp)
                enc_ts.append(time.perf_counter() - t0)
            errors = x3a_to_wav(xp, bp)  # warm
            for _ in range(e2e_reps):
                t0 = time.perf_counter()
                errors = x3a_to_wav(xp, bp)
                dec_ts.append(time.perf_counter() - t0)
            back, _ = read_wav(bp)
            return {
                "e2e_encode_mbs": round(mb / min(enc_ts), 1),
                "e2e_decode_mbs": round(mb / min(dec_ts), 1),
                "e2e_exact": bool(errors == 0 and np.array_equal(back, cwav)),
            }

    for cname in classes:
        cwav = wav if cname == "hydrophone" else make_class_corpus(cname, n_corpus_frames, spf)
        classes[cname].update(bench_e2e(cwav))

    e2e_encode_mbs = classes["hydrophone"]["e2e_encode_mbs"]
    e2e_decode_mbs = classes["hydrophone"]["e2e_decode_mbs"]
    e2e_exact = all(c["e2e_exact"] for c in classes.values())

    print(json.dumps({
        "metric": "encode_throughput",
        "value": round(dev_encode_mbs, 1),
        "unit": "MB/s",
        "vs_baseline": round(dev_encode_mbs / BASELINE_ENCODE_MBS, 2),
        "device_decode_mbs": round(dev_decode_mbs, 1),
        "decode_vs_baseline": round(dev_decode_mbs / BASELINE_DECODE_MBS, 2),
        "e2e_encode_mbs": round(e2e_encode_mbs, 1),
        "e2e_decode_mbs": round(e2e_decode_mbs, 1),
        "e2e_vs_baseline": round(e2e_encode_mbs / BASELINE_ENCODE_MBS, 2),
        "e2e_jax_encode_mbs": round(e2e_jax_encode_mbs, 1),
        "e2e_exact": bool(e2e_exact),
        "compression_ratio": round(ratio, 2),
        "bit_exact": bool(exact),
        "decode_exact": decode_exact,
        "decode_parity_ok": bool(decode_parity_ok),
        "batch_frames": batch_frames,
        "encode_width_rung": w_rung,
        "encode_block_width_rung": nw_rung,
        "decode_width_rung": dec_w,
        "input_mb": round(in_mb, 1),
        "compressed_mb": round(comp_mb, 2),
        "classes": classes,
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
