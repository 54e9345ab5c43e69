"""Measure the fused Pallas encode kernel vs the default XLA encode.

Per class (bench.py's spectrum), at that class's production W rung:
  - baseline: encode_frames (XLA front + pair pack + MXU merge + CRC)
  - fused:    the same encode with the pack replaced by
              ops/encode_fused_pallas.py at each candidate geometry
              (U, TF, K, sweep)

Rows report input MB/s (scalar-synced, rep-amortized, best-of-N passes)
and bit-exactness of every output vs the baseline (words compared on the
fitting lanes only — the escalation contract).  Run on the target chip:

    python tools/fused_encode_sweep.py
    SWEEP_F=768 SWEEP_REPS=30 SWEEP_PASSES=3 python tools/fused_encode_sweep.py
    SWEEP_GEOS="{'pi240': [None, (16, 1024, 5, 'dyn')]}" python tools/fused_encode_sweep.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/x3_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import make_class_corpus
    from x3_tpu.ops.encode_fused_pallas import (
        _auto_geometry,
        _nb_words,
        encode_frames_fused_words,
    )
    from x3_tpu.ops.encode_kernel import (
        block_width_rungs,
        encode_frames,
        fits_block_width,
        fits_width,
        frame_geometry,
        width_rungs,
    )
    from x3_tpu.ops.crc_jax import crc16_words_jax
    from x3_tpu.params import Parameters

    params = Parameters()
    spf = params.samples_per_frame
    _, B, L, WFULL = frame_geometry(params)
    F = int(os.environ.get("SWEEP_F", "768"))
    reps = int(os.environ.get("SWEEP_REPS", "30"))
    passes = int(os.environ.get("SWEEP_PASSES", "3"))

    def timed(fn, args):
        int(fn(*args))
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(reps)]
            int(outs[-1])
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    G = 64
    NB = _nb_words(L)
    maxadv = NB + 1

    def k_of(u):
        return max(2, -(-(G - 1 + u * maxadv + NB) // G))

    # Candidates per class; None = current _auto_geometry.
    CANDIDATES = {
        "pi240": [None]
        + [(u, tf, k_of(u), sw) for u in (8, 16) for tf in (1024, 512)
           for sw in ("dyn", "linear")],
        "hydrophone": [None]
        + [(u, tf, k_of(u), sw) for u in (8, 16) for tf in (1024, 512)
           for sw in ("dyn", "linear")],
        "music": [None]
        + [(u, tf, k_of(u), sw) for u in (8, 16) for tf in (512, 256)
           for sw in ("dyn", "linear")],
    }
    if os.environ.get("SWEEP_GEOS"):
        import ast

        CANDIDATES = ast.literal_eval(os.environ["SWEEP_GEOS"])

    mb = F * spf * 2 / 1e6
    for cname, geos in CANDIDATES.items():
        if cname == "noise":
            # Incompressible: pass-through blocks, lands on the FULL width
            # rung (the escalation worst case).
            wav = np.random.default_rng(5).integers(
                -32768, 32768, F * spf
            ).astype(np.int16)
        else:
            wav = make_class_corpus(cname, F, spf)
        frames = jnp.asarray(wav.reshape(-1, spf)[:F])
        nv = jnp.full((F,), spf, jnp.int32)

        probe = encode_frames(frames, nv, params)
        nb_host = np.asarray(probe["nbytes"])
        bf_host = np.asarray(probe["blockfit_bits"])
        w_rung = next(w for w in width_rungs(params) if fits_width(nb_host, w, params))
        nw_rung = next(
            nw for nw in block_width_rungs(params) if fits_block_width(bf_host, nw, params)
        )
        ref = encode_frames(frames, nv, params, "block", w_rung, nw_rung)
        ref = {k: np.asarray(v) for k, v in ref.items()}

        base_sync = jax.jit(
            lambda s, n: (
                lambda o: jnp.sum(o["crc"]) + jnp.sum(o["total_bits"])
                + jnp.sum(o["payload_words"].astype(jnp.int32))
            )(encode_frames(s, n, params, "block", w_rung, nw_rung))
        )
        dt = timed(base_sync, (frames, nv))
        print(f"{cname:12s} XLA baseline  W={w_rung:5d} NW={nw_rung:2d} "
              f"{mb/dt:9.1f} MB/s", flush=True)

        for geo in geos:
            try:
                def fused_full(s, n, g=geo):
                    words, total_bits, blockfit, stats = encode_frames_fused_words(
                        s, n, params, w_rung, False, g
                    )
                    nb = (total_bits + 7) // 8
                    nb = nb + (nb & 1)
                    crc = crc16_words_jax(words, nb, w_rung)
                    return words, total_bits, blockfit, stats, nb, crc

                sync = jax.jit(
                    lambda s, n: (
                        lambda o: jnp.sum(o[5]) + jnp.sum(o[1])
                        + jnp.sum(o[0].astype(jnp.int32))
                    )(fused_full(s, n))
                )
                dt = timed(sync, (frames, nv))
                words, total_bits, blockfit, stats, nb, crc = jax.jit(fused_full)(frames, nv)
                ok = (
                    np.array_equal(np.asarray(total_bits), ref["total_bits"])
                    and np.array_equal(np.asarray(blockfit), ref["blockfit_bits"])
                    and np.array_equal(np.asarray(stats), ref["stats"])
                    and np.array_equal(np.asarray(crc), ref["crc"])
                    and np.array_equal(np.asarray(words), ref["payload_words"])
                )
                print(
                    f"{cname:12s} geo={geo} W={w_rung:5d} {mb/dt:9.1f} MB/s exact={ok}",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001 - report config failures, keep sweeping
                msg = str(e).splitlines()[0][:120]
                print(f"{cname:12s} geo={geo} FAILED {type(e).__name__}: {msg}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
