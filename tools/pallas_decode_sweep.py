"""Re-tune the Pallas decode kernel's per-rung geometry on new hardware.

`ops/decode_pallas._auto_geometry` pins (U, TF, dma_words) per width rung to
values measured on v5e (ROADMAP R4-2).  On a different TPU generation the
optima may move: run this sweep there, compare against the geo=None rows
(the current defaults), and update `_auto_geometry` + its pinning test
(tests/test_pallas_decode.py::test_auto_geometry_invariants).

    python tools/pallas_decode_sweep.py                 # default candidates
    SWEEP_F=6144 SWEEP_REPS=30 python tools/pallas_decode_sweep.py

Each row reports decoded-output MB/s (scalar-synced, rep-amortized — the
tunnel dispatch costs ~1-2 ms/call) and bit-exactness vs the input frames.
Failed configs (Mosaic lowering or scoped-VMEM OOM) are reported, not
fatal.  Corpus classes match bench.py's spectrum; each lands on a
different production width rung.
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
    from x3_tpu.ops.decode_pallas import decode_frames_pallas
    from x3_tpu.ops.encode_kernel import encode_frames, width_rungs
    from x3_tpu.params import Parameters

    params = Parameters()
    spf = params.samples_per_frame
    F = int(os.environ.get("SWEEP_F", "6144"))
    reps = int(os.environ.get("SWEEP_REPS", "30"))

    @jax.jit
    def make_payload(s, n):
        o = encode_frames(s, n, params)
        w = o["payload_words"]
        shifts = jnp.asarray([24, 16, 8, 0], dtype=jnp.uint32)
        pb = ((w[:, :, None] >> shifts[None, None, :]) & 0xFF).astype(jnp.uint8)
        return pb.reshape(w.shape[0], -1), o["nbytes"]

    def timed(fn, args):
        int(fn(*args))
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(reps)]
        int(outs[-1])
        return (time.perf_counter() - t0) / reps

    # (U, TF, dma_words) candidates per class; None = current _auto_geometry.
    CANDIDATES = {
        "pi240": [None, (8, 2048, True), (16, 2048, True), (16, 1024, True)],
        "hydrophone": [None, (16, 1024, True), (24, 1024, True), (24, 512, True)],
        "music": [None, (16, 512, True), (24, 512, True), (24, 256, True)],
    }
    if os.environ.get("SWEEP_SELECT"):
        # Window-select structure A/B at the pinned (U, TF, dma) per rung:
        # 4th geometry element picks linear / tlP (two-level factored
        # one-hot) / funnel (compare-halving).  The select sweep dominates
        # the kernel at wide W (many slabs), so the wide rungs are where a
        # structure change could pay.
        CANDIDATES = {
            "pi240": [None] + [(16, 2048, True, s) for s in ("tl4", "funnel", "dyn")],
            "hydrophone": [None] + [(24, 1024, True, s) for s in ("tl4", "tl8", "funnel", "dyn")],
            "music": [None]
            + [(24, 512, True, s) for s in ("tl4", "tl8", "tl16", "funnel", "dyn")],
        }
    if os.environ.get("SWEEP_GEOS"):
        # Ad-hoc candidates: SWEEP_GEOS is a Python literal dict
        # {class: [geo, ...]} (geo None or a (U, TF, dma[, select]) tuple).
        import ast

        CANDIDATES = ast.literal_eval(os.environ["SWEEP_GEOS"])
    # SWEEP_MINW=<words> floors the decode width so narrow-payload classes
    # can exercise the wider production rungs (payloads are zero-padded).
    min_w = int(os.environ.get("SWEEP_MINW", "0"))

    mb = F * spf * 2 / 1e6
    for cname, geos in CANDIDATES.items():
        wav = make_class_corpus(cname, F, spf)
        frames = jnp.asarray(wav.reshape(-1, spf)[:F])
        nv = jnp.full((F,), spf, jnp.int32)
        pb, plens = make_payload(frames, nv)
        need = max(int(np.asarray(plens).max()), min_w * 4)
        dec_w = next(r for r in width_rungs(params) if need <= r * 4)
        pb = jax.jit(lambda p: p[:, : dec_w * 4])(pb)
        plens = plens.astype(jnp.int32)
        jax.block_until_ready(pb)
        for geo in geos:
            try:
                sync = jax.jit(
                    lambda p, n, pl, g=geo: (
                        lambda de: jnp.sum(de[0].astype(jnp.int32)) + de[1].sum()
                    )(decode_frames_pallas(p, n, pl, params, geometry=g))
                )
                dt = timed(sync, (pb, nv, plens))
                out, err = decode_frames_pallas(pb, nv, plens, params, geometry=geo)
                ok = bool(jnp.all(out == frames) & ~err.any())
                print(
                    f"{cname:12s} geo={geo} W={dec_w:5d} {mb/dt:9.1f} MB/s exact={ok}",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001 - report config failures, keep sweeping
                msg = str(e).splitlines()[0][:120]
                print(f"{cname:12s} geo={geo} W={dec_w:5d} FAILED {type(e).__name__}: {msg}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
