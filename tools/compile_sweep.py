"""Cold-cache compile sweep: prove every production kernel specialization
compiles from scratch on the current backend.

Why this exists: the persistent compile cache (JAX_COMPILATION_CACHE_DIR)
can mask COMPILE-TIME failures for months — round 2 shipped a Pallas CRC
operand layout whose worst-case-width compile exceeded the 16 MB scoped
VMEM limit, and every test/bench kept passing off cached artifacts until an
unrelated change bumped the module hash.  This tool lowers+compiles each
(kernel, rung) pair the file pipeline can dispatch, against a throwaway
cache, and reports per-config wall time.

    python tools/compile_sweep.py            # current backend (TPU here)
    JAX_PLATFORMS=cpu python tools/compile_sweep.py --cpu-mesh

Exit code is nonzero if any configuration fails to compile.
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--enc-batch", type=int, default=768)
    ap.add_argument("--dec-batch", type=int, default=2048)
    ap.add_argument(
        "--cpu-mesh", action="store_true", help="force an 8-device CPU mesh first (like tests)"
    )
    args = ap.parse_args()

    if args.cpu_mesh:
        import os

        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
    tmp = tempfile.mkdtemp(prefix="x3_cold_cache_")
    jax.config.update("jax_compilation_cache_dir", tmp)

    from x3_tpu.ops.decode_kernel import decode_frames, decode_frames_checked
    from x3_tpu.ops.encode_kernel import (
        block_width_rungs,
        encode_frames,
        frame_geometry,
        width_rungs,
    )
    from x3_tpu.params import Parameters

    params = Parameters()
    S, B, L, W = frame_geometry(params)
    spf = params.samples_per_frame

    failures = []

    def check(name, fn, *a):
        t0 = time.perf_counter()
        try:
            jax.jit(fn).lower(*a).compile()
            print(f"ok   {name:42s} {time.perf_counter() - t0:6.1f}s", flush=True)
        except Exception as e:
            failures.append((name, e))
            print(f"FAIL {name:42s} {type(e).__name__}: {str(e)[:160]}", flush=True)

    Fe, Fd = args.enc_batch, args.dec_batch
    samples = np.zeros((Fe, spf), np.int16)
    nv = np.full(Fe, spf, np.int32)

    for w in width_rungs(params):
        for nw in block_width_rungs(params):
            check(
                f"encode F={Fe} w={w} nw={nw}",
                lambda s, n, _w=w, _nw=nw: encode_frames(s, n, params, "block", _w, _nw),
                samples,
                nv,
            )

    ns = np.full(Fd, spf, np.int32)
    plens = np.full(Fd, 64, np.int32)
    for w in width_rungs(params):
        payload = np.zeros((Fd, w * 4), np.uint8)
        check(
            f"decode F={Fd} w={w}",
            lambda p, n, pl: decode_frames(p, n, pl, params),
            payload,
            ns,
            plens,
        )
        check(
            f"decode_checked F={Fd} w={w}",
            lambda p, n, pl: decode_frames_checked(p, n, pl, params),
            payload,
            ns,
            plens,
        )

    # Foreign-geometry decode (n_blocks escalation, models/decoder.
    # decode_geometry): the first power-of-two bucket past the default.
    nb = 2 * B
    payload = np.zeros((Fd, width_rungs(params)[0] * 4), np.uint8)
    ns2 = np.full(Fd, 1 + nb * L, np.int32)
    check(
        f"decode F={Fd} n_blocks={nb}",
        lambda p, n, pl: decode_frames(p, n, pl, params, nb),
        payload,
        ns2,
        plens,
    )

    if failures:
        print(f"\n{len(failures)} configuration(s) FAILED to compile cold")
        return 1
    print("\nall configurations compile cold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
