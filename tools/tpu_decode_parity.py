"""On-device decode-path parity: Pallas kernel vs the XLA scan, incl. corrupt
streams.

The CPU test suite pins the Pallas kernel in interpret mode (tiny
geometries) and the routed TPU path is exercised end-to-end by the corpus
gates when run on a chip — this tool is the direct production-geometry
check: encode a batch on-device, mutate payload bytes / truncate payload
lengths on the host, then decode through BOTH device kernels and demand
identical per-frame error codes and identical samples (including the
garbage on error lanes, which callers may surface under resync).

    python tools/tpu_decode_parity.py            # default F=768, all classes
    PARITY_F=2048 python tools/tpu_decode_parity.py

Exit code is nonzero on any divergence.
"""

from __future__ import annotations

import os
import sys
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
    from x3_tpu.ops.decode_kernel import _decode_impl, decode_frames
    from x3_tpu.ops.encode_kernel import encode_frames, width_rungs
    from x3_tpu.params import Parameters

    params = Parameters()
    spf = params.samples_per_frame
    F = int(os.environ.get("PARITY_F", "768"))

    @jax.jit
    def make_payload(s, n):
        o = encode_frames(s, n, params)
        w = o["payload_words"]
        shifts = jnp.asarray([24, 16, 8, 0], dtype=jnp.uint32)
        pb = ((w[:, :, None] >> shifts[None, None, :]) & 0xFF).astype(jnp.uint8)
        return pb.reshape(w.shape[0], -1), o["nbytes"]

    failures = 0
    for cname in ("hydrophone", "music", "pi240"):
        wav = make_class_corpus(cname, F, spf)
        frames = jnp.asarray(wav.reshape(-1, spf)[:F])
        nv = jnp.full((F,), spf, jnp.int32)
        pb_full, nbytes = make_payload(frames, nv)
        buf = np.asarray(pb_full).copy()
        plens = np.asarray(nbytes, np.int32).copy()
        # Rotate mutations across lanes: block-header flip, mid-payload flip,
        # tail flip, truncated payload length, and clean lanes.
        for i in range(F):
            ln, m = int(plens[i]), i % 6
            if m == 0:
                buf[i, 2] ^= 0xFF
            elif m == 1:
                buf[i, ln // 2] ^= 0x81
            elif m == 2:
                buf[i, ln - 1] ^= 0x0F
            elif m == 3:
                plens[i] = max(2, ln // 2)
        W = next(r for r in width_rungs(params) if int(plens.max()) <= r * 4)
        pb = jnp.asarray(buf[:, : W * 4])
        pls = jnp.asarray(plens)
        got_o, got_e = decode_frames(pb, nv, pls, params)  # routed (Pallas on TPU)
        ref_o, ref_e, _ = _decode_impl(pb, nv, pls, params, None)  # XLA scan
        e_ok = bool(jnp.all(got_e == ref_e))
        s_ok = bool(jnp.all(got_o == ref_o))
        n_err = int(np.asarray(ref_e != 0).sum())
        print(
            f"{cname:12s} W={W:5d} errors={n_err}/{F} "
            f"codes_identical={e_ok} samples_identical={s_ok}",
            flush=True,
        )
        failures += (not e_ok) + (not s_ok)
    if failures:
        print(f"\n{failures} divergence(s) between Pallas and scan decode")
        return 1
    print("\npallas/scan decode parity holds (errors and samples)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
