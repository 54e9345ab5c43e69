"""Minimal repro for the tlP window-select TPU compiler crash (ROADMAP R4-2).

Round 4 pinned the Pallas decode kernel's "tlP" (two-level factored one-hot)
window select to the compile-VERIFIED rungs (tl4 at W=2048/4096) because
wider factorizations crash the TPU compiler itself — `tpu_compile_helper`
exits 1 (a toolchain crash, NOT a scoped-VMEM OOM, which raises a normal
RESOURCE_EXHAUSTED):

  - tl8 at W=2048 and W=4096 (SS = P+K-1 = 13-slab super-slab intermediates)
  - tl4 at the full rung W=5096

This script re-tests that boundary cheaply on every toolchain bump, using a
throwaway compile cache so the persistent cache can't mask a fixed (or
newly-broken) config.  If a crashing config starts compiling on a future
jax/libtpu, re-sweep it with tools/pallas_decode_sweep.py (SWEEP_SELECT)
and widen the `_auto_geometry` pin (ops/decode_pallas.py).

    python tools/tl_crash_repro.py            # the 4 boundary configs
    REPRO_CONFIGS=tl8:2048 python tools/tl_crash_repro.py

Each config compiles in a SUBPROCESS (the crash kills the compiling
process on some toolchains) and reports COMPILES / CRASHES per row.
Exit code 0 either way — this is a probe, not a gate.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# (select, W[, U, TF]): the round-4/5 crash boundary.  The known-good
# production configs are included as canaries for the harness itself.
# Round 5 added the "dyn" bounded-dynamic-sweep select, whose crash
# boundary tracks the fori carry / scratch size (K*G*TF and W_pad*TF).
DEFAULT_CONFIGS = [
    ("tl4", 2048),              # known-compiling (round-4 production)
    ("tl4", 4096),              # known-compiling (round-4 production)
    ("tl4", 5096),              # CRASHES on round-4/5 toolchain
    ("tl8", 2048),              # CRASHES on round-4/5 toolchain
    ("tl8", 4096),              # CRASHES on round-4/5 toolchain
    ("dyn", 2048, 8, 1024),     # known-compiling (round-5 production, 30.0 GB/s)
    ("dyn", 4096, 24, 512),     # known-compiling (round-5 production, 18.4 GB/s)
    ("dyn", 512, 8, 2048),      # known-compiling (round-5 production, 34.7 GB/s)
    ("dyn", 2048, 24, 1024),    # CRASHES on round-5 toolchain
    ("dyn", 2048, 8, 2048),     # CRASHES on round-5 toolchain
    ("dyn", 512, 16, 2048),     # CRASHES on round-5 toolchain
    ("dyn", 5096, 24, 512),     # CRASHES on round-5 toolchain
]

_CHILD = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["JAX_COMPILATION_CACHE_DIR"] = {cache!r}
import numpy as np
import jax, jax.numpy as jnp
from x3_tpu.ops.decode_pallas import decode_frames_pallas
from x3_tpu.ops.encode_kernel import frame_geometry
from x3_tpu.params import Parameters

select, W = {select!r}, {W}
U_override, TF_override = {U!r}, {TF!r}
params = Parameters()
_, B, L, WFULL = frame_geometry(params)
W = min(W, WFULL)
# Production batch: the round-4 crashes were observed at the F=6144 lane
# tiles (TF=1024/512); smaller F shrinks TF and can compile configs that
# crash at production geometry.
F = int(os.environ.get("REPRO_F", "6144"))
# Compile-only probe: content is irrelevant (a zero payload decodes to an
# error flag); what matters is that the kernel LOWERs and COMPILEs.
payload = jnp.zeros((F, W * 4), jnp.uint8)
ns = jnp.full((F,), params.samples_per_frame, jnp.int32)
pl = jnp.full((F,), 64, jnp.int32)
# Production U/TF for the rung with the select overridden (geometry arg:
# (U, TF, dma_words, select)).
from x3_tpu.ops.decode_pallas import _auto_geometry, block_buffer_words
from x3_tpu.ops.encode_kernel import block_buffer_words as bbw
maxadv = (6 + 16 * L + 31) // 32 + 1
auto = _auto_geometry(W, B, L, F, bbw(params), maxadv)
U, TF, dma, _ = auto if auto is not None else (16, 512, True, "linear")
if U_override is not None:
    U, TF = U_override, TF_override
out, err = decode_frames_pallas(payload, ns, pl, params, geometry=(U, TF, dma, select))
jax.block_until_ready((out, err))
print("COMPILED-AND-RAN")
"""


def main() -> int:
    spec = os.environ.get("REPRO_CONFIGS")
    if spec:
        configs = []
        for tok in spec.split(","):
            parts = tok.split(":")
            configs.append((parts[0], *map(int, parts[1:])))
    else:
        configs = DEFAULT_CONFIGS

    any_crash = False
    for select, W, *utf in configs:
        U, TF = (utf[0], utf[1]) if utf else (None, None)
        with tempfile.TemporaryDirectory(prefix="x3_tl_repro_") as cache:
            code = _CHILD.format(repo=str(REPO), cache=cache, select=select, W=W, U=U, TF=TF)
            r = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                timeout=1200,
                cwd=str(REPO),
            )
        ok = r.returncode == 0 and "COMPILED-AND-RAN" in r.stdout
        tag = "COMPILES" if ok else "CRASHES"
        any_crash |= not ok
        geo = f" (U={U}, TF={TF})" if U is not None else ""
        print(f"{select}@W={W}{geo}: {tag}" + ("" if ok else f" (rc={r.returncode})"))
        if not ok:
            tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
            for ln in tail:
                print(f"    {ln}")
    if any_crash:
        print("boundary unchanged: keep the _auto_geometry pin as-is")
    else:
        print("ALL configs compile: re-sweep with tools/pallas_decode_sweep.py "
              "(SWEEP_SELECT) and widen the _auto_geometry pin")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
