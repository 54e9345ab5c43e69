"""Engine selection for the file-conversion paths.

The framework carries three byte-identical engines (tested against each
other and the golden vectors):

* ``jax``    — the batched TPU pipeline (ops/encode_kernel, ops/decode_kernel).
               Multi-GB/s once data is device-resident; the right engine for
               device-resident batch workloads (multifile, mesh sharding,
               feeding a TPU training job).
* ``native`` — the C++ host core (native/x3core.cpp), multithreaded over
               frames.  ~0.22 GB/s per core with zero transfer cost; the
               right engine when bytes start and end in host RAM.
* ``numpy``  — the pure-Python oracle (models/oracle.py); semantics ground
               truth, slow.

``auto`` routes one-shot file conversion by a MEASURED number: every byte
moves disk -> host RAM -> device and back, so the conversion rate is capped
by the host<->device link, while the native engine runs at the codec's own
host speed.  When the toolchain is available and an accelerator backend is
up, ``auto`` probes host->device bandwidth ONCE per host (a timed
``jax.device_put``, cached on disk keyed by device kind) and picks ``jax``
only when the link outruns the native core's estimated multicore rate.  No
probe (CPU backend, probe disabled via ``X3_AUTO_PROBE=0``, or probe
failure) falls back to the static preference: ``native`` when buildable,
else ``jax``.  Batch/mesh APIs keep ``jax``: their inputs are already (or
stay) device arrays, where the TPU pipeline is ~50x the native core.

Override with the ``X3_ENGINE`` environment variable or an explicit
``engine=`` argument.
"""

from __future__ import annotations

import json
import os
import time

VALID = ("jax", "native", "numpy")

# Native single-core file-conversion rate (measured ~220 MB/s encode /
# ~180 MB/s decode on one core, ROADMAP.md); the mt paths scale with cores.
_NATIVE_MBPS_PER_CORE = 200.0

_PROBE_CACHE = "/tmp/x3_tpu_autoprobe.json"
_probe_memo: dict[str, float | None] = {}


def _native_file_mbps() -> float:
    return _NATIVE_MBPS_PER_CORE * (os.cpu_count() or 1)


def probed_h2d_mbps() -> float | None:
    """Host->device bandwidth in MB/s, measured once per host per device
    kind and cached at /tmp (None when not applicable: CPU backend, probe
    disabled, or jax unavailable).  H2D is the proxy for the whole
    transfer-bound file round trip; the first-ever D2H on some fabrics is
    pathologically slow, so the probe deliberately never reads back."""
    if os.environ.get("X3_AUTO_PROBE", "1") == "0":
        return None
    try:
        import jax

        backend = jax.default_backend()
        if backend == "cpu":
            return None  # "device" is host RAM; transfer cost is not the question
        key = f"{backend}:{jax.devices()[0].device_kind}"
    except Exception:
        return None
    if key in _probe_memo:
        return _probe_memo[key]
    try:
        with open(_PROBE_CACHE) as f:
            cache = json.load(f)
    except Exception:
        cache = {}
    if key in cache:
        _probe_memo[key] = float(cache[key])
        return _probe_memo[key]
    try:
        import jax
        import numpy as np

        # Small warmup transfer first (connection setup / allocator paths),
        # then time the best of 3 x 8 MB puts.
        jax.device_put(np.zeros(1024, np.uint8)).block_until_ready()
        buf = np.zeros(8 << 20, np.uint8)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_put(buf).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        mbps = (len(buf) / 1e6) / max(best, 1e-9)
    except Exception:
        _probe_memo[key] = None
        return None
    _probe_memo[key] = mbps
    cache[key] = mbps
    try:
        tmp = _PROBE_CACHE + f".{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(cache, f)
        os.replace(tmp, _PROBE_CACHE)
    except Exception:
        pass
    return mbps


def resolve_engine(engine: str = "auto") -> str:
    """Resolve 'auto' to a concrete engine name (see module docstring)."""
    if engine == "auto":
        env = os.environ.get("X3_ENGINE", "")
        if env:
            engine = env
    if engine in VALID:
        return engine
    if engine != "auto":
        raise ValueError(f"unknown engine {engine!r} (want auto|jax|native|numpy)")
    from . import native

    if not native.available():
        return "jax"
    bw = probed_h2d_mbps()
    if bw is not None and bw > _native_file_mbps():
        return "jax"
    return "native"
