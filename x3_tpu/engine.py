"""Engine selection for the file-conversion paths.

The framework carries three byte-identical engines (tested against each
other and the golden vectors):

* ``jax``    — the batched TPU pipeline (ops/encode_kernel, ops/decode_kernel).
               Multi-GB/s once data is device-resident; the right engine for
               device-resident batch workloads (multifile, mesh sharding,
               feeding a TPU training job).
* ``native`` — the C++ host core (native/x3core.cpp), multithreaded over
               frames.  ~0.26 GB/s per core with zero transfer cost; the
               right engine when bytes start and end in host RAM.
* ``numpy``  — the pure-Python oracle (models/oracle.py); semantics ground
               truth, slow.

``auto`` routes by workload shape: one-shot file conversion moves every byte
disk -> host RAM -> device and back, so unless the accelerator link is far
faster than the codec itself the transfers dominate (the reference's 80 MB/s
CPU baseline is an *end-to-end* number, timings.csv:74).  The native
multicore engine beats that link-bound round trip on any host, so file APIs
pick ``native`` when the toolchain is available and fall back to ``jax``.
Batch/mesh APIs keep ``jax``: their inputs are already (or stay) device
arrays, where the TPU pipeline is ~12x the native core.

Override with the ``X3_ENGINE`` environment variable or an explicit
``engine=`` argument.
"""

from __future__ import annotations

import os

VALID = ("jax", "native", "numpy")


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

    return "native" if native.available() else "jax"
