"""Public decode API: batched frame-parallel decode with host padding.

Mirrors the reference's `decoder::decode_frame` surface (decoder.rs:36-58)
but takes *many* frame payloads at once — the format's self-contained frames
are the parallel axis (SURVEY.md §2 decoder row)."""

from __future__ import annotations

import numpy as np

from ..errors import decode_error
from ..params import Parameters
from . import oracle

DEFAULT_BATCH_FRAMES = 256


def decode_frames_batch(payloads, n_samples, params: Parameters | None = None, check_crcs=None):
    """Decode a list of frame payloads (bytes) with their sample counts.

    Returns (list of int16 arrays, err int array).  Lanes are padded to the
    pipeline's static payload size; errors are per-frame ERR_* codes
    (ops.decode_kernel: 0 ok, 1 invalid BFP, 2 OOB inverse, 3 overrun),
    mappable to exceptions via errors.decode_error.

    check_crcs: optional list of expected payload CRC16s — when given, the
    CRCs are verified ON DEVICE (fused MXU matmul) and mismatches are
    reported as a third return value (crc_ok bool array)."""
    from ..ops.decode_kernel import ERR_OVERRUN, decode_frames, decode_frames_checked
    from ..ops.encode_kernel import frame_geometry, width_rungs

    params = params or Parameters()
    S, B, L, W = frame_geometry(params)
    f = len(payloads)
    if f == 0:
        return ([], np.zeros(0, np.int32)) if check_crcs is None else ([], np.zeros(0, np.int32), np.zeros(0, bool))
    # A CRC-valid but foreign/corrupt header may claim payload_len up to
    # 0x7fe0 > W*4: flag such frames as overruns instead of crashing the
    # whole batch (they cannot decode to n_samples within W words anyway).
    oversized = np.zeros(f, dtype=bool)
    arrs = []
    for i, (p, n) in enumerate(zip(payloads, n_samples)):
        arr = np.frombuffer(p, dtype=np.uint8)
        if len(arr) > W * 4 or n > S:
            oversized[i] = True
            arr = arr[: W * 4]
        arrs.append(arr)
    # Payload lengths are known before decode, so the batch can run at a
    # compact width specialization (same rung ladder as encode to keep the
    # compile cache bounded); decode_frames infers the width from the
    # buffer shape and its semantics are width-independent.
    maxlen = max(len(a) for a in arrs)
    w = next(r for r in width_rungs(params) if maxlen <= r * 4)
    # Pad the lane count to a power-of-two bucket: batch tails vary per
    # file, and each distinct (F, W) shape is a fresh 20-40 s TPU compile.
    # Dummy lanes (n_samples=0, zero payload) decode to nothing by design.
    fp = 1 << max(0, (f - 1).bit_length())
    buf = np.zeros((fp, w * 4), dtype=np.uint8)
    ns = np.zeros(fp, dtype=np.int32)
    plens = np.zeros(fp, dtype=np.int32)
    for i, (arr, n) in enumerate(zip(arrs, n_samples)):
        buf[i, : len(arr)] = arr
        ns[i] = min(n, S)
        plens[i] = len(arr)
    if check_crcs is not None:
        out, err, crc = decode_frames_checked(buf, ns, plens, params)
        crc_ok = np.asarray(crc)[:f] == np.asarray(check_crcs, dtype=np.int64)
        crc_ok = crc_ok & ~oversized  # truncated lane CRCs are meaningless
    else:
        out, err = decode_frames(buf, ns, plens, params)
    out = np.asarray(out)[:f]
    err = np.where(oversized, ERR_OVERRUN, np.asarray(err)[:f])
    outs = [out[i, : ns[i]].copy() for i in range(f)]
    return (outs, err) if check_crcs is None else (outs, err, crc_ok)


def decode_frame(payload: bytes, params: Parameters, samples: int, engine: str = "jax") -> np.ndarray:
    """Decode a single frame payload (parity with decoder::decode_frame).

    Decode failures raise the matching reference error class
    (error.rs:27-62) via the kernel's per-frame error code."""
    if engine == "auto":
        from ..engine import resolve_engine

        engine = resolve_engine(engine)
    if engine == "native":
        from .. import native

        return native.decode_frame(payload, params, samples)
    if engine == "numpy":
        return oracle.decode_frame(payload, params, samples)
    outs, err = decode_frames_batch([payload], [samples], params)
    if err[0]:
        raise decode_error(err[0])
    return outs[0]
