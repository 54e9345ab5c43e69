"""Public decode API: batched frame-parallel decode with host padding.

Mirrors the reference's `decoder::decode_frame` surface (decoder.rs:36-58)
but takes *many* frame payloads at once — the format's self-contained frames
are the parallel axis (SURVEY.md §2 decoder row)."""

from __future__ import annotations

import numpy as np

from ..errors import FrameDecodeInvalidBPF
from ..params import Parameters
from . import oracle

DEFAULT_BATCH_FRAMES = 256


def decode_frames_batch(payloads, n_samples, params: Parameters | None = None, check_crcs=None):
    """Decode a list of frame payloads (bytes) with their sample counts.

    Returns (list of int16 arrays, err bool array).  Lanes are padded to the
    pipeline's static payload size; errors are per-frame flags.

    check_crcs: optional list of expected payload CRC16s — when given, the
    CRCs are verified ON DEVICE (fused MXU matmul) and mismatches are
    reported as a third return value (crc_ok bool array)."""
    from ..ops.decode_kernel import decode_frames, decode_frames_checked
    from ..ops.encode_kernel import frame_geometry

    params = params or Parameters()
    S, B, L, W = frame_geometry(params)
    f = len(payloads)
    if f == 0:
        return ([], np.zeros(0, bool)) if check_crcs is None else ([], np.zeros(0, bool), np.zeros(0, bool))
    buf = np.zeros((f, W * 4), dtype=np.uint8)
    ns = np.zeros(f, dtype=np.int32)
    plens = np.zeros(f, dtype=np.int32)
    for i, (p, n) in enumerate(zip(payloads, n_samples)):
        arr = np.frombuffer(p, dtype=np.uint8)
        buf[i, : len(arr)] = arr
        ns[i] = n
        plens[i] = len(arr)
    if check_crcs is not None:
        out, err, crc = decode_frames_checked(buf, ns, plens, params)
        crc_ok = np.asarray(crc) == np.asarray(check_crcs, dtype=np.int64)
    else:
        out, err = decode_frames(buf, ns, params)
    out = np.asarray(out)
    err = np.asarray(err)
    outs = [out[i, : ns[i]].copy() for i in range(f)]
    return (outs, err) if check_crcs is None else (outs, err, crc_ok)


def decode_frame(payload: bytes, params: Parameters, samples: int, engine: str = "jax") -> np.ndarray:
    """Decode a single frame payload (parity with decoder::decode_frame)."""
    if engine == "numpy":
        return oracle.decode_frame(payload, params, samples)
    outs, err = decode_frames_batch([payload], [samples], params)
    if err[0]:
        raise FrameDecodeInvalidBPF("frame failed to decode")
    return outs[0]
