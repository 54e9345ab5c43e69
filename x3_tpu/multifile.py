"""Batched multi-file / multi-stream encode and decode.

Frames are the parallel unit (SURVEY.md §5), so frames from *different*
files share device batches: 256 WAVs encode as a single sequence of large
[F, S] device calls regardless of how the samples are split across files
(BASELINE.json config 4).  With a `jax.sharding` mesh, the same batches are
sharded across chips via parallel.mesh — no inter-chip communication inside
the codec."""

from __future__ import annotations

import numpy as np

from . import archive
from .errors import FrameHeaderInvalidPayloadCRC
from .models.encoder import EncodeResult, build_frame_headers
from .params import Parameters
from .utils.wav import read_wav, write_wav

DEFAULT_BATCH_FRAMES = 256


def encode_streams(
    streams,
    params: Parameters | None = None,
    batch_frames: int = DEFAULT_BATCH_FRAMES,
    mesh=None,
    source_id: int = 1,
):
    """Encode many independent mono streams, sharing device batches.

    streams: list of int16 arrays.  Returns list of EncodeResult."""
    from .ops.encode_kernel import encode_frames

    params = params or Parameters()
    spf = params.samples_per_frame

    # Global frame worklist across all streams.
    work = []  # (stream_idx, start, n_samples)
    for si, s in enumerate(streams):
        n = len(s)
        for start in range(0, n, spf):
            work.append((si, start, min(spf, n - start)))

    if mesh is not None:
        from .parallel.mesh import encode_frames_sharded

        ndev = mesh.size
        batch_frames = -(-batch_frames // ndev) * ndev

    parts: list[list[bytes]] = [[] for _ in streams]
    stats = [np.zeros(6, dtype=np.int64) for _ in streams]

    for base in range(0, len(work), batch_frames):
        chunk = work[base : base + batch_frames]
        batch = np.zeros((batch_frames, spf), dtype=np.int16)
        n_valid = np.zeros(batch_frames, dtype=np.int32)
        for i, (si, start, n) in enumerate(chunk):
            batch[i, :n] = streams[si][start : start + n]
            n_valid[i] = n
        if mesh is not None:
            res = encode_frames_sharded(batch, n_valid, params, mesh)
        else:
            res = encode_frames(batch, n_valid, params)
        words = np.ascontiguousarray(res["payload_words"])
        payload = words.byteswap().view(np.uint8)
        nbytes = np.asarray(res["nbytes"])
        crc = np.asarray(res["crc"])
        bstats = np.asarray(res["stats"])
        headers = build_frame_headers(n_valid[: len(chunk)], source_id, nbytes[: len(chunk)], crc[: len(chunk)])
        for i, (si, start, n) in enumerate(chunk):
            parts[si].append(headers[i].tobytes() + payload[i, : nbytes[i]].tobytes())
            stats[si] += bstats[i].astype(np.int64)

    return [EncodeResult(b"".join(p), st) for p, st in zip(parts, stats)]


def decode_streams(
    archives,
    batch_frames: int = DEFAULT_BATCH_FRAMES,
    mesh=None,
):
    """Decode many .x3a archive byte strings, sharing device batches.

    Archives may use different Parameters: the frame worklist is grouped by
    params, each group decoded with its own frame geometry.  Returns list of
    (samples int16 array, sample_rate).  Raises on CRC mismatch or frame
    decode failure (reference behavior, mapped to the matching error class)."""
    from .ops.encode_kernel import frame_geometry, width_rungs
    from .ops.decode_kernel import decode_frames
    from .errors import decode_error

    specs = []
    # Frame worklists grouped by params (geometry differs across params).
    groups: dict[Parameters, list] = {}  # params -> [(archive_idx, frame_idx, payload, n_samples)]
    for ai, data in enumerate(archives):
        spec, header_size = archive.parse_archive_header(data)
        specs.append(spec)
        index = list(archive.walk_frames(data, header_size))
        ok = archive.verify_payload_crcs(data, index)
        if not ok.all():
            bad = int(np.nonzero(~ok)[0][0])
            raise FrameHeaderInvalidPayloadCRC(f"archive {ai} frame {bad} payload CRC mismatch")
        work = groups.setdefault(spec.params, [])
        for fi, (off, h) in enumerate(index):
            work.append((ai, fi, data[off : off + h.payload_len], h.samples))

    if mesh is not None:
        from .parallel.mesh import decode_frames_sharded

        ndev = mesh.size
        batch_frames = -(-batch_frames // ndev) * ndev

    outs: dict[int, list[tuple[int, np.ndarray]]] = {ai: [] for ai in range(len(archives))}
    for params, work in groups.items():
        S, B, L, W = frame_geometry(params)
        for base in range(0, len(work), batch_frames):
            chunk = work[base : base + batch_frames]
            # Compact width rung: lens are known up front (see
            # models/decoder.decode_frames_batch).
            maxlen = max((len(p) for _, _, p, _ in chunk), default=0)
            rungs = width_rungs(params)
            w = next((r for r in rungs if maxlen <= r * 4), rungs[-1])
            buf = np.zeros((batch_frames, w * 4), dtype=np.uint8)
            ns = np.zeros(batch_frames, dtype=np.int32)
            plens = np.zeros(batch_frames, dtype=np.int32)
            for i, (ai, fi, payload, n) in enumerate(chunk):
                # A crafted header may claim more bytes than any rung holds
                # (Frame::MAX_LENGTH 0x7fe0 > W*4); truncate and let the
                # kernel flag the frame instead of crashing the batch.
                arr = np.frombuffer(payload, dtype=np.uint8)[: w * 4]
                buf[i, : len(arr)] = arr
                ns[i] = n
                plens[i] = len(arr)
            if mesh is not None:
                dec, err = decode_frames_sharded(buf, ns, plens, params, mesh)
            else:
                dec, err = decode_frames(buf, ns, plens, params)
            dec = np.asarray(dec)
            err = np.asarray(err)
            if err[: len(chunk)].any():
                bad = int(np.nonzero(err)[0][0])
                ai, fi = chunk[bad][0], chunk[bad][1]
                raise decode_error(err[bad], f"archive {ai} frame {fi} failed to decode")
            for i, (ai, fi, payload, n) in enumerate(chunk):
                outs[ai].append((fi, dec[i, :n]))

    decoded = []
    for ai, spec in enumerate(specs):
        parts = [a for _, a in sorted(outs[ai], key=lambda t: t[0])]
        decoded.append((np.concatenate(parts) if parts else np.zeros(0, np.int16), spec.sample_rate))
    return decoded


def wav_to_x3a_batch(
    wav_filenames,
    x3a_filenames,
    params: Parameters | None = None,
    batch_frames: int = DEFAULT_BATCH_FRAMES,
    mesh=None,
    process_index: int | None = None,
    process_count: int | None = None,
):
    """Batch-convert many WAV files to .x3a archives, frames from all files
    sharing device batches.  Returns the list of EncodeResult.

    process_index/process_count: multi-host input sharding — this process
    converts only its strided shard of the file list (see
    parallel.multihost.shard_worklist); other entries are skipped.  The
    codec is collective-free, so hosts never communicate."""
    if process_count is not None or process_index is not None:
        from .parallel.multihost import shard_worklist

        pairs = shard_worklist(
            list(zip(wav_filenames, x3a_filenames)), process_index, process_count
        )
        wav_filenames = [w for w, _ in pairs]
        x3a_filenames = [x for _, x in pairs]
    params = params or Parameters()
    streams, rates = [], []
    for p in wav_filenames:
        s, r = read_wav(p)
        streams.append(s)
        rates.append(r)
    results = encode_streams(streams, params, batch_frames, mesh)
    for path, rate, res in zip(x3a_filenames, rates, results):
        with open(path, "wb") as f:
            f.write(archive.build_archive_header(rate, params))
            f.write(res.data)
    return results


def x3a_to_wav_batch(
    x3a_filenames,
    wav_filenames,
    batch_frames: int = DEFAULT_BATCH_FRAMES,
    mesh=None,
    process_index: int | None = None,
    process_count: int | None = None,
):
    """Batch-convert many .x3a archives back to WAV files.

    process_index/process_count: multi-host input sharding (strided) — this
    process decodes only its shard of the archive list."""
    from pathlib import Path

    if process_count is not None or process_index is not None:
        from .parallel.multihost import shard_worklist

        pairs = shard_worklist(
            list(zip(x3a_filenames, wav_filenames)), process_index, process_count
        )
        x3a_filenames = [x for x, _ in pairs]
        wav_filenames = [w for _, w in pairs]
    archives = [Path(p).read_bytes() for p in x3a_filenames]
    decoded = decode_streams(archives, batch_frames, mesh)
    for path, (samples, rate) in zip(wav_filenames, decoded):
        write_wav(path, samples, rate)
    return [len(samples) for samples, _ in decoded]
