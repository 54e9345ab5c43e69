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
from .files import JAX_DECODE_BATCH_FRAMES, JAX_ENCODE_BATCH_FRAMES
from .models.encoder import EncodeResult, build_frame_headers
from .params import Parameters
from .utils.io import prefetch_iter

# The batch APIs run the jax pipelines; default to the measured device
# sweet spots (see files.resolve_batch_frames).
DEFAULT_BATCH_FRAMES = 256


def encode_streams(
    streams,
    params: Parameters | None = None,
    batch_frames: int | None = None,
    mesh=None,
    source_id: int = 1,
):
    """Encode many independent mono streams, sharing device batches.

    streams: list of int16 arrays.  Returns list of EncodeResult."""
    params = params or Parameters()
    spf = params.samples_per_frame

    # Global frame worklist across all streams.
    work = []  # (stream_idx, start, n_samples)
    for si, s in enumerate(streams):
        n = len(s)
        for start in range(0, n, spf):
            work.append((si, start, min(spf, n - start)))

    parts: list[list[bytes]] = [[] for _ in streams]
    stats = [np.zeros(6, dtype=np.int64) for _ in streams]

    def fill(chunk, batch, n_valid):
        for i, (si, start, n) in enumerate(chunk):
            batch[i, :n] = streams[si][start : start + n]
            n_valid[i] = n

    def emit(chunk, n_valid, headers, payload, nbytes, bstats):
        for i, (si, start, n) in enumerate(chunk):
            parts[si].append(headers[i].tobytes() + payload[i, : nbytes[i]].tobytes())
            stats[si] += bstats[i].astype(np.int64)

    _run_encode_worklist(work, fill, emit, params, batch_frames, mesh, source_id)
    return [EncodeResult(b"".join(p), st) for p, st in zip(parts, stats)]


def _run_encode_worklist(work, fill, emit, params: Parameters, batch_frames, mesh, source_id):
    """Drive the batched device encode over a frame worklist with the
    adaptive rung ladders (sticky escalation, at most one re-dispatch per
    axis — same scheme as models/encoder.encode).

    fill(chunk, batch, n_valid): populate the [batch_frames, spf] buffer.
    emit(chunk, n_valid, headers, payload, nbytes, stats): consume results.
    """
    from .ops.encode_kernel import (
        block_width_rungs,
        encode_frames,
        fits_block_width,
        fits_width,
        width_rungs,
    )

    if batch_frames is None:
        batch_frames = JAX_ENCODE_BATCH_FRAMES
    if mesh is not None:
        from .parallel.mesh import encode_frames_sharded

        batch_frames = -(-batch_frames // mesh.size) * mesh.size
    spf = params.samples_per_frame
    rungs = width_rungs(params)
    nw_rungs = block_width_rungs(params)
    rung = nw_rung = 0

    def _filled():
        # Next chunk's fill (WAV seek-reads / stream slicing) runs on a
        # read-ahead thread while the current chunk encodes (utils/io
        # prefetch_iter, same as files.wav_to_x3a).  Only this generator
        # touches the callers' readers; depth 1 bounds memory at one extra
        # batch buffer.
        for base in range(0, len(work), batch_frames):
            chunk = work[base : base + batch_frames]
            batch = np.zeros((batch_frames, spf), dtype=np.int16)
            n_valid = np.zeros(batch_frames, dtype=np.int32)
            fill(chunk, batch, n_valid)
            yield chunk, batch, n_valid

    for chunk, batch, n_valid in prefetch_iter(_filled(), depth=1):

        def run(w, nw):
            if mesh is not None:
                return encode_frames_sharded(batch, n_valid, params, mesh, w, nw)
            return encode_frames(batch, n_valid, params, "block", w, nw)

        res = run(rungs[rung], nw_rungs[nw_rung])
        nbytes = np.asarray(res["nbytes"])[: len(chunk)]
        blockfit = np.asarray(res["blockfit_bits"])[: len(chunk)]
        need_w = not fits_width(nbytes, rungs[rung], params)
        need_nw = not fits_block_width(blockfit, nw_rungs[nw_rung], params)
        if need_w or need_nw:
            while need_w and rung < len(rungs) - 1:
                rung += 1
                if fits_width(nbytes, rungs[rung], params):
                    break
            while need_nw and nw_rung < len(nw_rungs) - 1:
                nw_rung += 1
                if fits_block_width(blockfit, nw_rungs[nw_rung], params):
                    break
            res = run(rungs[rung], nw_rungs[nw_rung])
            nbytes = np.asarray(res["nbytes"])[: len(chunk)]
        words = np.ascontiguousarray(res["payload_words"])
        payload = words.byteswap().view(np.uint8)
        crc = np.asarray(res["crc"])
        bstats = np.asarray(res["stats"])
        headers = build_frame_headers(n_valid[: len(chunk)], source_id, nbytes, crc[: len(chunk)])
        emit(chunk, n_valid, headers, payload, nbytes, bstats)


def decode_streams(
    archives,
    batch_frames: int | None = None,
    mesh=None,
):
    """Decode many .x3a archive byte strings, sharing device batches.

    Archives may use different Parameters: the frame worklist is grouped by
    params, each group decoded with its own frame geometry.  Returns list of
    (samples int16 array, sample_rate).  Raises on CRC mismatch or frame
    decode failure (reference behavior, mapped to the matching error class)."""
    from .models.decoder import decode_geometry
    from .ops.decode_kernel import decode_frames
    from .errors import decode_error

    if batch_frames is None:
        batch_frames = JAX_DECODE_BATCH_FRAMES
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
        for base in range(0, len(work), batch_frames):
            chunk = work[base : base + batch_frames]
            # Static specialization follows the batch: compact width rung
            # while payloads fit, escalated geometry for foreign archives
            # whose frames exceed the default blocks_per_frame (see
            # models/decoder.decode_geometry) — same accept/reject as the
            # single-file path by construction.
            n_blocks, w = decode_geometry(
                params, [n for _, _, _, n in chunk], [len(p) for _, _, p, _ in chunk]
            )
            buf = np.zeros((batch_frames, w * 4), dtype=np.uint8)
            ns = np.zeros(batch_frames, dtype=np.int32)
            plens = np.zeros(batch_frames, dtype=np.int32)
            for i, (ai, fi, payload, n) in enumerate(chunk):
                arr = np.frombuffer(payload, dtype=np.uint8)
                buf[i, : len(arr)] = arr
                ns[i] = n
                plens[i] = len(arr)
            if mesh is not None:
                dec, err = decode_frames_sharded(buf, ns, plens, params, mesh, n_blocks)
            else:
                dec, err = decode_frames(buf, ns, plens, params, n_blocks)
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
    batch_frames: int | None = None,
    mesh=None,
    process_index: int | None = None,
    process_count: int | None = None,
):
    """Batch-convert many WAV files to .x3a archives, frames from all files
    sharing device batches.  Returns the list of EncodeResult (data=b"",
    nbytes = the frame-stream size written; archives go straight to disk).

    Streaming: WAVs are read in per-batch sample ranges (seeks) and
    archives written incrementally, so peak memory is O(batch_frames)
    regardless of total input volume — same bound as files.wav_to_x3a.

    process_index/process_count: multi-host input sharding — this process
    converts only its strided shard of the file list (see
    parallel.multihost.shard_worklist); other entries are skipped.  The
    codec is collective-free, so hosts never communicate."""
    import wave

    from .errors import MoreThanOneChannel, X3Error

    if process_count is not None or process_index is not None:
        from .parallel.multihost import shard_worklist

        pairs = shard_worklist(
            list(zip(wav_filenames, x3a_filenames)), process_index, process_count
        )
        wav_filenames = [w for w, _ in pairs]
        x3a_filenames = [x for _, x in pairs]
    params = params or Parameters()
    spf = params.samples_per_frame

    readers, outs = [], []
    try:
        work = []  # (file_idx, start_sample, n_samples)
        for fi, p in enumerate(wav_filenames):
            w = wave.open(str(p), "rb")
            readers.append(w)
            if w.getsampwidth() != 2:
                raise X3Error(f"only 16-bit WAV supported, got {8 * w.getsampwidth()}-bit")
            if w.getnchannels() != 1:
                raise MoreThanOneChannel(f"only mono WAV supported, got {w.getnchannels()} channels")
            n = w.getnframes()
            for start in range(0, n, spf):
                work.append((fi, start, min(spf, n - start)))

        from .utils.io import open_overwrite

        for fi, p in enumerate(x3a_filenames):
            f = open_overwrite(p)
            outs.append(f)
            f.write(archive.build_archive_header(readers[fi].getframerate(), params))

        stats = [np.zeros(6, dtype=np.int64) for _ in readers]
        written = [0] * len(readers)

        def fill(chunk, batch, n_valid):
            for i, (fi, start, n) in enumerate(chunk):
                readers[fi].setpos(start)
                raw = readers[fi].readframes(n)
                batch[i, :n] = np.frombuffer(raw, dtype="<i2")
                n_valid[i] = n

        def emit(chunk, n_valid, headers, payload, nbytes, bstats):
            # Within the worklist, each file's frames are in order, so the
            # incremental writes produce the same bytes as the in-memory
            # concatenation.
            for i, (fi, start, n) in enumerate(chunk):
                outs[fi].write(headers[i].tobytes())
                outs[fi].write(payload[i, : nbytes[i]].tobytes())
                written[fi] += 20 + int(nbytes[i])
                stats[fi] += bstats[i].astype(np.int64)

        _run_encode_worklist(work, fill, emit, params, batch_frames, mesh, source_id=1)
        for f in outs:  # open_overwrite skips O_TRUNC; cut stale tails now
            f.truncate()
        return [EncodeResult(b"", st, nbytes=nb) for st, nb in zip(stats, written)]
    finally:
        for w in readers:
            w.close()
        for f in outs:
            f.close()


def x3a_to_wav_batch(
    x3a_filenames,
    wav_filenames,
    batch_frames: int | None = None,
    mesh=None,
    process_index: int | None = None,
    process_count: int | None = None,
):
    """Batch-convert many .x3a archives back to WAV files, frames from all
    archives sharing device batches.  Returns per-file sample counts.

    Streaming: like files.x3a_to_wav, archives are indexed with header-only
    seeks and payloads are read one device batch at a time, with WAVs
    written incrementally — peak memory is O(batch_frames) regardless of
    the total archive volume (decodefile.rs:44-45 parity for the batch
    path too).  CRC mismatches and frame decode failures raise, like
    decode_streams; outputs already flushed before a raise may be partial.

    process_index/process_count: multi-host input sharding (strided) — this
    process decodes only its shard of the archive list."""
    from .models.decoder import decode_geometry
    from .ops.decode_kernel import decode_frames
    from .errors import decode_error
    from .utils.wav import WavWriter

    if process_count is not None or process_index is not None:
        from .parallel.multihost import shard_worklist

        pairs = shard_worklist(
            list(zip(x3a_filenames, wav_filenames)), process_index, process_count
        )
        x3a_filenames = [x for x, _ in pairs]
        wav_filenames = [w for _, w in pairs]
    if batch_frames is None:
        batch_frames = JAX_DECODE_BATCH_FRAMES
    if mesh is not None:
        from .parallel.mesh import decode_frames_sharded

        batch_frames = -(-batch_frames // mesh.size) * mesh.size

    handles, writers = [], {}
    try:
        specs, indexes = [], []
        for p in x3a_filenames:
            f = open(p, "rb")
            handles.append(f)
            spec, hs = archive.read_archive_header_file(f)
            specs.append(spec)
            indexes.append(list(archive.walk_frames_file(f, hs)))

        # Frame worklists grouped by params (each archive belongs to exactly
        # one group, so its frames still arrive in order).
        groups: dict[Parameters, list] = {}
        for ai, index in enumerate(indexes):
            g = groups.setdefault(specs[ai].params, [])
            for fi, (off, h) in enumerate(index):
                g.append((ai, fi, off, h))

        def writer_for(ai):
            if ai not in writers:
                writers[ai] = WavWriter(wav_filenames[ai], specs[ai].sample_rate)
            return writers[ai]

        done = [0] * len(handles)

        def _prepared():
            # Next batch's payload reads + CRC verify + buffer build run on
            # a read-ahead thread while the current batch decodes (utils/io
            # prefetch_iter); only this generator touches `handles`.  A CRC
            # mismatch re-raises at the consuming point after every earlier
            # batch, so flush-before-raise semantics are unchanged.
            for params, work in groups.items():
                for base in range(0, len(work), batch_frames):
                    chunk = work[base : base + batch_frames]
                    payloads = []
                    for ai, fi, off, h in chunk:
                        handles[ai].seek(off)
                        payloads.append(handles[ai].read(h.payload_len))
                    ok = archive.verify_payload_crcs_parts(
                        payloads, [h.payload_crc for _, _, _, h in chunk]
                    )
                    if not ok.all():
                        bad = int(np.nonzero(~ok)[0][0])
                        ai, fi = chunk[bad][0], chunk[bad][1]
                        raise FrameHeaderInvalidPayloadCRC(
                            f"archive {ai} frame {fi} payload CRC mismatch"
                        )
                    n_blocks, w = decode_geometry(
                        params, [h.samples for _, _, _, h in chunk], [len(p) for p in payloads]
                    )
                    buf = np.zeros((batch_frames, w * 4), dtype=np.uint8)
                    ns = np.zeros(batch_frames, dtype=np.int32)
                    plens = np.zeros(batch_frames, dtype=np.int32)
                    for i, payload in enumerate(payloads):
                        arr = np.frombuffer(payload, dtype=np.uint8)
                        buf[i, : len(arr)] = arr
                        ns[i] = chunk[i][3].samples
                        plens[i] = len(arr)
                    yield params, chunk, buf, ns, plens, n_blocks

        prepared = prefetch_iter(_prepared(), depth=1)
        try:
            for params, chunk, buf, ns, plens, n_blocks in prepared:
                if mesh is not None:
                    dec, err = decode_frames_sharded(buf, ns, plens, params, mesh, n_blocks)
                else:
                    dec, err = decode_frames(buf, ns, plens, params, n_blocks)
                dec = np.asarray(dec)
                err = np.asarray(err)
                if err[: len(chunk)].any():
                    bad = int(np.nonzero(err)[0][0])
                    ai, fi = chunk[bad][0], chunk[bad][1]
                    raise decode_error(err[bad], f"archive {ai} frame {fi} failed to decode")
                for i, (ai, fi, off, h) in enumerate(chunk):
                    writer_for(ai).write(dec[i, : h.samples])
                    done[ai] += 1
                    if done[ai] == len(indexes[ai]):
                        writers.pop(ai).close()
        finally:
            # Stop the read-ahead thread BEFORE the outer finally closes
            # `handles` — otherwise a raise here could close a file the
            # producer is mid-read on (safe either way via the io lock,
            # but this keeps the ordering explicit).
            prepared.close()

        # Archives with zero frames still produce (empty) WAVs.
        for ai, index in enumerate(indexes):
            if not index:
                writer_for(ai)
                writers.pop(ai).close()
        return [int(sum(h.samples for _, h in index)) for index in indexes]
    finally:
        for wtr in writers.values():
            wtr.close()
        for f in handles:
            f.close()
