"""File-level API: wav_to_x3a / x3a_to_wav / X3aReader.

Parity surface with the reference's encodefile.rs / decodefile.rs, built on
the batched device pipelines: a whole file's frames are encoded or decoded in
a few large device calls instead of one frame at a time.

Behavior parity notes (decodefile.rs:105-136):
* header or payload CRC mismatches raise (they propagate in the reference);
* frame *decode* errors are counted and decoding stops at the first bad
  frame, like the reference's swallowed Ok(None);
* with resync=True (our extension, enabled by the format's self-contained
  frames), corrupt frames are skipped via the sync scanner instead.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from . import archive, constants
from .errors import FrameHeaderInvalidPayloadCRC, X3Error
from .models.decoder import decode_frames_batch
from .models.encoder import EncodeResult, encode
from .models import oracle
from .params import Parameters, X3aSpec
from .utils.wav import read_wav, write_wav

DEFAULT_BATCH_FRAMES = 256


def wav_to_x3a(
    wav_filename,
    x3a_filename,
    params: Parameters | None = None,
    engine: str = "jax",
    verbose: bool = False,
) -> EncodeResult:
    """Convert a mono 16-bit .wav file to an .x3a archive
    (parity: encodefile.rs:48-77)."""
    params = params or Parameters()
    samples, sample_rate = read_wav(wav_filename)
    header = archive.build_archive_header(sample_rate, params)
    result = encode(samples, params, engine=engine)
    with open(x3a_filename, "wb") as f:
        f.write(header)
        f.write(result.data)
    if verbose:
        print(result.format_stats())
    return result


def x3a_to_wav(
    x3a_filename,
    wav_filename,
    engine: str = "jax",
    verbose: bool = False,
    resync: bool = False,
    batch_frames: int = DEFAULT_BATCH_FRAMES,
) -> int:
    """Convert an .x3a archive back to a .wav file
    (parity: decodefile.rs:189-212).  Returns the number of frame errors."""
    data = Path(x3a_filename).read_bytes()
    spec, header_size = archive.parse_archive_header(data)
    if verbose:
        print(f"sample rate: {spec.sample_rate}")
        print(f"block length: {spec.params.block_len}")
        codes = spec.params.codes
        print(f"Rice codes: RICE{codes[0]},RICE{codes[1]},RICE{codes[2]},BFP")
        t = spec.params.thresholds
        print(f"thresholds: {t[0]},{t[1]},{t[2]}")

    index = list(archive.walk_frames(data, header_size, resync=resync))
    if engine == "jax":
        crc_ok = None  # verified on device, fused into the decode batches
    else:
        crc_ok = archive.verify_payload_crcs(data, index)
        if not resync and not crc_ok.all():
            bad = int(np.nonzero(~crc_ok)[0][0])
            raise FrameHeaderInvalidPayloadCRC(f"frame {bad} payload CRC mismatch")

    frame_errors = 0
    chunks: list[np.ndarray] = []
    stop = False
    for base in range(0, len(index), batch_frames):
        if stop:
            break
        batch = index[base : base + batch_frames]
        payloads = [data[off : off + h.payload_len] for off, h in batch]
        ns = [h.samples for _, h in batch]
        if engine in ("numpy", "native"):
            if engine == "native":
                from . import native as native_mod

                # Fast path: frame-parallel native decode of the batch —
                # only when every frame's payload CRC checked out, so
                # CRC-failed frames are never silently included (with
                # resync they must be skipped and counted instead).
                batch_crcs_ok = bool(crc_ok[base : base + len(batch)].all())
                try:
                    if not batch_crcs_ok:
                        raise X3Error("CRC-failed frames in batch")
                    nat_index = [(off, h.samples, h.payload_len) for off, h in batch]
                    flat = native_mod.decode_frames_mt(data, nat_index, spec.params)
                    outs, errs, pos = [], [], 0
                    for _, h in batch:
                        outs.append(flat[pos : pos + h.samples])
                        errs.append(False)
                        pos += h.samples
                    errs = np.asarray(errs)
                    chunks.extend(outs)
                    continue
                except X3Error:
                    # Fall through to per-frame decode for error accounting.
                    dec = lambda p, n: native_mod.decode_frame(p, spec.params, n)
            else:
                dec = lambda p, n: oracle.decode_frame(p, spec.params, n)
            outs, errs = [], []
            for p, n in zip(payloads, ns):
                try:
                    outs.append(dec(p, n))
                    errs.append(False)
                except X3Error:
                    outs.append(np.zeros(0, np.int16))
                    errs.append(True)
            errs = np.asarray(errs)
        else:
            want_crcs = [h.payload_crc for _, h in batch]
            outs, errs, batch_crc_ok = decode_frames_batch(payloads, ns, spec.params, check_crcs=want_crcs)
            if not resync and not batch_crc_ok.all():
                bad = base + int(np.nonzero(~batch_crc_ok)[0][0])
                raise FrameHeaderInvalidPayloadCRC(f"frame {bad} payload CRC mismatch")
            if resync:
                errs = np.where(~batch_crc_ok, 4, errs)  # 4 = payload CRC
        if resync and crc_ok is not None:
            errs = errs | ~crc_ok[base : base + len(batch)]
        for i, (out, err) in enumerate(zip(outs, errs)):
            if err:
                frame_errors += 1
                print(f"Frame error: frame {base + i} failed to decode")
                if not resync:
                    stop = True  # reference stops at the first bad frame
                    break
                continue
            chunks.append(out)

    samples = np.concatenate(chunks) if chunks else np.zeros(0, np.int16)
    write_wav(wav_filename, samples, spec.sample_rate)
    return frame_errors


class X3aReader:
    """Streaming frame-by-frame reader (parity: decodefile.rs:47-137)."""

    def __init__(self, filename, engine: str = "jax", batch_frames: int = DEFAULT_BATCH_FRAMES):
        self._data = Path(filename).read_bytes()
        self._spec, header_size = archive.parse_archive_header(self._data)
        self._index = list(archive.walk_frames(self._data, header_size))
        self._cursor = 0
        self._engine = engine
        self._batch_frames = batch_frames
        self._cache: dict[int, np.ndarray | None] = {}
        self.frame_errors = 0
        self._stopped = False

    @classmethod
    def open(cls, filename, **kw) -> "X3aReader":
        return cls(filename, **kw)

    @property
    def spec(self) -> X3aSpec:
        return self._spec

    def __len__(self) -> int:
        return len(self._index)

    def _decode_batch(self, base: int):
        batch = self._index[base : base + self._batch_frames]
        payloads = [self._data[off : off + h.payload_len] for off, h in batch]
        ns = [h.samples for _, h in batch]
        # Payload CRC check (decodefile.rs:93-103) raises like the reference;
        # the jax engine verifies on device, fused into the decode batch.
        if self._engine != "jax":
            ok = archive.verify_payload_crcs(self._data, batch)
            if not ok.all():
                bad = base + int(np.nonzero(~ok)[0][0])
                raise FrameHeaderInvalidPayloadCRC(f"frame {bad} payload CRC mismatch")
        if self._engine in ("numpy", "native"):
            if self._engine == "native":
                from . import native as native_mod

                dec = lambda p, n: native_mod.decode_frame(p, self._spec.params, n)
            else:
                dec = lambda p, n: oracle.decode_frame(p, self._spec.params, n)
            for i, (p, n) in enumerate(zip(payloads, ns)):
                try:
                    self._cache[base + i] = dec(p, n)
                except X3Error:
                    self._cache[base + i] = None
        else:
            want_crcs = [h.payload_crc for _, h in batch]
            outs, errs, crc_ok = decode_frames_batch(
                payloads, ns, self._spec.params, check_crcs=want_crcs
            )
            if not crc_ok.all():
                bad = base + int(np.nonzero(~crc_ok)[0][0])
                raise FrameHeaderInvalidPayloadCRC(f"frame {bad} payload CRC mismatch")
            for i, (out, err) in enumerate(zip(outs, errs)):
                self._cache[base + i] = None if err else out

    def decode_next_frame(self) -> np.ndarray | None:
        """Next frame's samples, or None at EOF / after the first bad frame
        (reference behavior: decodefile.rs:128-135)."""
        if self._stopped or self._cursor >= len(self._index):
            return None
        i = self._cursor
        if i not in self._cache:
            base = (i // self._batch_frames) * self._batch_frames
            self._decode_batch(base)
        out = self._cache.pop(i)
        if out is None:
            self.frame_errors += 1
            print(f"Frame error: frame {i} failed to decode")
            self._stopped = True
            return None
        self._cursor += 1
        return out
