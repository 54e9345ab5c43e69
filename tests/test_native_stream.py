"""Chunked native decode path (files._x3a_to_wav_native_stream).

The native engine's x3a_to_wav walks the archive in sequential chunks with
the native header walk and must keep EXACT accept/reject parity with the
Python walker path (walk_frames_file + _decode_payload_batch) — these tests
force tiny chunks so every carry/tail case is exercised, including frames
split across chunk boundaries.
"""

import numpy as np
import pytest

import x3_tpu.files as files
from x3_tpu import archive, native
from x3_tpu.errors import (
    FrameHeaderInvalidHeaderCRC,
    FrameHeaderInvalidPayloadCRC,
    FrameHeaderInvalidPayloadLen,
    MoreThanOneChannel,
)
from x3_tpu.files import wav_to_x3a, x3a_to_wav
from x3_tpu.params import Parameters
from x3_tpu.utils.wav import read_wav, write_wav

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")

P = Parameters()


@pytest.fixture()
def small_chunks(monkeypatch):
    # ~3 KB chunks: every archive below spans many chunks and splits frames
    # mid-payload at chunk boundaries, exercising the carry logic.
    monkeypatch.setattr(files, "_NATIVE_CHUNK_BYTES", 3000)


def _make_archive(tmp_path, n_samples=250_000, seed=3):
    rng = np.random.default_rng(seed)
    wav = np.clip(np.cumsum(rng.integers(-40, 41, n_samples)), -30000, 30000).astype(np.int16)
    wp, ap = str(tmp_path / "in.wav"), str(tmp_path / "a.x3a")
    write_wav(wp, wav, 96000)
    wav_to_x3a(wp, ap, engine="native")
    return wav, wp, ap


def _frame_index(ap):
    data = open(ap, "rb").read()
    spec, hs = archive.parse_archive_header(data)
    return data, list(archive.walk_frames(data, hs))


def test_chunked_roundtrip_bit_exact(tmp_path, small_chunks):
    wav, _, ap = _make_archive(tmp_path)
    rp = str(tmp_path / "rt.wav")
    assert x3a_to_wav(ap, rp, engine="native") == 0
    back, _ = read_wav(rp)
    assert np.array_equal(back, wav)


def test_chunked_payload_crc_mismatch_global_frame_number(tmp_path, small_chunks):
    _, _, ap = _make_archive(tmp_path)
    data, index = _frame_index(ap)
    # corrupt one payload byte deep in the archive (headers untouched)
    off, h = index[len(index) // 2]
    buf = bytearray(data)
    buf[off + h.payload_len // 2] ^= 0x20
    open(ap, "wb").write(bytes(buf))
    with pytest.raises(FrameHeaderInvalidPayloadCRC, match=f"frame {len(index) // 2} "):
        x3a_to_wav(ap, str(tmp_path / "rt.wav"), engine="native")


def test_chunked_header_crc_mismatch_raises_walker_class(tmp_path, small_chunks):
    _, _, ap = _make_archive(tmp_path)
    data, index = _frame_index(ap)
    off, _ = index[len(index) // 3]
    buf = bytearray(data)
    buf[off - 20 + 4] ^= 0x01  # flip a samples bit, header CRC now wrong
    open(ap, "wb").write(bytes(buf))
    with pytest.raises(FrameHeaderInvalidHeaderCRC):
        x3a_to_wav(ap, str(tmp_path / "rt.wav"), engine="native")


def test_chunked_truncation_raises_payload_len(tmp_path, small_chunks):
    _, _, ap = _make_archive(tmp_path)
    data = open(ap, "rb").read()
    open(ap, "wb").write(data[: len(data) - 123])
    with pytest.raises(FrameHeaderInvalidPayloadLen, match="overruns"):
        x3a_to_wav(ap, str(tmp_path / "rt.wav"), engine="native")


def test_chunked_short_trailing_garbage_is_silent(tmp_path, small_chunks):
    wav, _, ap = _make_archive(tmp_path)
    data = open(ap, "rb").read()
    open(ap, "wb").write(data + b"\x00" * 20)  # walker stops at <= 20 tail bytes
    rp = str(tmp_path / "rt.wav")
    assert x3a_to_wav(ap, rp, engine="native") == 0
    back, _ = read_wav(rp)
    assert np.array_equal(back, wav)


def test_chunked_channels_byte_raises(tmp_path, small_chunks):
    _, _, ap = _make_archive(tmp_path)
    data, index = _frame_index(ap)
    off, _ = index[len(index) // 2]
    buf = bytearray(data)
    hoff = off - 20
    buf[hoff + 3] = 2  # channels byte
    crc = archive.crc16(bytes(buf[hoff : hoff + 16]))  # restamp header CRC
    buf[hoff + 16 : hoff + 18] = crc.to_bytes(2, "big")
    open(ap, "wb").write(bytes(buf))
    with pytest.raises(MoreThanOneChannel):
        x3a_to_wav(ap, str(tmp_path / "rt.wav"), engine="native")


def test_chunked_decode_error_stops_at_first_bad(tmp_path, small_chunks, capsys):
    """Payload CRC valid but content undecodable (invalid BFP header):
    stop-at-first-bad accounting, frames before the bad one written."""
    wav, _, ap = _make_archive(tmp_path)
    data, index = _frame_index(ap)
    bad_fi = len(index) // 2
    off, h = index[bad_fi]
    buf = bytearray(data)
    # Overwrite the payload after the first sample with zeros: block header
    # ftype 0 + num_bits 1 <= 5 -> FrameDecodeInvalidBPF on every engine.
    buf[off + 2 : off + h.payload_len] = bytes(h.payload_len - 2)
    crc = archive.crc16(bytes(buf[off : off + h.payload_len]))
    buf[off - 2 : off] = crc.to_bytes(2, "big")  # restamp payload CRC
    open(ap, "wb").write(bytes(buf))
    rp = str(tmp_path / "rt.wav")
    assert x3a_to_wav(ap, rp, engine="native") == 1
    assert f"frame {bad_fi} failed to decode" in capsys.readouterr().out
    back, _ = read_wav(rp)
    n_before = sum(h.samples for _, h in index[:bad_fi])
    assert np.array_equal(back, wav[:n_before])
