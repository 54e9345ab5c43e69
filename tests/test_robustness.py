"""Robustness: hostile/garbage inputs must fail cleanly, never crash or hang."""

import numpy as np
import pytest

from tests.conftest import make_hydrophone
from x3_tpu import archive
from x3_tpu.errors import X3Error
from x3_tpu.models import oracle
from x3_tpu.models.decoder import decode_frames_batch
from x3_tpu.params import Parameters

P = Parameters()


def test_decode_kernel_on_garbage(rng):
    """Random bytes through the batched decoder: finishes, flags or returns
    *something* without crashing; never loops forever."""
    payloads = [bytes(rng.integers(0, 256, int(rng.integers(2, 3000))).astype(np.uint8)) for _ in range(8)]
    ns = [int(rng.integers(1, 10001)) for _ in payloads]
    outs, errs = decode_frames_batch(payloads, ns, P)
    assert len(outs) == 8  # completed


def test_oracle_decode_on_garbage_raises_or_returns(rng):
    for _ in range(10):
        payload = bytes(rng.integers(0, 256, 200).astype(np.uint8))
        try:
            oracle.decode_frame(payload, P, 500)
        except X3Error:
            pass  # clean classified failure is fine


def test_native_decode_on_garbage(rng):
    from x3_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    for _ in range(10):
        payload = bytes(rng.integers(0, 256, 200).astype(np.uint8))
        try:
            native.decode_frame(payload, P, 500)
        except X3Error:
            pass


def test_archive_parse_on_garbage(rng):
    from x3_tpu.errors import ArchiveHeaderXMLInvalidKey

    with pytest.raises(ArchiveHeaderXMLInvalidKey):
        archive.parse_archive_header(bytes(rng.integers(0, 256, 100).astype(np.uint8)))
    with pytest.raises(X3Error):
        archive.parse_archive_header(b"X3ARCHIV" + bytes(50))


def test_walk_frames_on_truncated_stream(rng):
    """A valid header whose payload overruns EOF raises without resync
    (parity: decodefile.rs:118-121) and is skipped with resync."""
    from x3_tpu.errors import FrameHeaderInvalidPayloadLen

    wav = make_hydrophone(rng, 15_000)
    stream = oracle.encode(wav, P)
    truncated = stream[: len(stream) - 37]  # cut inside last frame payload
    with pytest.raises(FrameHeaderInvalidPayloadLen):
        list(archive.walk_frames(truncated, 0))
    frames = list(archive.walk_frames(truncated, 0, resync=True))
    assert len(frames) == 1  # only the complete frame indexed


def test_walk_frames_header_crc_error_propagates(rng):
    """A corrupted frame header raises without resync (the reference
    propagates header-CRC errors, decodefile.rs:112) instead of silently
    truncating the index."""
    from x3_tpu.errors import FrameHeaderInvalidHeaderCRC

    wav = make_hydrophone(rng, 25_000)  # 3 frames
    stream = bytearray(oracle.encode(wav, P))
    index = list(archive.walk_frames(bytes(stream), 0))
    off1, _ = index[1]
    stream[off1 - 20 + 3] ^= 0xFF  # corrupt frame 1's header
    with pytest.raises(FrameHeaderInvalidHeaderCRC):
        list(archive.walk_frames(bytes(stream), 0))
    frames = list(archive.walk_frames(bytes(stream), 0, resync=True))
    assert len(frames) == 2  # frames 0 and 2 recovered via sync scan


def test_decoder_error_flag_on_truncated_payload(rng):
    wav = make_hydrophone(rng, 10_000)
    frame = oracle.encode(wav, P)
    payload = frame[20:]
    # Cut the payload in half: bit reader runs off the end -> zeros; either
    # an error flag or a clean (wrong) decode, but no crash.
    outs, errs = decode_frames_batch([payload[: len(payload) // 2]], [10_000], P)
    assert len(outs) == 1


def test_kernel_vs_oracle_on_random_valid_like_streams(rng):
    """Fuzz: random bit soup that *starts* with valid block headers —
    kernel and oracle must agree on the decoded samples wherever neither
    errors."""
    from x3_tpu.ops.bitio import BitWriter

    for trial in range(5):
        bw = BitWriter()
        bw.write_bits(0, 16)  # first sample 0
        # one valid-ish rice-1 block of 20 unary codes
        bw.write_bits(1, 2)
        for _ in range(20):
            z = int(rng.integers(0, 14))
            bw.write_bits(1, z + 1)  # z zeros then stop bit
        bw.word_align()
        payload = bw.getvalue()
        n = 21
        want = oracle.decode_frame(payload, P, n)
        outs, errs = decode_frames_batch([payload], [n], P)
        if not errs[0]:
            np.testing.assert_array_equal(outs[0], want)


def test_differential_fuzz_jax_vs_oracle(rng):
    """Many random signals through one compiled kernel shape: jax encode
    must equal the oracle byte-for-byte, and decode must roundtrip."""
    from x3_tpu.ops.decode_kernel import decode_frames
    from x3_tpu.ops.encode_kernel import encode_frames, frame_geometry

    tiny = Parameters(block_len=4, blocks_per_frame=8)  # 32 samples/frame
    S, B, L, W = frame_geometry(tiny)
    for trial in range(30):
        kind = trial % 3
        n = int(rng.integers(1, 2 * S + 1))
        if kind == 0:
            wav = np.clip(np.cumsum(rng.integers(-3, 4, n)), -32768, 32767).astype(np.int16)
        elif kind == 1:
            wav = rng.integers(-32768, 32768, n).astype(np.int16)
        else:
            scale = int(rng.integers(1, 2000))
            wav = np.clip(np.cumsum(rng.integers(-scale, scale + 1, n)), -32768, 32767).astype(np.int16)
        batch = np.zeros((2, S), np.int16)
        nv = np.zeros(2, np.int32)
        for i, start in enumerate(range(0, n, S)):
            if i >= 2:
                break
            chunk = wav[start : start + S]
            batch[i, : len(chunk)] = chunk
            nv[i] = len(chunk)
        res = encode_frames(batch, nv, tiny)
        payload = np.ascontiguousarray(res["payload_words"]).byteswap().view(np.uint8)
        nbytes = np.asarray(res["nbytes"])
        crcs = np.asarray(res["crc"])
        pos = 0
        for i in range(2):
            if nv[i] == 0:
                continue
            want, want_crc = oracle.encode_frame_payload(wav[pos : pos + nv[i]], tiny)
            assert payload[i, : nbytes[i]].tobytes() == want, f"trial {trial} frame {i}"
            assert crcs[i] == want_crc
            pos += nv[i]
        dec, err = decode_frames(payload, np.asarray(nv), nbytes, tiny)
        dec = np.asarray(dec)
        assert not np.asarray(err)[: (n + S - 1) // S].any()
        got = np.concatenate([dec[i, : nv[i]] for i in range(2) if nv[i]])
        np.testing.assert_array_equal(got, wav[: len(got)])
