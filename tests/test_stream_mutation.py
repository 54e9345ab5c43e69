"""Archive-level multi-frame interaction mutations.

The per-block and per-header mutation fuzz (test_corpus_gate.py) covers
single-frame damage; these tests mutate the FRAME STREAM structure —
truncation, deletion, duplication, inter-frame garbage, cross-params
splices — and assert the reference-parity semantics hold across engines:

* non-resync decode stops at the first bad frame and raises the matching
  error class (decodefile.rs:93-135);
* a truncated payload raises FrameHeaderInvalidPayloadLen
  (decodefile.rs:118-121); a tail shorter than one header is clean EOF
  (decodefile.rs:107-109);
* resync=True (our extension, enabled by the format's self-contained
  frames) recovers every intact frame after the damage;
* frames are self-contained, so deleting/duplicating whole frames leaves
  a VALID stream (the property the parallel decoder is built on);
* all engines agree byte-for-byte on what they accept.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import make_hydrophone
from x3_tpu import archive, errors
from x3_tpu.files import wav_to_x3a, x3a_to_wav
from x3_tpu.params import Parameters
from x3_tpu.utils.wav import read_wav, write_wav

P = Parameters()
SPF = P.samples_per_frame
N_FRAMES = 4


def _engines():
    from x3_tpu import native

    return ["jax", "numpy"] + (["native"] if native.available() else [])


@pytest.fixture(scope="module")
def arch(tmp_path_factory):
    """A 4-frame archive + its frame index + the source samples."""
    td = tmp_path_factory.mktemp("stream_mut")
    rng = np.random.default_rng(11)
    wav = make_hydrophone(rng, N_FRAMES * SPF)
    wp, xp = td / "src.wav", td / "src.x3a"
    write_wav(wp, wav, 96000)
    wav_to_x3a(wp, xp, engine="numpy")
    data = xp.read_bytes()
    _, hdr_end = archive.parse_archive_header(data)
    idx = list(archive.walk_frames(data, hdr_end))
    assert len(idx) == N_FRAMES
    return {"data": data, "hdr_end": hdr_end, "idx": idx, "wav": wav, "td": td}


def _frame_span(arch_, i):
    payload_off, h = arch_["idx"][i]
    return payload_off - 20, payload_off + h.payload_len


def _decode_all_engines(td, blob: bytes, resync: bool):
    """Decode the blob with every engine; return {engine: (outcome, samples)}
    where outcome is 'ok:<n_errors>' or the raised error class name."""
    out = {}
    for eng in _engines():
        xp = td / f"mut_{eng}_{resync}.x3a"
        wp = td / f"mut_{eng}_{resync}.wav"
        xp.write_bytes(blob)
        try:
            n_err = x3a_to_wav(xp, wp, engine=eng, resync=resync)
            samples, _ = read_wav(wp)
            out[eng] = (f"ok:{n_err}", samples)
        except errors.X3Error as e:
            out[eng] = (type(e).__name__, None)
    return out


def _assert_agree(res):
    kinds = {o for o, _ in res.values()}
    assert len(kinds) == 1, f"engine outcome divergence: { {k: v[0] for k, v in res.items()} }"
    vals = [s for _, s in res.values() if s is not None]
    for v in vals[1:]:
        np.testing.assert_array_equal(vals[0], v)
    return next(iter(res.values()))


def test_truncate_mid_payload(arch):
    """Cut inside frame 2's payload: non-resync raises
    FrameHeaderInvalidPayloadLen (decodefile.rs:118-121); resync drops the
    torn frame and keeps everything before it."""
    s2, e2 = _frame_span(arch, 2)
    blob = arch["data"][: s2 + 20 + 7]
    outcome, _ = _assert_agree(_decode_all_engines(arch["td"], blob, resync=False))
    assert outcome == "FrameHeaderInvalidPayloadLen"
    outcome, samples = _assert_agree(_decode_all_engines(arch["td"], blob, resync=True))
    assert outcome.startswith("ok")
    np.testing.assert_array_equal(samples, arch["wav"][: 2 * SPF])


def test_truncate_mid_header_is_clean_eof(arch):
    """A tail shorter than one 20-byte header is EOF, not an error
    (decodefile.rs:107-109)."""
    s3, _ = _frame_span(arch, 3)
    blob = arch["data"][: s3 + 11]
    outcome, samples = _assert_agree(_decode_all_engines(arch["td"], blob, resync=False))
    assert outcome == "ok:0"
    np.testing.assert_array_equal(samples, arch["wav"][: 3 * SPF])


def test_delete_whole_frame(arch):
    """Frames are self-contained: removing one leaves a valid stream whose
    decode is the concatenation of the surviving frames."""
    s1, e1 = _frame_span(arch, 1)
    blob = arch["data"][:s1] + arch["data"][e1:]
    want = np.concatenate([arch["wav"][:SPF], arch["wav"][2 * SPF :]])
    for resync in (False, True):
        outcome, samples = _assert_agree(_decode_all_engines(arch["td"], blob, resync))
        assert outcome == "ok:0"
        np.testing.assert_array_equal(samples, want)


def test_duplicate_whole_frame(arch):
    s1, e1 = _frame_span(arch, 1)
    blob = arch["data"][:e1] + arch["data"][s1:e1] + arch["data"][e1:]
    want = np.concatenate(
        [arch["wav"][: 2 * SPF], arch["wav"][SPF : 2 * SPF], arch["wav"][2 * SPF :]]
    )
    outcome, samples = _assert_agree(_decode_all_engines(arch["td"], blob, resync=False))
    assert outcome == "ok:0"
    np.testing.assert_array_equal(samples, want)


def test_interframe_garbage_with_fake_sync(arch):
    """Garbage between frames (containing 'x3' bytes whose header CRC is
    wrong): non-resync raises the header error; resync scans past every
    false sync candidate and recovers all later frames."""
    rng = np.random.default_rng(5)
    garbage = bytearray(rng.integers(0, 256, 97, dtype=np.uint8).tobytes())
    garbage[10:12] = b"x3"  # false sync candidates
    garbage[50:52] = b"x3"
    s1, _ = _frame_span(arch, 1)
    blob = arch["data"][:s1] + bytes(garbage) + arch["data"][s1:]
    outcome, _ = _assert_agree(_decode_all_engines(arch["td"], blob, resync=False))
    assert outcome in ("FrameHeaderInvalidHeaderCRC", "FrameHeaderInvalidKey")
    outcome, samples = _assert_agree(_decode_all_engines(arch["td"], blob, resync=True))
    assert outcome.startswith("ok")
    np.testing.assert_array_equal(samples, arch["wav"])


def test_corrupt_sync_key_resync_recovers_tail(arch):
    s1, _ = _frame_span(arch, 1)
    blob = bytearray(arch["data"])
    blob[s1] ^= 0xFF  # destroy frame 1's sync byte
    blob = bytes(blob)
    outcome, _ = _assert_agree(_decode_all_engines(arch["td"], blob, resync=False))
    assert outcome in ("FrameHeaderInvalidHeaderCRC", "FrameHeaderInvalidKey")
    outcome, samples = _assert_agree(_decode_all_engines(arch["td"], blob, resync=True))
    assert outcome.startswith("ok")
    np.testing.assert_array_equal(samples[:SPF], arch["wav"][:SPF])
    np.testing.assert_array_equal(samples[-2 * SPF :], arch["wav"][-2 * SPF :])


def test_verify_matches_resync_decode(arch):
    """verify_x3a (the integrity tool) must agree with the resync decode
    path on every engine and every structural mutation: same per-frame
    error count, and the ok-sample total equals the resync WAV's length."""
    from x3_tpu.files import verify_x3a

    td, data = arch["td"], arch["data"]
    s1, e1 = _frame_span(arch, 1)
    corrupt = bytearray(data)
    corrupt[s1 + 25] ^= 0xFF  # payload byte of frame 1
    garbage = b"\x99" * 33
    mutations = {
        "pristine": data,
        "corrupt_payload": bytes(corrupt),
        "truncate_tail": data[:-50],
        "garbage_mid": data[:s1] + garbage + data[s1:],
        "delete_frame": data[:s1] + data[e1:],
    }
    for name, blob in mutations.items():
        for eng in _engines():
            xp = td / f"verify_{name}_{eng}.x3a"
            wp = td / f"verify_{name}_{eng}.wav"
            xp.write_bytes(blob)
            rep = verify_x3a(xp, engine=eng)
            n_err = x3a_to_wav(xp, wp, engine=eng, resync=True)
            samples, _ = read_wav(wp)
            assert rep["frame_errors"] == n_err, (name, eng, rep)
            assert rep["n_samples_ok"] == len(samples), (name, eng, rep)
            clean = name in ("pristine", "delete_frame")
            assert rep["ok"] == clean, (name, eng, rep)
            assert (rep["skipped_bytes"] > 0) == (name in ("truncate_tail", "garbage_mid")), (
                name, eng, rep,
            )


def test_cross_params_splice_engines_agree(arch, tmp_path):
    """Splice a frame encoded under different params into the archive: the
    headers and payload CRCs are valid, so decoders interpret the payload
    under the archive's params.  There is no right answer — the contract is
    that every engine produces the SAME outcome and samples."""
    rng = np.random.default_rng(13)
    other = Parameters(block_len=10, blocks_per_frame=1000)  # same spf
    wav2 = make_hydrophone(rng, SPF)
    wp2, xp2 = tmp_path / "o.wav", tmp_path / "o.x3a"
    write_wav(wp2, wav2, 96000)
    wav_to_x3a(wp2, xp2, params=other, engine="numpy")
    d2 = xp2.read_bytes()
    _, h2 = archive.parse_archive_header(d2)
    idx2 = list(archive.walk_frames(d2, h2))
    po2, fh2 = idx2[0]
    f2 = d2[po2 - 20 : po2 + fh2.payload_len]
    blob = arch["data"] + f2
    for resync in (False, True):
        res = _decode_all_engines(arch["td"], blob, resync)
        _assert_agree(res)
