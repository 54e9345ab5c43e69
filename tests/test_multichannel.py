"""Multi-channel container convention (.x3m manifest over mono archives)."""

import numpy as np
import pytest

from tests.conftest import make_hydrophone, make_mixed
from x3_tpu.errors import X3Error
from x3_tpu.multichannel import (
    decode_multichannel,
    encode_multichannel,
    wav_to_x3m,
    write_wav_multichannel,
    x3m_to_wav,
)
from x3_tpu.models import oracle
from x3_tpu.params import Parameters

P = Parameters()


def test_multichannel_roundtrip(tmp_path, rng):
    chans = np.stack([make_hydrophone(rng, 23_456), make_mixed(rng, 23_456),
                      make_hydrophone(rng, 23_456, amplitude=12.0)])
    mpath = encode_multichannel(chans, 96_000, tmp_path / "cap.x3m")
    assert mpath.name == "cap.x3m"
    # per-channel archives are plain X3 files, identical to mono encoding
    for k in range(3):
        data = (tmp_path / f"cap.ch{k}.x3a").read_bytes()
        assert oracle.encode(chans[k], P) in data
    got, rate = decode_multichannel(mpath)
    assert rate == 96_000
    np.testing.assert_array_equal(got, chans)


def test_multichannel_wav_roundtrip(tmp_path, rng):
    chans = np.stack([make_hydrophone(rng, 12_000), make_mixed(rng, 12_000)])
    wav_in, wav_out = tmp_path / "st.wav", tmp_path / "st_back.wav"
    write_wav_multichannel(wav_in, chans, 44_100)
    mpath = wav_to_x3m(wav_in, tmp_path / "st")
    assert x3m_to_wav(mpath, wav_out) == 2
    from x3_tpu.multichannel import read_wav_multichannel

    got, rate = read_wav_multichannel(wav_out)
    assert rate == 44_100
    np.testing.assert_array_equal(got, chans)


def test_x3m_info_and_verify(tmp_path, rng):
    from x3_tpu.cli import main as cli_main
    from x3_tpu.multichannel import verify_x3m, x3m_info

    chans = np.stack([make_hydrophone(rng, 12_000), make_hydrophone(rng, 12_000, amplitude=9.0)])
    mpath = encode_multichannel(chans, 48_000, tmp_path / "cap.x3m")

    info = x3m_info(mpath)
    assert info["channels"] == 2
    assert info["sample_rate"] == 48_000
    assert info["samples_per_channel"] == 12_000
    assert info["pcm_bytes"] == 2 * 2 * 12_000
    assert len(info["per_channel"]) == 2
    assert info["compression_ratio"] > 1.0

    rep = verify_x3m(mpath, engine="numpy")
    assert rep["ok"] and rep["channels"] == 2 and rep["frame_errors"] == 0
    assert cli_main(["-i", str(mpath), "--info", "--verify", "--engine", "numpy", "-q"]) == 0

    # damage channel 1's archive: verify fails, the clean channel stays ok
    ch1 = tmp_path / "cap.ch1.x3a"
    data = bytearray(ch1.read_bytes())
    data[-10] ^= 0xFF
    ch1.write_bytes(bytes(data))
    rep = verify_x3m(mpath, engine="numpy")
    assert not rep["ok"]
    assert rep["per_channel"][0]["ok"] and not rep["per_channel"][1]["ok"]
    assert cli_main(["-i", str(mpath), "--verify", "--engine", "numpy", "-q"]) == 1


def test_manifest_validation(tmp_path, rng):
    bad = tmp_path / "bad.x3m"
    bad.write_text('{"format": "nope"}')
    with pytest.raises(X3Error):
        decode_multichannel(bad)


def test_manifest_version_gate_everywhere(tmp_path, rng):
    """A future-version manifest is rejected by EVERY consumer (decode,
    info, verify) — the version check lives in the shared loader."""
    from x3_tpu.multichannel import verify_x3m, x3m_info

    chans = np.stack([make_hydrophone(rng, 5_000)])
    mpath = encode_multichannel(chans, 48_000, tmp_path / "cap.x3m")
    import json

    manifest = json.loads(mpath.read_text())
    manifest["version"] = 99
    mpath.write_text(json.dumps(manifest))
    for fn in (decode_multichannel, x3m_info, verify_x3m):
        with pytest.raises(X3Error, match="version 99"):
            fn(mpath)


def test_verify_x3m_reports_reason_and_engine(tmp_path, rng):
    """Manifest-consistency failures carry a visible reason, and the report's
    engine is the resolved one, not the 'auto' alias (ADVICE r3 items 1+4)."""
    import json

    from x3_tpu.multichannel import verify_x3m

    chans = np.stack([make_hydrophone(rng, 12_000), make_hydrophone(rng, 12_000, amplitude=6.0)])
    mpath = encode_multichannel(chans, 48_000, tmp_path / "cap.x3m")
    rep = verify_x3m(mpath, engine="numpy")
    assert rep["ok"] and rep["engine"] == "numpy"

    manifest = json.loads(mpath.read_text())
    manifest["samples"] = 11_000  # lie about the per-channel sample count
    mpath.write_text(json.dumps(manifest))
    rep = verify_x3m(mpath, engine="numpy")
    assert not rep["ok"]
    assert rep["frame_errors"] == 0 and rep["skipped_bytes"] == 0
    assert "12000 != manifest 11000" in rep["reason"]  # not a silent FAILED
    assert all("12000 != manifest 11000" in r["reason"] for r in rep["per_channel"])

    manifest["samples"] = 12_000
    manifest["channels"] = 3  # channel-count mismatch
    mpath.write_text(json.dumps(manifest))
    rep = verify_x3m(mpath, engine="numpy")
    assert not rep["ok"] and "channels=3" in rep["reason"]


def test_verify_and_info_on_garbage_archive(tmp_path):
    """A corrupt ARCHIVE header produces a clean FAILED report / exit, never
    a traceback (ADVICE r3 item 3)."""
    from x3_tpu.cli import main as cli_main
    from x3_tpu.files import verify_x3a

    junk = tmp_path / "junk.x3a"
    junk.write_bytes(b"\x00\xffnot an archive at all" * 4)
    rep = verify_x3a(junk, engine="numpy")
    assert not rep["ok"] and "archive header invalid" in rep["reason"]
    assert cli_main(["-i", str(junk), "--verify", "--engine", "numpy", "-q"]) == 1
    with pytest.raises(SystemExit):
        cli_main(["-i", str(junk), "--info"])
    bad_manifest = tmp_path / "junk.x3m"
    bad_manifest.write_text("{ not json")
    with pytest.raises(SystemExit):
        cli_main(["-i", str(bad_manifest), "--verify"])


def test_x3m_to_wav_streams_in_windows(tmp_path, rng):
    """The streaming x3m->wav path (multiple frame-aligned windows) is
    byte-identical to the in-memory decode."""
    from x3_tpu.multichannel import read_wav_multichannel

    chans = np.stack([make_hydrophone(rng, 34_567), make_mixed(rng, 34_567)])
    mpath = encode_multichannel(chans, 96_000, tmp_path / "cap.x3m")
    out = tmp_path / "back.wav"
    # batch_frames=1 forces one window per frame: several windows + a
    # partial tail window exercise the window loop.
    assert x3m_to_wav(mpath, out, engine="numpy", batch_frames=1) == 2
    got, rate = read_wav_multichannel(out)
    assert rate == 96_000
    np.testing.assert_array_equal(got, chans)
