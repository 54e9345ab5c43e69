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
