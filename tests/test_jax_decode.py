"""Frame-parallel JAX decode vs oracle encode/decode: bit-exact roundtrips."""

import numpy as np
import pytest

from tests.conftest import make_hydrophone, make_mixed
from x3_tpu.models import oracle
from x3_tpu.models.decoder import decode_frame, decode_frames_batch
from x3_tpu.params import Parameters

P = Parameters()


def frames_of(wav):
    """Oracle-encode wav and split into (payload, n_samples) frames."""
    stream = oracle.encode(wav, P)
    out, pos = [], 0
    while pos < len(stream):
        h = stream[pos : pos + 20]
        ns = int.from_bytes(h[4:6], "big")
        pl = int.from_bytes(h[6:8], "big")
        out.append((stream[pos + 20 : pos + 20 + pl], ns))
        pos += 20 + pl
    return out


@pytest.mark.parametrize("n", [1, 2, 19, 20, 21, 9_999, 10_000, 10_001, 25_000])
def test_decode_hydrophone_sizes(rng, n):
    wav = make_hydrophone(rng, n)
    frames = frames_of(wav)
    outs, err = decode_frames_batch([p for p, _ in frames], [s for _, s in frames], P)
    assert not err.any()
    np.testing.assert_array_equal(np.concatenate(outs), wav)


def test_decode_mixed(rng):
    wav = make_mixed(rng, 34_567)
    frames = frames_of(wav)
    outs, err = decode_frames_batch([p for p, _ in frames], [s for _, s in frames], P)
    assert not err.any()
    np.testing.assert_array_equal(np.concatenate(outs), wav)


def test_decode_white_noise(rng):
    wav = rng.integers(-32768, 32768, 12_345).astype(np.int16)
    frames = frames_of(wav)
    outs, err = decode_frames_batch([p for p, _ in frames], [s for _, s in frames], P)
    assert not err.any()
    np.testing.assert_array_equal(np.concatenate(outs), wav)


def test_decode_silence():
    wav = np.zeros(20_000, dtype=np.int16)
    frames = frames_of(wav)
    outs, err = decode_frames_batch([p for p, _ in frames], [s for _, s in frames], P)
    assert not err.any()
    np.testing.assert_array_equal(np.concatenate(outs), wav)


def test_decode_golden_frame(golden):
    frame = bytes(golden["frame_expected"])
    ns = int.from_bytes(frame[4:6], "big")
    out = decode_frame(frame[20:], P, ns)
    np.testing.assert_array_equal(out, golden["frame_wav"])


def test_decode_corrupt_flags_error(rng):
    wav = make_hydrophone(rng, 5_000)
    (payload, ns), = frames_of(wav)
    # Invalid BFP header: ftype=0, field=2 -> num_bits=3 (<=5 is invalid).
    bad = bytearray(payload)
    bad[2] = 0b00_0010_00
    _, err = decode_frames_batch([bytes(bad)], [ns], P)
    assert err[0]


def test_decode_vs_oracle_per_frame(rng):
    wav = make_mixed(rng, 10_000)
    (payload, ns), = frames_of(wav)
    want = oracle.decode_frame(payload, P, ns)
    got = decode_frame(payload, P, ns)
    np.testing.assert_array_equal(got, want)
