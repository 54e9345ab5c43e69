"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import jax
import numpy as np

from tests.conftest import make_mixed
from x3_tpu.models import oracle
from x3_tpu.parallel.mesh import (
    decode_frames_sharded,
    encode_frames_sharded,
    make_mesh,
    roundtrip_step,
)
from x3_tpu.params import Parameters

TINY = Parameters(block_len=4, blocks_per_frame=8)  # 32 samples/frame


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_encode_matches_oracle(rng):
    mesh = make_mesh()
    F, S = 16, TINY.samples_per_frame
    wavs = np.stack([make_mixed(rng, S) for _ in range(F)]).astype(np.int16)
    n_valid = np.full(F, S, np.int32)
    n_valid[-1] = 7  # one partial frame
    res = encode_frames_sharded(wavs, n_valid, TINY, mesh)
    payload = np.ascontiguousarray(res["payload_words"]).byteswap().view(np.uint8)
    nbytes = np.asarray(res["nbytes"])
    crc = np.asarray(res["crc"])
    for i in range(F):
        want, want_crc = oracle.encode_frame_payload(wavs[i, : n_valid[i]], TINY)
        assert payload[i, : nbytes[i]].tobytes() == want
        assert crc[i] == want_crc


def test_sharded_roundtrip(rng):
    mesh = make_mesh()
    F, S = 8, TINY.samples_per_frame
    wavs = np.stack([make_mixed(rng, S) for _ in range(F)]).astype(np.int16)
    n = np.full(F, S, np.int32)
    enc = encode_frames_sharded(wavs, n, TINY, mesh)
    payload = np.ascontiguousarray(enc["payload_words"]).byteswap().view(np.uint8)
    dec, err = decode_frames_sharded(payload, n, np.asarray(enc["nbytes"]), TINY, mesh)
    assert not np.asarray(err).any()
    np.testing.assert_array_equal(np.asarray(dec), wavs)


def test_roundtrip_step_jits(rng):
    mesh = make_mesh()
    step = roundtrip_step(TINY, mesh)
    F, S = 8, TINY.samples_per_frame
    wavs = np.stack([make_mixed(rng, S) for _ in range(F)]).astype(np.int16)
    n = np.full(F, S, np.int32)
    nbytes, exact = step(wavs, n)
    assert bool(exact)
    assert np.asarray(nbytes).shape == (F,)
