"""Channel API parity shims and profiling/AOT utilities."""

import io

import numpy as np
import pytest

from tests.conftest import make_hydrophone
from x3_tpu.channel import Channel, IterChannel, encode as channel_encode
from x3_tpu.errors import MoreThanOneChannel
from x3_tpu.models import oracle
from x3_tpu.params import Parameters

P = Parameters()


def test_channel_encode(rng):
    wav = make_hydrophone(rng, 12_000)
    res = Channel(0, wav, 44100, P).encode()
    assert res.data == oracle.encode(wav, P)


def test_iter_channel_streams(rng):
    wav = make_hydrophone(rng, 23_456)
    buf = io.BytesIO()
    stats = IterChannel(0, iter(wav.tolist()), 44100, P).encode_to(buf, batch_frames=1)
    assert buf.getvalue() == oracle.encode(wav, P)
    assert stats.sum() == 23_456 - 3


def test_encode_shim_rejects_multichannel(rng):
    wav = make_hydrophone(rng, 100)
    with pytest.raises(MoreThanOneChannel):
        channel_encode([Channel(0, wav, 44100), Channel(1, wav, 44100)], io.BytesIO())


def test_encode_shim(rng):
    wav = make_hydrophone(rng, 5_000)
    buf = io.BytesIO()
    stats = channel_encode([Channel(0, wav, 44100, P)], buf)
    assert buf.getvalue() == oracle.encode(wav, P)
    assert stats.sum() == 4_999


def test_aot_compile():
    from x3_tpu.utils.profiling import aot_compile

    tiny = Parameters(block_len=4, blocks_per_frame=8)
    exes = aot_compile(4, tiny)
    assert "encode" in exes and "decode" in exes
    wav = np.zeros((4, tiny.samples_per_frame), np.int16)
    out = exes["encode"](wav, np.full(4, tiny.samples_per_frame, np.int32))
    assert int(np.asarray(out["nbytes"])[0]) > 0
