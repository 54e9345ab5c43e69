"""Streaming (bounded memory) and batched multi-file/multi-channel APIs."""

import numpy as np
import pytest

from tests.conftest import make_hydrophone, make_mixed
from x3_tpu.files import wav_to_x3a, x3a_to_wav
from x3_tpu.models import oracle
from x3_tpu.multifile import (
    decode_streams,
    encode_streams,
    wav_to_x3a_batch,
    x3a_to_wav_batch,
)
from x3_tpu.params import Parameters
from x3_tpu.streaming import StreamEncoder, encode_channels, wav_to_x3a_streaming
from x3_tpu.utils.wav import read_wav, write_wav

P = Parameters()


def test_stream_encoder_matches_whole_file(tmp_path, rng):
    """Chunked writes produce the identical archive to one-shot encoding."""
    wav = make_hydrophone(rng, 37_123)
    wav_path = tmp_path / "in.wav"
    write_wav(wav_path, wav, 96000)
    whole = tmp_path / "whole.x3a"
    wav_to_x3a(wav_path, whole)

    streamed = tmp_path / "streamed.x3a"
    with StreamEncoder(streamed, 96000, P, batch_frames=2) as enc:
        pos = 0
        for size in [500, 12_000, 1, 9_999, 7, 14_616]:
            enc.write(wav[pos : pos + size])
            pos += size
        assert pos == len(wav)
    assert streamed.read_bytes() == whole.read_bytes()


def test_wav_to_x3a_streaming(tmp_path, rng):
    wav = make_mixed(rng, 26_000)
    wav_path = tmp_path / "in.wav"
    write_wav(wav_path, wav, 44100)
    whole, streamed = tmp_path / "w.x3a", tmp_path / "s.x3a"
    wav_to_x3a(wav_path, whole)
    stats = wav_to_x3a_streaming(wav_path, streamed, batch_frames=1)
    assert streamed.read_bytes() == whole.read_bytes()
    assert stats.sum() == 26_000 - 3  # all samples except each frame's first


def test_encode_streams_matches_oracle(rng):
    streams = [make_hydrophone(rng, n) for n in [5_000, 25_000, 1, 10_000]]
    results = encode_streams(streams, P, batch_frames=3)
    for s, r in zip(streams, results):
        assert r.data == oracle.encode(s, P)


def test_encode_channels(rng):
    chans = np.stack([make_hydrophone(rng, 12_000) for _ in range(4)])
    results = encode_channels(chans, P)
    for c, r in zip(chans, results):
        assert r.data == oracle.encode(c, P)


def test_multifile_roundtrip(tmp_path, rng):
    n_files = 6
    wavs = [make_mixed(rng, int(rng.integers(500, 30_000))) for _ in range(n_files)]
    wav_paths = [tmp_path / f"in{i}.wav" for i in range(n_files)]
    x3a_paths = [tmp_path / f"out{i}.x3a" for i in range(n_files)]
    back_paths = [tmp_path / f"back{i}.wav" for i in range(n_files)]
    for p, w in zip(wav_paths, wavs):
        write_wav(p, w, 44100)

    wav_to_x3a_batch(wav_paths, x3a_paths, P, batch_frames=4)
    # Each archive must be identical to the single-file API's output.
    for i in range(n_files):
        single = tmp_path / f"single{i}.x3a"
        wav_to_x3a(wav_paths[i], single)
        assert x3a_paths[i].read_bytes() == single.read_bytes()

    x3a_to_wav_batch(x3a_paths, back_paths, batch_frames=4)
    for p, w in zip(back_paths, wavs):
        got, rate = read_wav(p)
        assert rate == 44100
        np.testing.assert_array_equal(got, w)


def test_multifile_sharded(tmp_path, rng):
    from x3_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    tiny = Parameters(block_len=4, blocks_per_frame=8)
    streams = [make_hydrophone(rng, n) for n in [100, 64, 320]]
    results = encode_streams(streams, tiny, batch_frames=8, mesh=mesh)
    for s, r in zip(streams, results):
        assert r.data == oracle.encode(s, tiny)
    # decode the archives back, sharded
    from x3_tpu import archive

    archives = [
        archive.build_archive_header(44100, tiny) + r.data for r in results
    ]
    decoded = decode_streams(archives, batch_frames=8, mesh=mesh)
    for (got, rate), s in zip(decoded, streams):
        assert rate == 44100
        np.testing.assert_array_equal(got, s)
