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


def test_decode_streams_mixed_params(rng):
    """Archives encoded with DIFFERENT Parameters decode correctly in one
    call: the worklist is grouped by params, each group with its own frame
    geometry."""
    from x3_tpu import archive

    tiny = Parameters(block_len=4, blocks_per_frame=8)
    wav_a = make_hydrophone(rng, 12_345)
    wav_b = make_mixed(rng, 700)
    wav_c = make_hydrophone(rng, 90)
    arch_a = archive.build_archive_header(96000, P) + oracle.encode(wav_a, P)
    arch_b = archive.build_archive_header(44100, tiny) + oracle.encode(wav_b, tiny)
    arch_c = archive.build_archive_header(22050, P) + oracle.encode(wav_c, P)
    decoded = decode_streams([arch_a, arch_b, arch_c], batch_frames=3)
    (got_a, ra), (got_b, rb), (got_c, rc) = decoded
    assert (ra, rb, rc) == (96000, 44100, 22050)
    np.testing.assert_array_equal(got_a, wav_a)
    np.testing.assert_array_equal(got_b, wav_b)
    np.testing.assert_array_equal(got_c, wav_c)


def test_native_resync_skips_crc_failed_frame(tmp_path, rng):
    """engine='native' with resync=True must skip (not silently include)
    frames whose payload CRC fails, matching the jax/numpy engines."""
    from x3_tpu import archive, native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    wav = make_hydrophone(rng, 30_000)  # 3 frames
    wav_path, x3a_path = tmp_path / "i.wav", tmp_path / "o.x3a"
    write_wav(wav_path, wav, 44100)
    wav_to_x3a(wav_path, x3a_path)
    data = bytearray(x3a_path.read_bytes())
    hdr = archive.parse_archive_header(bytes(data))[1]
    index = list(archive.walk_frames(bytes(data), hdr))
    off1, h1 = index[1]
    data[off1 + 5] ^= 0xFF  # corrupt middle frame's payload (CRC now fails)
    x3a_path.write_bytes(bytes(data))
    back = tmp_path / "b.wav"
    errors = x3a_to_wav(x3a_path, back, engine="native", resync=True)
    assert errors == 1
    got, _ = read_wav(back)
    np.testing.assert_array_equal(got, np.concatenate([wav[:10_000], wav[20_000:]]))


def test_multihost_worklist_sharding(tmp_path, rng):
    """Multi-host input pipeline: two simulated hosts each convert their
    strided worklist shard; the union covers every file and each archive is
    byte-identical to the single-host output (the codec is collective-free,
    so hosts never need to communicate)."""
    from x3_tpu.parallel.multihost import shard_worklist
    from x3_tpu.multifile import wav_to_x3a_batch as batch_enc

    n_files = 5
    wavs = [make_hydrophone(rng, int(rng.integers(500, 15_000))) for _ in range(n_files)]
    wav_paths = [tmp_path / f"in{i}.wav" for i in range(n_files)]
    for p, w in zip(wav_paths, wavs):
        write_wav(p, w, 44100)

    # Single-host reference conversion.
    ref_paths = [tmp_path / f"ref{i}.x3a" for i in range(n_files)]
    batch_enc(wav_paths, ref_paths, P, batch_frames=4)

    # Two simulated hosts, each converting its shard.
    shard_paths = [tmp_path / f"sh{i}.x3a" for i in range(n_files)]
    for pi in range(2):
        batch_enc(wav_paths, shard_paths, P, batch_frames=4, process_index=pi, process_count=2)
    for i in range(n_files):
        assert shard_paths[i].read_bytes() == ref_paths[i].read_bytes(), f"file {i}"

    # The shards partition the worklist exactly.
    s0 = shard_worklist(list(range(n_files)), 0, 2)
    s1 = shard_worklist(list(range(n_files)), 1, 2)
    assert sorted(s0 + s1) == list(range(n_files))
    assert shard_worklist(list(range(n_files))) == list(range(n_files))  # 1-host identity

    # Decode side sharding roundtrips too.
    from x3_tpu.multifile import x3a_to_wav_batch as batch_dec

    back_paths = [tmp_path / f"back{i}.wav" for i in range(n_files)]
    for pi in range(2):
        batch_dec(shard_paths, back_paths, batch_frames=4, process_index=pi, process_count=2)
    for p, w in zip(back_paths, wavs):
        got, _ = read_wav(p)
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
