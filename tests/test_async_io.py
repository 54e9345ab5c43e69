"""The bounded background writer (utils/io.py) and the WavWriter built on
it: output bytes must be identical to the synchronous stdlib-wave path, and
write errors must surface on the producer thread before a converter can
return success."""

import numpy as np
import pytest

from x3_tpu.utils.io import AsyncWriter, prefetch_iter
from x3_tpu.utils.wav import WavWriter, read_wav, write_wav


def test_async_writer_order_and_content(tmp_path):
    p = tmp_path / "blob.bin"
    blocks = [bytes([i]) * (1000 + i) for i in range(50)]
    with open(p, "wb") as f:
        aw = AsyncWriter(f, depth=3)
        for b in blocks:
            aw.write(b)
        aw.close()
    assert p.read_bytes() == b"".join(blocks)


def test_async_writer_error_propagates():
    class Boom:
        def write(self, data):
            raise OSError("disk full")

    aw = AsyncWriter(Boom(), depth=1)
    with pytest.raises(OSError, match="disk full"):
        # The first write enqueues; the error surfaces on a later call or
        # at close — drive until it does.
        for _ in range(10):
            aw.write(b"x")
        aw.close()
    with pytest.raises(OSError, match="disk full"):
        aw.close()  # the writer stays poisoned: no silent partial output


def test_async_writer_close_reraises():
    class Boom:
        def write(self, data):
            raise OSError("late")

    aw = AsyncWriter(Boom())
    aw.write(b"x")
    with pytest.raises(OSError, match="late"):
        aw.close()


def test_prefetch_iter_order_and_completeness():
    items = [bytes([i]) * (100 + i) for i in range(200)]
    assert list(prefetch_iter(iter(items), depth=3)) == items
    assert list(prefetch_iter(iter([]), depth=2)) == []


def test_prefetch_iter_exception_after_prior_items():
    def src():
        yield 1
        yield 2
        raise OSError("short read")

    it = prefetch_iter(src(), depth=1)
    got = []
    with pytest.raises(OSError, match="short read"):
        for v in it:
            got.append(v)
    assert got == [1, 2]  # everything read before the error is delivered


def test_prefetch_iter_abandon_stops_source():
    import time as _time

    state = {"produced": 0}

    def src():
        for i in range(10_000):
            state["produced"] += 1
            yield i

    it = prefetch_iter(src(), depth=2)
    assert next(it) == 0
    it.close()  # consumer abandons mid-stream
    _time.sleep(0.1)
    # The producer stops near the read-ahead bound instead of draining
    # 10k items (exact count depends on scheduling; the point is "small").
    assert state["produced"] < 100


def test_wavwriter_matches_wave_module(tmp_path):
    rng = np.random.default_rng(3)
    samples = rng.integers(-32768, 32767, 70_001, dtype=np.int16)
    sync_p, async_p = tmp_path / "sync.wav", tmp_path / "async.wav"
    write_wav(sync_p, samples, 96000)  # stdlib wave module
    with WavWriter(async_p, 96000) as w:
        # Uneven batch sizes exercise ordering across queue refills.
        i = 0
        for n in (1, 999, 30_000, 17, 39_000, 10**6):
            w.write(samples[i : i + n])
            i += n
        assert w.samples_written == len(samples)
    assert async_p.read_bytes() == sync_p.read_bytes()
    back, rate = read_wav(async_p)
    assert rate == 96000 and np.array_equal(back, samples)


def test_wavwriter_empty(tmp_path):
    p = tmp_path / "empty.wav"
    with WavWriter(p, 44100) as w:
        assert w.samples_written == 0
    ref = tmp_path / "ref.wav"
    write_wav(ref, np.zeros(0, np.int16), 44100)
    assert p.read_bytes() == ref.read_bytes()


def test_stream_encoder_async_archive_identical(tmp_path):
    """StreamEncoder's owned-file async path writes the same archive bytes
    as encoding through a caller-supplied (synchronous) writer."""
    import io

    from x3_tpu.params import Parameters
    from x3_tpu.streaming import StreamEncoder

    rng = np.random.default_rng(5)
    params = Parameters()
    wav = np.cumsum(rng.integers(-4, 5, 10 * params.samples_per_frame + 7)).astype(np.int16)

    buf = io.BytesIO()
    with StreamEncoder(buf, 96000, params, engine="numpy", batch_frames=3) as enc:
        enc.write(wav)
    p = tmp_path / "a.x3a"
    with StreamEncoder(p, 96000, params, engine="numpy", batch_frames=3) as enc2:
        enc2.write(wav)
    assert p.read_bytes() == buf.getvalue()
