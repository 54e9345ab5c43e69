"""Native C++ core vs the Python oracle: differential bit-exactness."""

import numpy as np
import pytest

from tests.conftest import make_hydrophone, make_mixed
from x3_tpu.models import oracle
from x3_tpu.ops.crc import crc16
from x3_tpu.params import Parameters
from x3_tpu import native

P = Parameters()

pytestmark = pytest.mark.skipif(not native.available(), reason="native toolchain unavailable")


def test_native_crc16(golden):
    data = bytes(golden["crc_payload"])
    assert native.crc16(data) == crc16(data)
    assert native.crc16(b"") == 0xFFFF


@pytest.mark.parametrize("n", [1, 20, 21, 9_999, 10_000, 25_000])
def test_native_encode_matches_oracle(rng, n):
    wav = make_hydrophone(rng, n)
    st_n, st_o = [0] * 6, [0] * 6
    assert native.encode(wav, P, st_n) == oracle.encode(wav, P, st_o)
    assert st_n == st_o


def test_native_encode_mixed(rng):
    wav = make_mixed(rng, 34_567)
    assert native.encode(wav, P) == oracle.encode(wav, P)


def test_native_encode_golden(golden):
    assert native.encode(golden["frame_wav"], P) == oracle.encode(golden["frame_wav"], P)


def test_native_decode_roundtrip(rng):
    wav = make_mixed(rng, 12_345)
    stream = native.encode(wav, P)
    frames = native.index_frames(stream, 0)
    assert len(frames) == 2
    out = np.concatenate(
        [native.decode_frame(stream[o : o + pl], P, s) for o, s, pl in frames]
    )
    np.testing.assert_array_equal(out, wav)


def test_native_decode_matches_oracle_on_corrupt(rng):
    """Same error classification as the oracle on a corrupted payload."""
    wav = make_hydrophone(rng, 5_000)
    stream = native.encode(wav, P)
    (off, s, pl), = native.index_frames(stream, 0)
    bad = bytearray(stream[off : off + pl])
    bad[2] = 0b00_0010_00  # invalid BFP header
    from x3_tpu.errors import FrameDecodeInvalidBPF

    with pytest.raises(FrameDecodeInvalidBPF):
        native.decode_frame(bytes(bad), P, s)
    with pytest.raises(FrameDecodeInvalidBPF):
        oracle.decode_frame(bytes(bad), P, s)


def test_native_fuzz_vs_oracle(rng):
    """Differential fuzz: random block contents across the code-selection
    boundary regions."""
    for _ in range(20):
        scale = int(rng.integers(1, 30))
        n = int(rng.integers(2, 400))
        wav = np.clip(np.cumsum(rng.integers(-scale, scale + 1, n)), -32768, 32767).astype(np.int16)
        assert native.encode(wav, P) == oracle.encode(wav, P)
        stream = native.encode(wav, P)
        frames = native.index_frames(stream, 0)
        out = np.concatenate([native.decode_frame(stream[o : o + pl], P, s) for o, s, pl in frames])
        np.testing.assert_array_equal(out, wav)


def test_native_mt_encode_identical(rng):
    wav = make_hydrophone(rng, 47_000)
    assert native.encode(wav, P, nthreads=4) == native.encode(wav, P, nthreads=1)


def test_native_mt_decode(rng):
    wav = make_mixed(rng, 35_000)
    stream = native.encode(wav, P)
    index = native.index_frames(stream, 0)
    out = native.decode_frames_mt(stream, index, P, nthreads=4)
    np.testing.assert_array_equal(out, wav)


def test_native_encode_white_noise_caps(rng):
    """Incompressible input expands ~1.02x; buffer caps must cover it
    (regression: the corpus gate caught an overflow here)."""
    wav = rng.integers(-32768, 32768, 123_456).astype(np.int16)
    a = native.encode(wav, P)
    b = native.encode(wav, P, nthreads=4)
    assert a == b == oracle.encode(wav, P)


def test_native_encode_tight_caps_exercise_safe_writer(rng):
    """The Python API always allocates worst-case buffers, so the encoder's
    capacity-CHECKED writer path (selected when a frame's worst-case bound
    does not provably fit) only runs under tight caps: drive x3_encode
    directly with cap == exact output size (must still be byte-exact) and
    cap - 1 (must fail with -1, no overrun)."""
    import ctypes

    from x3_tpu.native import _cparams, load

    lib = load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    wav = np.ascontiguousarray(make_mixed(rng, 12_345), dtype=np.int16)
    want = oracle.encode(wav, P)
    cp = _cparams(P)
    for cap, expect_ok in [(len(want), True), (len(want) - 1, False), (len(want) + 7, True)]:
        out = np.full(cap + 64, 0xAB, dtype=np.uint8)  # canary tail
        wrote = lib.x3_encode(
            wav.ctypes.data_as(ctypes.c_void_p), len(wav), ctypes.byref(cp),
            out.ctypes.data_as(ctypes.c_void_p), cap, None,
        )
        if expect_ok:
            assert wrote == len(want)
            assert out[:wrote].tobytes() == want
        else:
            assert wrote == -1
        assert (out[cap:] == 0xAB).all()  # never writes past cap


@pytest.mark.parametrize("scale", [1, 2, 3, 5, 8, 12, 15, 22, 30])
def test_native_decode_lut_boundary_sweep(rng, scale):
    """Sweep diff magnitudes so every Rice code length occurs, at every bit
    alignment relative to the decoder's multi-symbol LUT windows (12-bit
    unary / 16-bit suffix): codes straddling a window boundary, blocks
    ending mid-LUT-entry, and dense short-code runs must all decode
    bit-identically to the oracle."""
    steps = rng.integers(-scale, scale + 1, 8_000)
    # occasional spikes force block-type transitions (and long unary runs)
    spikes = (rng.random(8_000) < 0.02) * rng.integers(-60, 61, 8_000)
    wav = (np.cumsum(steps + spikes) % 4001 - 2000).astype(np.int16)
    stream = native.encode(wav, P)
    assert stream == oracle.encode(wav, P)
    idx = native.index_frames(stream, 0)
    out = native.decode_frames_mt(stream, idx, P, nthreads=1)
    np.testing.assert_array_equal(out, wav)


def test_native_decode_zero_runs(rng):
    """Long all-zero diff runs: the all-zero reservoir window must route to
    the exact slow path (unary end-of-data cap semantics) inside the LUT
    burst loops."""
    wav = np.repeat(rng.integers(-500, 500, 40), 500).astype(np.int16)
    stream = native.encode(wav, P)
    assert stream == oracle.encode(wav, P)
    idx = native.index_frames(stream, 0)
    out = native.decode_frames_mt(stream, idx, P, nthreads=1)
    np.testing.assert_array_equal(out, wav)


@pytest.mark.parametrize("nb", list(range(6, 17)))
def test_native_decode_bfp_width_sweep(rng, nb):
    """Every BFP field width (6..15 bits, plus the 16-bit pass-through):
    the decoder's direct-offset BFP fast path extracts by absolute bit
    offset and must agree bit-for-bit with the reservoir slow path it
    falls back to near the payload end — including odd tail blocks, an
    odd-length final frame, and every bit phase of the block start."""
    n = 7_321  # non-multiple of block and frame lengths: tail coverage
    if nb == 16:
        # pass-through blocks: |diff| needs >= 15 bits
        wav = rng.integers(-32768, 32768, n).astype(np.int16)
    else:
        # max|diff| in [2^(nb-1), 2^nb-1] forces BFP at exactly nb bits;
        # intersperse quiet stretches so Rice blocks shift bit phase.
        d = rng.integers(-(2 ** (nb - 1)) + 1, 2 ** (nb - 1), n)
        d[rng.integers(0, n, 40)] = 2 ** (nb - 1)  # pin the width
        quiet = rng.random(n) < 0.15
        d[quiet] = rng.integers(-2, 3, int(quiet.sum()))
        # Reflecting walk: flipping a diff's sign keeps its magnitude, so
        # the realized sample-to-sample diffs hold the target width even
        # for nb up to 15 (a modular wrap would collapse them).
        wav = np.empty(n, np.int16)
        x = 0
        for i in range(n):
            step = int(d[i])
            if abs(x + step) > 16000:
                step = -step
            x += step
            wav[i] = x
    stream = native.encode(wav, P)
    assert stream == oracle.encode(wav, P)
    idx = native.index_frames(stream, 0)
    out = native.decode_frames_mt(stream, idx, P, nthreads=1)
    np.testing.assert_array_equal(out, wav)


def test_native_decode_int16_wrap_dense_unary():
    """Hand-built payload whose cumulative sum crosses the int16 rail: no
    valid encoder output ever wraps (adjacent int16 samples cannot differ
    by 2^16), so this corrupt-but-accepted frame pins the wrap semantics —
    the reference's release-mode i16 wrapping add (decoder.rs:163), the
    oracle's _wrap_i16 — through every engine.  The diff pattern (+1, 0)
    yields dense 1-3-bit ftype-1 codes (6 per 12-bit LUT window), driving
    the native unary path's vector emission and its int32-prefix-sum
    truncation across the wrap."""
    from x3_tpu.models.decoder import decode_frames_batch
    from x3_tpu.ops.bitio import BitWriter

    n = 4096
    first = 32000
    diffs = np.where(np.arange(n - 1) % 2 == 0, 1, 0)
    bw = BitWriter()
    bw.write_bits(first & 0xFFFF, 16)
    pos = 0
    while pos < n - 1:
        blk = min(P.block_len, n - 1 - pos)
        bw.write_bits(1, 2)  # stream ftype 1: Rice r1 / order-0 unary path
        for d in diffs[pos : pos + blk]:
            # unary: z zeros + stop bit; inv[0]=0, inv[2]=+1
            bw.write_bits(1, (2 if d else 0) + 1)
        pos += blk
    bw.word_align()
    payload = bw.getvalue()

    exp = (first + np.concatenate([[0], np.cumsum(diffs)])) % (1 << 16)
    exp = (exp - (exp >= (1 << 15)) * (1 << 16)).astype(np.int16)
    assert exp.min() < -30000 < 30000 < exp.max()  # the walk really wrapped

    np.testing.assert_array_equal(oracle.decode_frame(payload, P, n), exp)
    np.testing.assert_array_equal(native.decode_frame(payload, P, n), exp)
    outs, errs = decode_frames_batch([payload], [n], P)
    assert not errs.any()
    np.testing.assert_array_equal(outs[0], exp)
