"""Oracle codec vs the reference's golden byte vectors (SURVEY.md §4)."""

import numpy as np
import pytest

from x3_tpu.models import oracle
from x3_tpu.ops.bitio import BitReader, BitWriter
from x3_tpu.params import Parameters
from x3_tpu.errors import InvalidEncodingThresh

P = Parameters()


def encode_one_block(wav, prefix_zero_bits=0):
    """Encode a single block the way the reference block tests do
    (encoder.rs:493-620): optional zero-bit prefix, block, word align."""
    wav = [int(v) for v in wav]
    diffs = [wav[i + 1] - wav[i] for i in range(len(wav) - 1)]
    bw = BitWriter()
    if prefix_zero_bits:
        bw.write_packed_zeros(prefix_zero_bits)
    oracle.encode_block(wav[1:], diffs, bw, P)
    bw.word_align()
    return bw.getvalue()


def test_encode_frame_golden(golden):
    got = oracle.encode_frame(golden["frame_wav"], P)
    assert got == bytes(golden["frame_expected"])


def test_encode_frame_zeros_golden(golden):
    got = oracle.encode_frame(golden["zeros_wav"], P)
    assert got == bytes(golden["zeros_expected"])


def test_encode_block_rice_golden(golden):
    assert encode_one_block(golden["block_rice_wav"]) == bytes(golden["block_rice_expected"])


def test_encode_block_ftype3_golden(golden):
    got = encode_one_block(golden["block_ftype3_wav"], prefix_zero_bits=1)
    assert got == bytes(golden["block_ftype3_expected"])


def test_encode_block_bfp_eq16_golden(golden):
    assert encode_one_block(golden["block_bfp16_wav"]) == bytes(golden["block_bfp16_expected"])


def test_encode_block_bfp_lt16_golden(golden):
    assert encode_one_block(golden["block_bfplt16_wav"]) == bytes(golden["block_bfplt16_expected"])


def test_decode_block_ftype1_golden(golden):
    # decoder.rs:257-276: skip 6 bits, then decode with last_wav=-373.
    br = BitReader(bytes(golden["dec_ftype1_input"]))
    br.read_nbits(6)
    out, _ = oracle.decode_block(br, 20, -373, P)
    expected = golden["dec_ftype1_expected"]
    assert out[: len(expected)] == expected.tolist()


@pytest.mark.parametrize(
    "name,n",
    [("dec_ftype2", 20), ("dec_ftype3", 20), ("dec_bfp16", 19), ("dec_bfplt16", 19)],
)
def test_decode_block_goldens(golden, name, n):
    data = bytes(golden[name + "_input"])
    last_wav = int.from_bytes(data[0:2], "big", signed=True)
    br = BitReader(data[2:])
    out, _ = oracle.decode_block(br, n, last_wav, P)
    expected = golden[name + "_expected"]
    assert out[: len(expected)] == expected.tolist()


def test_frame_roundtrip_mixed(rng):
    from tests.conftest import make_mixed

    wav = make_mixed(rng, 10000)
    frame = oracle.encode_frame(wav, P)
    payload = frame[20:]
    out = oracle.decode_frame(payload, P, len(wav))
    np.testing.assert_array_equal(out, wav)


def test_frame_roundtrip_short_frames(rng):
    from tests.conftest import make_hydrophone

    for n in [1, 2, 19, 20, 21, 40, 41, 997]:
        wav = make_hydrophone(rng, n)
        frame = oracle.encode_frame(wav, P)
        out = oracle.decode_frame(frame[20:], P, n)
        np.testing.assert_array_equal(out, wav)


def test_multi_frame_encode_roundtrip(rng):
    from tests.conftest import make_hydrophone

    wav = make_hydrophone(rng, 25_000)  # 2 full frames + 5000 tail
    stats = [0] * 6
    stream = oracle.encode(wav, P, stats)
    assert sum(stats) == 25_000 - 3  # every sample but each frame's first
    # Walk frames.
    pos, decoded = 0, []
    while pos < len(stream):
        header = stream[pos : pos + 20]
        samples = int.from_bytes(header[4:6], "big")
        payload_len = int.from_bytes(header[6:8], "big")
        from x3_tpu.ops.crc import crc16

        assert crc16(header[0:16]) == int.from_bytes(header[16:18], "big")
        payload = stream[pos + 20 : pos + 20 + payload_len]
        assert crc16(payload) == int.from_bytes(header[18:20], "big")
        decoded.append(oracle.decode_frame(payload, P, samples))
        pos += 20 + payload_len
    np.testing.assert_array_equal(np.concatenate(decoded), wav)


def test_parameters_validation():
    with pytest.raises(InvalidEncodingThresh):
        Parameters(thresholds=(7, 8, 20))  # 7 > RICE0 offset 6
    Parameters(thresholds=(3, 8, 20))  # default is valid
