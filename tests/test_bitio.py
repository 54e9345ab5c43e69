"""BitWriter/BitReader semantics tests, including the boundary cases pinned by
the reference's inline tests (bitpacker.rs:191-290, bitreader.rs:190-305)."""

from x3_tpu.ops.bitio import BitReader, BitWriter


def written(*writes, align=False):
    bw = BitWriter()
    for value, n in writes:
        bw.write_bits(value, n)
    if bw._p_bit:
        bw._flush()
    return bw.getvalue()


def test_write_bits_boundaries():
    # Ported from bitpacker.rs test_write_packed_bits (fresh buffers).
    assert written((0x0, 9), (0x3, 2)) == bytes([0x00, 0x60])
    assert written((0x1FF, 9), (0x3, 2)) == bytes([0xFF, 0xE0])
    assert written((0, 13), (0x1FF, 9)) == bytes([0x00, 0x07, 0xFC])
    assert written((0x1FFF, 13), (0x1FF, 9)) == bytes([0xFF, 0xFF, 0xFC])
    assert written((0, 6), (0x1F27B, 17)) == bytes([0x03, 0xE4, 0xF6])
    assert written((0x3F, 6), (0x1F27B, 17)) == bytes([0xFF, 0xE4, 0xF6])
    assert written((0, 12), (0x9, 4)) == bytes([0x00, 0x09])
    assert written((0xF, 4), (0xFFFFBE81, 16)) == bytes([0xFB, 0xE8, 0x10])
    assert written((0, 9), (0xFFFFFFFC, 6)) == bytes([0x00, 0x78])
    assert written((0, 10), (0xFFFFFFFC, 6)) == bytes([0x00, 0x3C])


def test_word_align_pads_to_even():
    bw = BitWriter()
    bw.write_bits(1, 3)
    bw.word_align()
    assert len(bw) == 2
    bw2 = BitWriter()
    bw2.write_bits(1, 16)
    bw2.word_align()
    assert len(bw2) == 2


def test_word_align_respects_stream_base():
    bw = BitWriter(stream_base=1)
    bw.write_bits(1, 3)
    bw.word_align()
    assert len(bw) == 1  # base 1 + 1 byte = even


def test_reader_read_nbits():
    # Ported from bitreader.rs test_bitreader_long_array.
    br = BitReader(bytes([0x01, 0x23, 0x45, 0x67, 0x89, 0xAB, 0xCD, 0xEF, 0x01]))
    assert br.read_nbits(20) == 0b00000001001000110100
    assert br.read_nbits(1) == 0
    assert br.read_nbits(1) == 1
    assert br.read_nbits(5) == 0b01011
    assert br.read_nbits(6) == 0b001111
    assert br.read_nbits(31) == 0x09ABCDEF
    assert br.read_nbits(8) == 0x01


def test_reader_count_zero_bits():
    # Ported from bitreader.rs test_count_zero_bits.
    br = BitReader(bytes([0x00, 0x0F, 0xF0, 0x00]))
    assert br.count_zero_bits() == 12
    assert br.count_zero_bits() == 0
    assert br.read_nbits(7) == 0x7F
    assert br.read_nbits(1) == 0x01
    # Trailing zeros capped at end of data.
    assert br.count_zero_bits() == 12


def test_reader_past_end_returns_zero():
    br = BitReader(bytes([0xFF]))
    assert br.read_nbits(8) == 0xFF
    assert br.read_nbits(8) == 0
    assert br.count_zero_bits() == 0


def test_roundtrip_random(rng):
    items = []
    for _ in range(500):
        n = int(rng.integers(1, 17))
        v = int(rng.integers(0, 1 << n))
        items.append((v, n))
    bw = BitWriter()
    for v, n in items:
        bw.write_bits(v, n)
    bw.word_align()
    br = BitReader(bw.getvalue())
    for v, n in items:
        assert br.read_nbits(n) == v
