"""Normative format constants for the X3 lossless audio codec.

These values define the on-the-wire bitstream and are required for bit-exact
parity with the reference implementation (see /root/reference/src/x3.rs:81-252
for the parameter defaults and Rice code tables, and x3.rs:139-184 for the
archive/frame header layout).  They are format constants, not code: any X3
implementation must agree on them byte-for-byte.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# Archive container (reference: x3.rs:136-145, encodefile.rs:82-138)
# --------------------------------------------------------------------------

ARCHIVE_ID = b"X3ARCHIV"  # 8-byte magic at the start of every .x3a file
ARCHIVE_ID_LEN = 8

FRAME_MAX_LENGTH = 0x7FE0  # maximum frame payload length in bytes

# --------------------------------------------------------------------------
# Frame header layout: 20 bytes, all fields big-endian
# (reference: x3.rs:148-184, encoder.rs:122-162)
#
#   offset 0:  u16  key "x3" (0x7833)
#   offset 2:  u8   source id
#   offset 3:  u8   channels   (quirk: encoder writes source id here too)
#   offset 4:  u16  number of uncompressed samples in the frame
#   offset 6:  u16  payload length in bytes
#   offset 8:  u64  timestamp (always 0 in the reference)
#   offset 16: u16  CRC16 of header bytes [0, 16)
#   offset 18: u16  CRC16 of the payload
# --------------------------------------------------------------------------

FRAME_HEADER_LENGTH = 20
FRAME_KEY = 30771  # "x3" big-endian: 0x78 0x33
FRAME_KEY_BYTES = b"x3"

P_KEY = 0
P_SOURCE_ID = 2
P_CHANNELS = 3
P_SAMPLES = 4
P_PAYLOAD_SIZE = 6
P_TIME = 8
P_HEADER_CRC = 16
P_PAYLOAD_CRC = 18

# --------------------------------------------------------------------------
# Codec parameters (reference: x3.rs:89-96)
# --------------------------------------------------------------------------

MAX_BLOCK_LENGTH = 60
WAV_BIT_SIZE = 16

DEFAULT_BLOCK_LENGTH = 20
DEFAULT_RICE_CODES = (0, 1, 3)
DEFAULT_THRESHOLDS = (3, 8, 20)
DEFAULT_BLOCKS_PER_FRAME = 500

# BFP / pass-through block header is 6 bits; Rice block header is 2 bits.
BFP_HDR_LEN = 6
RICE_HDR_LEN = 2

# --------------------------------------------------------------------------
# Rice code tables (reference: x3.rs:200-252).
#
# Forward tables: index = diff + offset, giving (code value, total bits).
# The code value written to the stream is `code` in `num_bits` total bits;
# because every code value's leading bits are zero up to its own bit width,
# this reproduces the reference's "write num_zeros zeros then the code in
# (num_bits - num_zeros) bits" exactly.
#
# Inverse table: shared interleaved signed sequence 0,-1,1,-2,2,... used by
# the decoder to map a code index back to a signed diff.
# --------------------------------------------------------------------------

# inv[i] for i in 0..59: 0, -1, 1, -2, 2, ...
INV_RICE_CODE = np.array(
    [0] + [v for k in range(1, 31) for v in (-k, k)],
    dtype=np.int16,
)[:60]

_RICE_TABLES = (
    # nsubs, offset, code[], num_bits[], inv_len
    dict(
        nsubs=0,
        offset=6,
        code=[1] * 14,
        num_bits=[12, 10, 8, 6, 4, 2, 1, 3, 5, 7, 9, 11, 13, 15],
        inv_len=16,
    ),
    dict(
        nsubs=1,
        offset=11,
        code=[3] * 11 + [2] * 11,
        num_bits=[12, 11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12],
        inv_len=26,
    ),
    dict(
        nsubs=2,
        offset=20,
        code=[7, 5] * 10 + [4, 6] * 10,
        num_bits=[12, 12, 11, 11, 10, 10, 9, 9, 8, 8, 7, 7, 6, 6, 5, 5, 4, 4, 3, 3]
        + [3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12],
        inv_len=44,
    ),
    dict(
        nsubs=3,
        offset=28,
        code=[15, 13, 11, 9] * 7 + [8, 10, 12, 14] * 7,
        num_bits=[10, 10, 10, 10, 9, 9, 9, 9, 8, 8, 8, 8, 7, 7, 7, 7, 6, 6, 6, 6, 5, 5, 5, 5, 4, 4, 4, 4]
        + [4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7, 8, 8, 8, 8, 9, 9, 9, 9, 10, 10, 10, 10],
        inv_len=60,
    ),
)


class RiceCode:
    """One of the four static Rice code tables (reference: x3.rs:186-252)."""

    __slots__ = ("nsubs", "offset", "code", "num_bits", "inv", "inv_len")

    def __init__(self, nsubs: int, offset: int, code, num_bits, inv_len: int):
        self.nsubs = nsubs
        self.offset = offset
        self.code = np.asarray(code, dtype=np.int32)
        self.num_bits = np.asarray(num_bits, dtype=np.int32)
        self.inv = INV_RICE_CODE
        self.inv_len = inv_len


RICE_CODES = tuple(RiceCode(**t) for t in _RICE_TABLES)


def get_rice_codes(code_list) -> tuple:
    """Return the three RiceCode tables selected by `code_list`
    (reference: RiceCodes::get, x3.rs:254-260)."""
    return tuple(RICE_CODES[c] for c in code_list)
