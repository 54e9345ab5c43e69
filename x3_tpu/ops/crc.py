"""CRC-16/CCITT (poly 0x1021, init 0xffff, MSB-first).

The table and the byte-at-a-time update mirror the reference
(/root/reference/src/crc.rs:22-58) and must be bit-exact: the CRC appears in
every frame header and payload.

Three implementations live here:

* `crc16(data)` — scalar host CRC over one byte string (numpy table walk).
* `crc16_many(rows, lengths)` — vectorized across many byte rows at once:
  the byte loop is sequential (CRC is a chain) but each step processes all
  rows as one numpy table gather, so the cost is O(max_len) python steps
  regardless of how many frames are being checksummed.
* `crc16_jax(...)` in `ops/crc_jax.py` — on-device version used by the
  batched encode pipeline (frames parallel, bytes via `lax.scan`).
"""

from __future__ import annotations

import numpy as np


def _build_table() -> np.ndarray:
    poly = 0x1021
    table = np.zeros(256, dtype=np.uint16)
    for i in range(256):
        crc = i << 8
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if (crc & 0x8000) else (crc << 1)
            crc &= 0xFFFF
        table[i] = crc
    return table


CRC_TABLE = _build_table()


def update_crc16(crc: int, byte: int) -> int:
    """One-byte CRC update (reference: crc.rs:44-47)."""
    lookup = (byte ^ (crc >> 8)) & 0xFF
    return ((crc << 8) ^ int(CRC_TABLE[lookup])) & 0xFFFF


def crc16(data) -> int:
    """CRC16 of a byte string, init 0xffff (reference: crc.rs:49-58)."""
    crc = 0xFFFF
    for b in bytes(data):
        crc = update_crc16(crc, b)
    return crc


def crc16_many(rows: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """CRC16 of many byte rows at once.

    rows: uint8 array [N, max_len]; lengths: int array [N] giving the number
    of valid bytes per row.  Returns uint16 [N].  Bytes past a row's length
    do not affect its CRC.
    """
    rows = np.asarray(rows, dtype=np.uint8)
    lengths = np.asarray(lengths)
    n, max_len = rows.shape
    crc = np.full(n, 0xFFFF, dtype=np.uint16)
    if n == 0:
        return crc
    max_needed = int(lengths.max()) if lengths.size else 0
    for i in range(max_needed):
        active = i < lengths
        lookup = (rows[:, i] ^ (crc >> 8).astype(np.uint8)).astype(np.int64)
        updated = ((crc << np.uint16(8)) ^ CRC_TABLE[lookup]).astype(np.uint16)
        crc = np.where(active, updated, crc)
    return crc
