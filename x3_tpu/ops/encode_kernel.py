"""Batched TPU encode pipeline: frames as tensors, bit packing by prefix sum.

The reference encoder is a sequential per-sample state machine
(/root/reference/src/encoder.rs:175-315 driving the scratch-byte BitPacker,
bitpacker.rs:142-163).  Here the whole computation is re-derived as array
programs over a [F, S] batch of frames (SURVEY.md §7):

1. first-order diff — one subtraction over the frame;
2. per-block (20-sample) masked max-|diff| reductions select Rice/BFP/literal
   exactly like x3_encode_block (encoder.rs:289-315);
3. per-sample (value, nbits) are table gathers from the Rice code tables —
   writing `code` in `num_bits` total bits reproduces the reference's
   zeros+code split exactly;
4. an exclusive prefix sum of all item bit lengths yields every item's
   absolute bit offset (this replaces the BitPacker state machine);
5. items are scattered into big-endian u32 words with a disjoint-bit
   segment-sum (sum == OR because contributions never overlap);
6. payload CRC16 runs as an MXU matmul (ops/crc_jax.py).

Everything runs under one jit; frame sizes vary via a per-frame valid-sample
count (static shapes, masked lanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from ..params import Parameters
from .crc_jax import crc16_padded_jax

# Statistics slot mapping for Rice blocks: slot = nsubs of the selected code
# (encoder.rs:266); BFP -> 4, pass-through -> 5.


def _rice_tables_np(params: Parameters):
    """Combined [3, 64] (code, nbits) tables indexed by (ftype, diff+offset),
    plus per-ftype offsets and nsubs."""
    codes = np.zeros((3, 64), dtype=np.int32)
    bits = np.zeros((3, 64), dtype=np.int32)
    offsets = np.zeros(3, dtype=np.int32)
    nsubs = np.zeros(3, dtype=np.int32)
    for k, rc in enumerate(params.rice_codes):
        n = len(rc.code)
        codes[k, :n] = rc.code
        bits[k, :n] = rc.num_bits
        offsets[k] = rc.offset
        nsubs[k] = rc.nsubs
    return codes, bits, offsets, nsubs


def frame_geometry(params: Parameters):
    """Static sizes for the [F, S] pipeline."""
    S = params.samples_per_frame
    B = params.blocks_per_frame
    L = params.block_len
    # Worst case payload bits: 16 (first sample) + per block (6-bit header +
    # 16 bits per sample).  The last block of a full frame has L-1 samples
    # but we bound with L for simplicity.
    max_bits = 16 + B * (constants.BFP_HDR_LEN + 16 * L)
    n_words = -(-max_bits // 32) + 1  # +1 slack word for end-of-stream spill
    if n_words % 8:
        n_words += 8 - n_words % 8
    return S, B, L, n_words


@functools.partial(jax.jit, static_argnums=(2,))
def encode_frames(samples: jax.Array, n_valid: jax.Array, params: Parameters):
    """Encode a batch of frames.

    samples: int16/int32 [F, S] (payload samples, zero-padded past n_valid)
    n_valid: int32 [F] — number of valid samples per frame (0 = dummy frame)
    Returns dict with:
      payload:  uint8 [F, n_words*4] — packed payload bytes (zero past length)
      nbytes:   int32 [F] — payload length in bytes (word-aligned, even)
      crc:      int32 [F] — payload CRC16
      stats:    int32 [F, 6] — per-frame code-usage sample counts
    """
    S, B, L, W = frame_geometry(params)
    F = samples.shape[0]
    t0, t1, t2 = params.thresholds
    codes_np, bits_np, offsets_np, nsubs_np = _rice_tables_np(params)
    ctab = jnp.asarray(codes_np)
    btab = jnp.asarray(bits_np)
    offs = jnp.asarray(offsets_np)
    nsubs = jnp.asarray(nsubs_np)

    s = samples.astype(jnp.int32)
    n = n_valid.astype(jnp.int32)[:, None]  # [F, 1]

    # ---- diffs over the frame (encoder.rs:222-225) ----
    d = jnp.concatenate([s[:, 1:] - s[:, :-1], jnp.zeros((F, 1), jnp.int32)], axis=1)  # [F, S]
    samp_idx = jax.lax.broadcasted_iota(jnp.int32, (F, S), 1)  # diff i belongs to sample i+1
    valid = (samp_idx + 1) < n  # [F, S]
    db = d.reshape(F, B, L)
    vb = valid.reshape(F, B, L)
    sb = jnp.concatenate([s[:, 1:], jnp.zeros((F, 1), jnp.int32)], axis=1).reshape(F, B, L)

    # ---- block classification (x3_encode_block, encoder.rs:289-315) ----
    ma = jnp.max(jnp.where(vb, jnp.abs(db), 0), axis=2)  # [F, B]
    block_first = 1 + jax.lax.broadcasted_iota(jnp.int32, (F, B), 1) * L
    present = block_first < n  # block has >= 1 sample
    ftype_r = ((ma > t0).astype(jnp.int32) + (ma > t1) + (ma > t2))
    is_rice = ma <= t2
    nb = 32 - jax.lax.clz(jnp.maximum(ma, 1))  # count_bits(ma); ma>0 when not rice
    is_literal = (~is_rice) & (nb >= 15)
    is_bfp = (~is_rice) & (nb < 15)

    hdr_val = jnp.where(is_rice, ftype_r + 1, jnp.where(is_literal, 15, nb))
    hdr_len = jnp.where(is_rice, constants.RICE_HDR_LEN, constants.BFP_HDR_LEN)
    hdr_len = jnp.where(present, hdr_len, 0)
    hdr_val = jnp.where(present, hdr_val, 0)

    # ---- per-sample (value, nbits) ----
    rsel = jnp.clip(ftype_r, 0, 2)  # selected rice table when is_rice
    flat_idx = jnp.clip(rsel[:, :, None] * 64 + db + offs[rsel][:, :, None], 0, 3 * 64 - 1)
    rice_val = ctab.reshape(-1)[flat_idx]
    rice_bits = btab.reshape(-1)[flat_idx]
    bfp_bits = (nb + 1)[:, :, None]
    bfp_val = db & ((1 << jnp.minimum(bfp_bits, 31)) - 1)
    lit_val = sb & 0xFFFF

    val = jnp.where(is_rice[:, :, None], rice_val, jnp.where(is_literal[:, :, None], lit_val, bfp_val))
    ln = jnp.where(is_rice[:, :, None], rice_bits, jnp.where(is_literal[:, :, None], 16, bfp_bits))
    ln = jnp.where(vb, ln, 0)
    val = jnp.where(vb, val, 0)

    # ---- statistics (encoder.rs:63,266) ----
    slot = jnp.where(is_rice, nsubs[rsel], jnp.where(is_literal, 5, 4))  # [F, B]
    cnt = jnp.sum(vb, axis=2)  # samples per block
    stats = jnp.zeros((F, 6), jnp.int32)
    onehot = (slot[:, :, None] == jnp.arange(6)[None, None, :]) & present[:, :, None]
    stats = jnp.sum(onehot * cnt[:, :, None], axis=1)

    # ---- item stream: [first sample][hdr, 20 samples] x B ----
    first_val = (s[:, 0] & 0xFFFF)[:, None]
    first_len = jnp.where(n > 0, 16, 0)
    blk_vals = jnp.concatenate([hdr_val[:, :, None], val], axis=2).reshape(F, B * (L + 1))
    blk_lens = jnp.concatenate([hdr_len[:, :, None], ln], axis=2).reshape(F, B * (L + 1))
    item_val = jnp.concatenate([first_val, blk_vals], axis=1).astype(jnp.uint32)  # [F, M]
    item_len = jnp.concatenate([first_len, blk_lens], axis=1)  # [F, M]
    M = item_val.shape[1]

    # ---- prefix-sum bit offsets (replaces the BitPacker state machine) ----
    ends = jnp.cumsum(item_len, axis=1)
    off = ends - item_len  # exclusive prefix sum
    total_bits = ends[:, -1]
    nbytes = (total_bits + 7) // 8
    nbytes = nbytes + (nbytes & 1)  # word-align to 2 bytes (bitpacker.rs:124-132)

    # ---- pack: disjoint-bit contributions into big-endian u32 words ----
    word = (off >> 5).astype(jnp.int32)
    sh = 32 - (off & 31) - item_len  # left shift if >=0, else straddles words
    shl = jnp.clip(sh, 0, 31).astype(jnp.uint32)
    shr = jnp.clip(-sh, 0, 31).astype(jnp.uint32)
    hi = jnp.where(sh >= 0, item_val << shl, item_val >> shr)
    lo = jnp.where(sh < 0, item_val << (32 - shr), jnp.uint32(0))

    frame_base = jnp.arange(F, dtype=jnp.int32)[:, None] * (W + 1)
    seg_hi = frame_base + word
    seg_lo = frame_base + word + 1
    data = jnp.concatenate([hi.reshape(-1), lo.reshape(-1)])
    segs = jnp.concatenate([seg_hi.reshape(-1), seg_lo.reshape(-1)])
    words = jax.ops.segment_sum(data, segs, num_segments=F * (W + 1))
    words = words.reshape(F, W + 1)[:, :W]

    # words -> big-endian bytes
    shifts = jnp.asarray([24, 16, 8, 0], dtype=jnp.uint32)
    payload = ((words[:, :, None] >> shifts[None, None, :]) & 0xFF).astype(jnp.uint8).reshape(F, W * 4)

    crc = crc16_padded_jax(payload, nbytes, W * 4)

    return {
        "payload": payload,
        "nbytes": nbytes.astype(jnp.int32),
        "crc": crc.astype(jnp.int32),
        "stats": stats,
        "total_bits": total_bits.astype(jnp.int32),
    }
