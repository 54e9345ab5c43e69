"""Frame-parallel TPU decode pipeline.

The reference decoder walks the bitstream sample-by-sample in scalar Rust
(/root/reference/src/decoder.rs:36-235 over the BitReader word cache,
bitreader.rs:64-176).  Bit positions are inherently sequential *within* a
frame (every code's start depends on all previous code lengths), but frames
are self-contained — each carries its own raw first sample and CRC-delimited
payload (SURVEY.md §5 "checkpoint/resume") — so the frame axis is the
parallel axis: all lanes of a [F] batch step through their bitstreams in
lockstep, every per-sample operation a branch-free vector op across frames.

Per sample the kernel gathers a 32-bit window at the current bit offset,
decodes all three block types simultaneously (unary zero count via clz +
suffix for Rice, fixed-width fields for BFP/pass-through), selects with
masks, and advances each lane's offset by the consumed length.  A full
10,000-sample frame is 500 `fori_loop` block iterations with a 20-step
unrolled inner body.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from ..params import Parameters
from .encode_kernel import frame_geometry


def _decode_tables(params: Parameters):
    """Per-ftype (1..3) nsubs, inv_len; shared 60-entry inverse table."""
    nsubs = np.zeros(4, dtype=np.int32)
    invlen = np.zeros(4, dtype=np.int32)
    for f in (1, 2, 3):
        rc = params.rice_codes[f - 1]
        nsubs[f] = rc.nsubs
        invlen[f] = rc.inv_len
    return nsubs, invlen, constants.INV_RICE_CODE.astype(np.int32)


def _wrap16(v):
    return ((v + 0x8000) & 0xFFFF) - 0x8000


@functools.partial(jax.jit, static_argnums=(2,))
def decode_frames(payload: jax.Array, n_samples: jax.Array, params: Parameters):
    """Decode a batch of frame payloads.

    payload: uint8 [F, W*4] zero-padded payload bytes (W from frame_geometry)
    n_samples: int32 [F] — sample count per frame (0 = dummy lane)
    Returns (samples int16 [F, S], err bool [F])."""
    S, B, L, W = frame_geometry(params)
    F = payload.shape[0]
    nsubs_np, invlen_np, inv_np = _decode_tables(params)
    nsubs_t = jnp.asarray(nsubs_np)
    invlen_t = jnp.asarray(invlen_np)
    inv_t = jnp.asarray(inv_np)

    by = payload.astype(jnp.uint32).reshape(F, W, 4)
    words = (by[:, :, 0] << 24) | (by[:, :, 1] << 16) | (by[:, :, 2] << 8) | by[:, :, 3]

    n = n_samples.astype(jnp.int32)
    first = ((words[:, 0] >> 16) & 0xFFFF).astype(jnp.int32)
    first = _wrap16(first)

    def window32(off):
        """32-bit big-endian window starting at bit `off` (per frame)."""
        wi = (off >> 5).astype(jnp.int32)
        w0 = jnp.take_along_axis(words, jnp.clip(wi, 0, W - 1)[:, None], axis=1)[:, 0]
        w1 = jnp.take_along_axis(words, jnp.clip(wi + 1, 0, W - 1)[:, None], axis=1)[:, 0]
        sh = (off & 31).astype(jnp.uint32)
        return (w0 << sh) | ((w1 >> (31 - sh)) >> 1)

    out0 = jnp.zeros((F, S + L), jnp.int32)

    def block_body(b, carry):
        off, last, out, err = carry
        block_first = 1 + b * L
        valid_block = block_first < n

        win = window32(off)
        ftype = (win >> 30).astype(jnp.int32)
        dec_nb = ((win >> 26) & 0xF).astype(jnp.int32) + 1
        is_hdr0 = ftype == 0
        is_pass = is_hdr0 & (dec_nb == 16)
        is_bfp = is_hdr0 & (dec_nb != 16)
        err = err | (valid_block & is_bfp & (dec_nb <= 5))
        hdr_bits = jnp.where(is_hdr0, constants.BFP_HDR_LEN, constants.RICE_HDR_LEN)
        off = off + jnp.where(valid_block, hdr_bits, 0)

        nsubs_f = nsubs_t[ftype]
        invlen_f = invlen_t[ftype]
        level = (1 << nsubs_f).astype(jnp.int32)
        nbsuf = jnp.where(ftype == 2, 2, 4)  # decoder.rs:180 quirk: hardwired

        blk = jnp.zeros((F, L), jnp.int32)
        for k in range(L):
            valid = valid_block & ((block_first + k) < n)
            win = window32(off)
            zeros = jax.lax.clz(win).astype(jnp.int32)
            zc = jnp.clip(zeros, 0, 31).astype(jnp.uint32)

            # Rice ftype 1: unary index, skip stop bit (decoder.rs:147-170)
            idx_r1 = zeros
            consume_r1 = zeros + 1
            # Rice ftype 2/3: unary + nb-bit suffix (decoder.rs:172-196)
            suffix = ((win << zc) >> (32 - nbsuf.astype(jnp.uint32))).astype(jnp.int32)
            idx_r23 = suffix + level * (zeros - 1)
            consume_r23 = zeros + nbsuf
            # BFP / pass-through: fixed dec_nb-bit field (decoder.rs:209-235)
            a = (win >> (32 - jnp.clip(dec_nb, 1, 31)).astype(jnp.uint32)).astype(jnp.int32)
            neg_thresh = 1 << jnp.clip(dec_nb - 1, 0, 30)
            delta_bfp = a - jnp.where(a > neg_thresh, neg_thresh * 2, 0)
            v_pass = _wrap16((win >> 16).astype(jnp.int32))

            is_rice = ftype >= 1
            idx = jnp.where(ftype == 1, idx_r1, idx_r23)
            err = err | (valid & is_rice & ((idx < 0) | (idx >= invlen_f)))
            delta_rice = inv_t[jnp.clip(idx, 0, 59)]

            delta = jnp.where(is_rice, delta_rice, delta_bfp)
            new = jnp.where(is_pass, v_pass, _wrap16(last + delta))
            consume = jnp.where(
                ftype == 1, consume_r1, jnp.where(is_rice, consume_r23, dec_nb)
            )
            off = off + jnp.where(valid, consume, 0)
            last = jnp.where(valid, new, last)
            blk = blk.at[:, k].set(new)

        out = jax.lax.dynamic_update_slice(out, blk, (0, block_first))
        return off, last, out, err

    off0 = jnp.full((F,), 16, jnp.int32)  # bitstream starts after raw sample
    err0 = jnp.zeros((F,), bool)
    off, last, out, err = jax.lax.fori_loop(0, B, block_body, (off0, first, out0, err0))
    out = out.at[:, 0].set(first)
    # Reading past the payload means a corrupt stream length.
    err = err | (off > jnp.int32(W * 32))
    return out[:, :S].astype(jnp.int16), err
