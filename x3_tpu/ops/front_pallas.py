"""Pallas TPU kernel for the encode front end (diff -> classify -> codes).

The XLA front materializes diffs, masks, per-branch code tensors and the
item arrays in HBM (~2 GB of intermediate traffic per 1024-frame batch).
This kernel reads each block's samples once, keeps diffs/max-abs/selection
in registers, and writes only the per-item (value, bits) streams the packer
needs.

Layout: lanes are (frame, block) pairs, minor axis; the L samples and the
I = L + 2 item slots are the major axis.  Mirrors x3_encode_block exactly
(encoder.rs:289-315) with closed-form Rice codes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import constants

LANE_TILE = 2048  # lanes per grid step


def _bit_length(v):
    """count_bits(v) for v in [0, 65535] without clz (15 compares)."""
    nb = jnp.zeros_like(v)
    for i in range(16):
        nb = nb + (v >= (1 << i)).astype(v.dtype)
    return nb


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def encode_front_pallas(sblk, sprev, first_val, nv_lane, L: int, codes: tuple, thresholds: tuple, interpret: bool = False):
    """Per-block item streams from samples.

    sblk:      int32 [L, N]  — the block's samples (lanes minor)
    sprev:     int32 [1, N]  — the sample preceding the block
    first_val: int32 [1, N]  — frame's raw first sample in block-0 lanes, else -1
    nv_lane:   int32 [1, N]  — valid sample count in the block (0..L)
    Returns (item_val uint32 [L+2, N], item_len int32 [L+2, N], slot int32 [1, N]).
    slot is the statistics slot (rice nsubs / 4 BFP / 5 literal).
    """
    from jax.experimental import pallas as pl

    Ls, N = sblk.shape
    assert Ls == L and N % LANE_TILE == 0
    I = L + 2
    t0, t1, t2 = thresholds
    nsubs_of = {0: 0, 1: 1, 2: 2, 3: 3}

    def kernel(sblk_ref, sprev_ref, first_ref, nv_ref, val_ref, len_ref, slot_ref):
        nv = nv_ref[0, :]
        prev = sprev_ref[0, :]
        diffs = []
        ma = jnp.zeros((LANE_TILE,), jnp.int32)
        for j in range(L):
            s = sblk_ref[j, :]
            d = s - prev
            prev = s
            valid = nv > j
            diffs.append(d)
            ma = jnp.maximum(ma, jnp.where(valid, jnp.abs(d), 0))

        is_rice = ma <= t2
        nb = _bit_length(ma)
        is_literal = (~is_rice) & (nb >= 15)
        present = nv > 0
        ftype = (ma > t0).astype(jnp.int32) + (ma > t1)

        # item 0: the frame's raw first sample.  The wrapper passes
        # first_val = s0 & 0xFFFF (>= 0) for block-0 lanes and -1 elsewhere.
        first = first_ref[0, :]
        fmask = first >= 0
        val_ref[0, :] = jnp.where(fmask, first, 0).astype(jnp.uint32)
        len_ref[0, :] = jnp.where(fmask, 16, 0)

        # item 1: the block header
        hdr_val = jnp.where(is_rice, ftype + 1, jnp.where(is_literal, 15, nb))
        hdr_len = jnp.where(is_rice, constants.RICE_HDR_LEN, constants.BFP_HDR_LEN)
        val_ref[1, :] = jnp.where(present, hdr_val, 0).astype(jnp.uint32)
        len_ref[1, :] = jnp.where(present, hdr_len, 0)

        # statistics slot
        rice_slot = ftype * 0
        for k, order in enumerate(codes):
            rice_slot = jnp.where(ftype == k, nsubs_of[order], rice_slot)
        slot_ref[0, :] = jnp.where(is_rice, rice_slot, jnp.where(is_literal, 5, 4))

        # per-sample items
        bfp_bits = nb + 1
        bfp_mask = (1 << jnp.clip(bfp_bits, 0, 31)) - 1
        prev = sprev_ref[0, :]
        for j in range(L):
            s = sblk_ref[j, :]
            d = diffs[j]
            valid = nv > j
            # closed-form rice for each selected order, chosen by ftype
            rice_val = jnp.zeros((LANE_TILE,), jnp.int32)
            rice_bits = jnp.zeros((LANE_TILE,), jnp.int32)
            for k, order in enumerate(codes):
                if order == 0:
                    c = jnp.ones_like(d)
                    b = 2 * jnp.abs(d) + (d >= 0).astype(jnp.int32)
                else:
                    e = jnp.where(d >= 0, d, -d - 1)
                    b = (order + 1) + (e >> (order - 1))
                    low = (d & ((1 << (order - 1)) - 1)) << 1
                    c = jnp.where(d >= 0, (1 << order) | low, ((1 << (order + 1)) - 1) - low)
                sel = ftype == k
                rice_val = jnp.where(sel, c, rice_val)
                rice_bits = jnp.where(sel, b, rice_bits)

            v = jnp.where(is_rice, rice_val, jnp.where(is_literal, s & 0xFFFF, d & bfp_mask))
            ln = jnp.where(is_rice, rice_bits, jnp.where(is_literal, 16, bfp_bits))
            val_ref[2 + j, :] = jnp.where(valid, v, 0).astype(jnp.uint32)
            len_ref[2 + j, :] = jnp.where(valid, ln, 0)

    grid = (N // LANE_TILE,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, LANE_TILE), lambda i: (0, i)),
            pl.BlockSpec((1, LANE_TILE), lambda i: (0, i)),
            pl.BlockSpec((1, LANE_TILE), lambda i: (0, i)),
            pl.BlockSpec((1, LANE_TILE), lambda i: (0, i)),
        ],
        out_specs=(
            pl.BlockSpec((I, LANE_TILE), lambda i: (0, i)),
            pl.BlockSpec((I, LANE_TILE), lambda i: (0, i)),
            pl.BlockSpec((1, LANE_TILE), lambda i: (0, i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((I, N), jnp.uint32),
            jax.ShapeDtypeStruct((I, N), jnp.int32),
            jax.ShapeDtypeStruct((1, N), jnp.int32),
        ),
        interpret=interpret,
    )(sblk, sprev, first_val, nv_lane)
