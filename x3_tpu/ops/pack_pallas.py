"""Pallas TPU kernel for the encode pipeline's level-1 block packing.

The XLA formulation of the block packer (encode_kernel._pack_block_buffers
level 1) materializes hi/lo piece tensors and runs an NW-way
select-accumulate over them — several hundred MB of HBM traffic per batch.
This kernel fuses the whole stage into one VMEM pass: for each (frame,
block) lane it walks the block's I items, maintains the running in-superword
bit offset, and accumulates the NB4 buffer words in registers.

Layout: lanes are the minor axis (items major), so every per-item operation
is a full-width VPU op over a [rows, 128] tile of lanes.

Used on TPU; the jnp path remains the portable fallback (and the
differential oracle — outputs are bit-identical by test).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LANE_TILE = 2048  # lanes (frame*block pairs) per grid step


@functools.partial(jax.jit, static_argnums=(3, 4))
def pack_blocks_pallas(item_val, item_len, r2, nb4: int, interpret: bool = False):
    """Pack per-block item streams into NB4-word superword-aligned buffers.

    item_val: uint32 [I, N] — item values, lanes minor (N = F*B, padded to
              a multiple of LANE_TILE)
    item_len: int32  [I, N] — item bit lengths (0 = absent)
    r2:       int32  [1, N] — block start bit offset within its 4-word
              superword (block_off & 127)
    Returns uint32 [nb4, N].
    """
    from jax.experimental import pallas as pl

    I, N = item_val.shape
    assert N % LANE_TILE == 0, N

    def kernel(val_ref, len_ref, r2_ref, out_ref):
        poff = r2_ref[0, :]
        accs = [jnp.zeros((LANE_TILE,), jnp.uint32) for _ in range(nb4)]
        for i in range(I):
            v = val_ref[i, :]
            ln = len_ref[i, :]
            t = poff >> 5
            sh = 32 - (poff & 31) - ln
            shl = jnp.clip(sh, 0, 31).astype(jnp.uint32)
            shr = jnp.clip(-sh, 0, 31).astype(jnp.uint32)
            hi = jnp.where(sh >= 0, v << shl, v >> shr)
            lo = jnp.where(sh < 0, v << (32 - shr), jnp.uint32(0))
            for w in range(nb4):
                accs[w] = accs[w] + jnp.where(t == w, hi, jnp.uint32(0)) + jnp.where(t + 1 == w, lo, jnp.uint32(0))
            poff = poff + ln
        for w in range(nb4):
            out_ref[w, :] = accs[w]

    grid = (N // LANE_TILE,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((I, LANE_TILE), lambda j: (0, j)),
            pl.BlockSpec((I, LANE_TILE), lambda j: (0, j)),
            pl.BlockSpec((1, LANE_TILE), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((nb4, LANE_TILE), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((nb4, N), jnp.uint32),
        interpret=interpret,
    )(item_val, item_len, r2)
