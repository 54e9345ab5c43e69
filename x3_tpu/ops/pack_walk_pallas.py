"""Pallas TPU encode pack: VMEM-resident output words, no level-1/merge HBM.

The XLA pack (encode_kernel._pack_pairs + _merge_mxu) materializes per-block
buffers to HBM ([F, B, NB4] u32) and compacts them with a one-hot MXU matmul
whose operand/output relayout copies are ~40% of its cost (ROADMAP item 2
profile).  This kernel is the encode mirror of the decode kernel
(ops/decode_pallas.py): it holds each lane tile's OUTPUT words resident in
VMEM and walks the frame's blocks sequentially, so block buffers never exist
outside registers and the packed words leave VMEM exactly once (one async
copy per lane tile at the last grid step).

Per grid step (U blocks, TF lanes):
  1. level-1 build — each block's pair items (<= 32-bit pre-merged values
     from the encode front, encoder.rs:175-315 semantics) accumulate into an
     NB-word register buffer at the block's in-word bit offset
     (same select-accumulate as ops/pack_pallas.py, NB = 12 words at L=20);
  2. shift-up barrel — the buffer lands at the block's word offset within a
     K*G-word step window via log-depth conditional shifts (the insertion
     mirror of the decode kernel's extraction barrel), with per-block static
     bounds (block u starts <= G-1 + u*maxadv words past the window base);
  3. window sweep — one masked read-modify-write pass ORs the window into
     the resident words (the write mirror of the decode kernel's one-hot
     slab select; + == | because all contributions are bit-disjoint).

Inputs stream through double-buffered pipeline blocks ((U*P, TF) pair rows
per step), so the pair DMA overlaps compute; block offsets come from the
XLA cumsum (tiny [F, B] math) rather than an in-kernel carry, keeping grid
steps independent except for the resident words.

Bit-identical to _pack_pairs by construction and test; the compact-width
overflow contract matches (frames whose payload exceeds W produce garbage
tail words but exact total_bits — callers escalate via fits_width).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pack_geometry(W: int, B: int, L: int, P: int, F: int):
    """(U, TF, K, NB) for the pack walk, or None when no lane tile fits.

    NB: words one block's buffer can span (<= 16+6+16*L bits starting at any
    in-word offset).  K*G covers the window: block u's words start <=
    G-1 + u*maxadv past the base, the last buffer extends NB more.
    Scoped-VMEM budget mirrors decode's measured 14.5 MB ceiling: resident
    words (single-buffered) + double-buffered pair stream (val+len) +
    block-offset rows + the K*G window accumulators."""
    G = 64
    # NB must span the worst block from its worst in-word start offset:
    # block 0 always starts at offset 0 with <= 16+6+16L bits; any other
    # block starts at r <= 31 with <= 6+16L bits.  The old floor-divided
    # (16+6+16L+31)//32 = 11 at L=20 dropped the 12th word of a literal
    # block (326 bits) starting at r >= 27 (round-5 fix, tested by
    # test_pack_walk_full_literal_block_at_word_tail).
    NB = max(-(-(16 + 6 + 16 * L) // 32), -(-(31 + 6 + 16 * L) // 32))
    maxadv = NB + 1
    for u in (24, 16, 8):
        if (u * P) % 8 or u % 8:
            continue  # Mosaic: block second-to-last dims must be 8-divisible
        K = max(2, -(-(G - 1 + u * maxadv + NB) // G))
        pad_w = K * G + (-(W + K * G)) % G
        w_pad = W + pad_w
        # Include the batch-sized tile so F=768 doesn't pad 33% up to 1024;
        # prefer whatever minimizes padded lanes, then the biggest tile.
        f_tile = min(2048, -(-F // 256) * 256)
        cands = sorted(
            {2048, 1024, 512, 256} | {f_tile},
            key=lambda tf: (-(-F // tf) * tf, -tf),
        )
        for tf in cands:
            scoped = (
                w_pad * tf * 4  # resident words (single-buffered scratch)
                + u * P * tf * 4 * 2 * 2  # val+len pipeline blocks, double-buffered
                + u * tf * 4 * 2  # block-offset rows, double-buffered
                + K * G * tf * 4  # window accumulators
            )
            if scoped <= 14_500_000:
                return u, tf, K, NB
    return None


def pallas_pack_fits(W: int, B: int, L: int, P: int, F: int) -> bool:
    return _pack_geometry(W, B, L, P, F) is not None


def _barrel_up(buf: list, pos, maxpos: int) -> list:
    """out[pos + i] = buf[i] — the insertion mirror of decode's _barrel.

    buf: list of [TF] u32; pos: [TF] int32 in [0, maxpos].  Log-depth
    conditional shifts, LSB stage first so the list stays short early;
    returns a list of length len(buf) + (2^ceil(lg(maxpos+1)) - 1)."""
    if maxpos <= 0:
        return list(buf)
    zero = jnp.zeros_like(buf[0])
    cur = list(buf)
    sh = 1
    while sh <= maxpos:
        bit = (pos & sh) != 0
        n = len(cur) + sh
        cur = [
            jnp.where(
                bit,
                cur[i - sh] if i - sh >= 0 and i - sh < len(cur) else zero,
                cur[i] if i < len(cur) else zero,
            )
            for i in range(n)
        ]
        sh <<= 1
    return cur


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def pack_frames_walk(mval, mlen, block_off, W: int, L: int, interpret: bool = False, geometry: tuple | None = None):
    """Pack pre-merged pair items into frame word streams.

    mval: uint32 [F, B, P] — <= 32-bit pair values (encode_kernel pair
          production; pair 0 of block 0 carries the raw first sample).
    mlen: int32 [F, B, P] — pair bit lengths (0 = absent).
    block_off: int32 [F, B] — absolute bit offset of each block's start
          (XLA cumsum of block bits).
    Returns uint32 [F, W] payload words, bit-identical to
    encode_kernel._pack_pairs' words output.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F, B, P = mval.shape
    G = 64
    if geometry is not None:
        U, TF, K, NB = geometry
    else:
        geo = _pack_geometry(W, B, L, P, F)
        if geo is None:
            raise NotImplementedError(
                "payload width exceeds the VMEM lane-tile budget; pack via "
                "the XLA pipeline (encode_kernel routes there automatically)"
            )
        U, TF, K, NB = geo
    maxadv = NB + 1
    steps = -(-B // U)
    gbits = G.bit_length() - 1

    pad_w = K * G + (-(W + K * G)) % G
    W_pad = W + pad_w
    Wg = W_pad // G

    # Lanes minor; pad blocks to U*steps (zero-length pairs pack nothing)
    # and lanes to the tile.
    B_pad = steps * U
    F_pad = -(-F // TF) * TF
    mval_t = jnp.moveaxis(mval, 0, 2).reshape(B * P, F)
    mlen_t = jnp.moveaxis(mlen, 0, 2).reshape(B * P, F)
    boff_t = block_off.T
    if B_pad != B:
        mval_t = jnp.pad(mval_t, ((0, (B_pad - B) * P), (0, 0)))
        mlen_t = jnp.pad(mlen_t, ((0, (B_pad - B) * P), (0, 0)))
        boff_t = jnp.pad(boff_t, ((0, B_pad - B), (0, 0)))
    if F_pad != F:
        mval_t = jnp.pad(mval_t, ((0, 0), (0, F_pad - F)))
        mlen_t = jnp.pad(mlen_t, ((0, 0), (0, F_pad - F)))
        boff_t = jnp.pad(boff_t, ((0, 0), (0, F_pad - F)))

    def kernel(val_ref, len_ref, boff_ref, out_hbm, words_ref, dma_sem):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            words_ref[:, :] = jnp.zeros((W_pad, TF), jnp.uint32)

        boff0 = boff_ref[0, :]
        q = jnp.clip((boff0 >> 5) >> gbits, 0, Wg - K)
        base_word = q << gbits

        win = [jnp.zeros((TF,), jnp.uint32) for _ in range(K * G)]
        for u in range(U):
            boff_u = boff_ref[u, :]
            r = (boff_u & 31).astype(jnp.int32)
            # ---- level-1: the block's pairs into an NB-word buffer ----
            accs = [jnp.zeros((TF,), jnp.uint32) for _ in range(NB)]
            poff = r
            for p in range(P):
                v = val_ref[u * P + p, :]
                ln = len_ref[u * P + p, :]
                t = poff >> 5
                sh = 32 - (poff & 31) - ln
                shl = jnp.clip(sh, 0, 31).astype(jnp.uint32)
                shr = jnp.clip(-sh, 0, 31).astype(jnp.uint32)
                hi = jnp.where(sh >= 0, v << shl, v >> shr)
                lo = jnp.where(sh < 0, v << (32 - shr), jnp.uint32(0))
                # Static bound: pair p starts <= 31+22+32p bits in.
                wmax = min(NB - 1, ((31 + 22 + 32 * p) >> 5) + 1)
                for w in range(wmax + 1):
                    accs[w] = (
                        accs[w]
                        + jnp.where(t == w, hi, jnp.uint32(0))
                        + jnp.where(t + 1 == w, lo, jnp.uint32(0))
                    )
                poff = poff + ln
            # ---- insert at the block's window word offset ----
            pw_max = min(K * G - NB, G - 1 + u * maxadv)
            pw = jnp.clip((boff_u >> 5) - base_word, 0, pw_max)
            placed = _barrel_up(accs, pw, pw_max)
            for w in range(min(len(placed), K * G)):
                win[w] = win[w] + placed[w]

        # ---- masked RMW sweep: window -> resident words ----
        for k in range(K):
            wk = jnp.stack(win[k * G : (k + 1) * G], axis=0)
            for jj in range(Wg - K + 1):
                m = (q == jj)[None, :]
                slab = words_ref[(jj + k) * G : (jj + k + 1) * G, :]
                words_ref[(jj + k) * G : (jj + k + 1) * G, :] = slab + jnp.where(
                    m, wk, jnp.uint32(0)
                )

        @pl.when(j == steps - 1)
        def _flush():
            cp = pltpu.make_async_copy(
                words_ref, out_hbm.at[:, pl.ds(i * TF, TF)], dma_sem
            )
            cp.start()
            cp.wait()

    out_t = pl.pallas_call(
        kernel,
        grid=(F_pad // TF, steps),
        in_specs=[
            pl.BlockSpec((U * P, TF), lambda i, j: (j, i)),
            pl.BlockSpec((U * P, TF), lambda i, j: (j, i)),
            pl.BlockSpec((U, TF), lambda i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((W_pad, F_pad), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((W_pad, TF), jnp.uint32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(mval_t, mlen_t, boff_t)
    return out_t[:W, :F].T
