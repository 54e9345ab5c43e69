"""Pallas TPU kernel for the CRC16 GF(2) matmul.

The jnp formulation (ops/crc_jax.py) materializes the payload's bit
expansion ([F, W*32] int8, ~8x the payload) in HBM before the MXU matmul.
This kernel keeps the whole contribution matrix M (~2.6 MB int8) resident
in VMEM, unpacks each words-tile to bit planes in registers, and
accumulates the chunk dots on the MXU — HBM traffic drops to the words
themselves plus one load of M.

Layout note: Mosaic cannot shape-cast [T, CW, 32] -> [T, CW*32] (minor dim
32), so bits are built k-major as [T, 32, CW] (minor dim = CW = 128 lanes)
and M's rows are permuted host-side to match (see permute_m_rows).

Exactness: identical int32 sums to the jnp path (same terms, reordered
additions of 0/1 products), so the mod-2 reduction downstream is unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

F_TILE = 64  # frames per grid step (keeps words tile + M + bits within VMEM)
CW = 128  # words per in-kernel chunk (4096 bits per dot)


def permute_m_rows(m: np.ndarray, n_words: int) -> np.ndarray:
    """Reorder M rows from bit-position order (32*j + k within a chunk) to
    the kernel's k-major order (k*CW + j)."""
    n_bits = n_words * 32
    assert m.shape[0] == n_bits
    idx = np.arange(n_bits)
    chunk = idx // (CW * 32)
    within = idx % (CW * 32)
    j = within // 32  # word within chunk
    k = within % 32  # bit within word (MSB-first)
    new_pos = chunk * (CW * 32) + k * CW + j
    out = np.empty_like(m)
    out[new_pos] = m
    return out


@functools.partial(jax.jit, static_argnums=(2, 3))
def crc_planes_pallas(words, m_kmajor_t, n_words: int, interpret: bool = False):
    """Sum_i bits(words)[i] * M[i] -> int32 plane sums [F, 16].

    words: uint32 [F, n_words] (F a multiple of F_TILE, n_words of CW)
    m_kmajor_t: int8 [16, n_words*32] — M TRANSPOSED, rows permuted by
        permute_m_rows before the transpose.  The transposed layout is
        load-bearing: a [n_words*32, 16] operand gets its 16-lane minor dim
        padded to 128 in VMEM (8x inflation — 21 MB at the worst-case
        width, over the 16 MB scoped limit), while [16, n_words*32] keeps
        the long dim on lanes and stays at its true 2.6 MB.
    """
    from jax.experimental import pallas as pl

    F, W = words.shape
    assert W == n_words and W % CW == 0 and F % F_TILE == 0

    n_chunks = W // CW

    def kernel(words_ref, m_ref, out_ref):
        # k-major bit planes: plane k holds bit (31-k... see shift) of every word.
        shifts = (31 - jax.lax.broadcasted_iota(jnp.uint32, (1, 32, 1), 1)).astype(jnp.uint32)

        # fori_loop (not a python unroll): Mosaic allocates the per-chunk
        # `bits` temporary on the kernel stack PER UNROLLED ITERATION, so an
        # unrolled loop at the worst-case width (n_chunks=40) costs tens of
        # MB of scoped VMEM; the loop body's stack is reused.  Integer sums
        # of 0/1 products are order-independent, so exactness holds.
        def body(c, acc):
            wtile = words_ref[:, pl.ds(c * CW, CW)]  # [F_TILE, CW] uint32
            bits = ((wtile[:, None, :] >> shifts) & 1).astype(jnp.int8)
            bits = bits.reshape(F_TILE, 32 * CW)  # minor dim stays CW lanes
            mchunk = m_ref[:, pl.ds(c * (CW * 32), CW * 32)]  # [16, CW*32]
            return acc + jax.lax.dot_general(
                bits, mchunk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )

        out_ref[:, :] = jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((F_TILE, 16), jnp.int32))

    return pl.pallas_call(
        kernel,
        grid=(F // F_TILE,),
        in_specs=[
            pl.BlockSpec((F_TILE, W), lambda i: (i, 0)),
            pl.BlockSpec((16, W * 32), lambda i: (0, 0)),  # resident across steps
        ],
        out_specs=pl.BlockSpec((F_TILE, 16), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((F, 16), jnp.int32),
        interpret=interpret,
    )(words, m_kmajor_t)
