"""Frame-parallel TPU decode pipeline.

The reference decoder walks the bitstream sample-by-sample in scalar Rust
(/root/reference/src/decoder.rs:36-235 over the BitReader word cache,
bitreader.rs:64-176).  Bit positions are inherently sequential *within* a
frame (every code's start depends on all previous code lengths), but frames
are self-contained — each carries its own raw first sample and CRC-delimited
payload (SURVEY.md §5 "checkpoint/resume") — so the frame axis is the
parallel axis: all lanes of a [F] batch step through their bitstreams in
lockstep, every per-sample operation a branch-free vector op across frames.

Fusion-friendly structure: a block's bits fit a small static window, so each
`lax.scan` step performs ONE sliced gather per lane (a few contiguous 4-word
slices — TPU gathers price per index, not per element) and decodes the whole
block from registers with pure elementwise ops — unary zero counts via clz,
Rice suffix extraction, fixed-width BFP fields — selected by masks.  The
sample walk is unrolled for block_len <= 24 and a rolling-register lax.scan
beyond that (compile cost O(1) in block_len).  Block outputs stack via scan
ys; flattening them yields the sample stream directly because every block
occupies exactly `block_len` slots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from ..params import Parameters
from .encode_kernel import block_buffer_words, frame_geometry


def _decode_tables(params: Parameters):
    """Per-ftype (1..3) nsubs and inv_len from the selected Rice codes."""
    nsubs = np.zeros(4, dtype=np.int32)
    invlen = np.zeros(4, dtype=np.int32)
    for f in (1, 2, 3):
        rc = params.rice_codes[f - 1]
        nsubs[f] = rc.nsubs
        invlen[f] = rc.inv_len
    return nsubs, invlen


def _wrap16(v):
    return ((v + 0x8000) & 0xFFFF) - 0x8000


def _inv_rice(i):
    """Closed form of the shared inverse Rice table 0,-1,1,-2,2,...
    (x3.rs:200-204): inv(i) = (i+1)>>1 negated when i is odd."""
    half = (i + 1) >> 1
    return jnp.where((i & 1) == 1, -half, half)


# Per-frame decode error codes (parity with the reference's X3Error variants,
# error.rs:27-62): 0 ok, 1 invalid BFP (num_bits<=5, decoder.rs:209-212),
# 2 out-of-bounds inverse (decoder.rs:162-192), 3 bitstream overran the
# payload (unexpected end).  Host mapping lives in errors.decode_error().
ERR_OK = 0
ERR_INVALID_BPF = 1
ERR_OOB_INVERSE = 2
ERR_OVERRUN = 3


@functools.partial(jax.jit, static_argnums=(3,))
def decode_frames_checked(payload: jax.Array, n_samples: jax.Array, payload_lens: jax.Array, params: Parameters):
    """decode_frames plus device-side payload CRC16 (the batched integrity
    check of SURVEY.md §5): returns (samples, err, crc int32 [F]).  The CRC
    rides the MXU matmul over the words the decoder already built, so the
    file pipeline needs no host CRC pass at all."""
    from .crc_jax import crc16_words_jax

    S, B, L, W = frame_geometry(params)
    out, err, words = _decode_impl(payload, n_samples, params)
    crc = crc16_words_jax(words, payload_lens.astype(jnp.int32), W)
    return out, err, crc.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(2,))
def decode_frames(payload: jax.Array, n_samples: jax.Array, params: Parameters):
    """Decode a batch of frame payloads.

    payload: uint8 [F, W*4] zero-padded payload bytes (W from frame_geometry)
    n_samples: int32 [F] — sample count per frame (0 = dummy lane)
    Returns (samples int16 [F, S], err int32 [F] — ERR_* codes, 0 = ok)."""
    out, err, _ = _decode_impl(payload, n_samples, params)
    return out, err


def _decode_impl(payload: jax.Array, n_samples: jax.Array, params: Parameters):
    S, B, L, W = frame_geometry(params)
    WIN_WORDS = block_buffer_words(params)  # covers any block + start skew
    F = payload.shape[0]
    nsubs_np, invlen_np = _decode_tables(params)

    by = payload.astype(jnp.uint32).reshape(F, W, 4)
    words = (by[:, :, 0] << 24) | (by[:, :, 1] << 16) | (by[:, :, 2] << 8) | by[:, :, 3]

    n = n_samples.astype(jnp.int32)
    first = _wrap16(((words[:, 0] >> 16) & 0xFFFF).astype(jnp.int32))

    # TPU gathers cost per-index, not per-element, so the per-block window
    # load is 4 contiguous 4-word slices (cheap) realigned to the block's
    # start word with 4-way selects (free), instead of 12 scattered words.
    G = 16  # slice width in words (gathers price per index: fewer, wider slices)
    K = -(-(WIN_WORDS + G - 1) // G)  # G*K >= WIN + G-1 covers [sw, sw+WIN), sw-Gq <= G-1
    # Pad so the last block's 16-word window never clips q (which would
    # break the delta realignment below).
    pad_w = K * G + (-(W + K * G)) % G
    wpad = jnp.concatenate([words, jnp.zeros((F, pad_w), jnp.uint32)], axis=1)
    wg = wpad.reshape(F, (W + pad_w) // G, G)
    slice_iota = jnp.arange(K, dtype=jnp.int32)[None, :]

    def select_word(win, idx):
        """win[:, idx] per lane via a WIN_WORDS-way elementwise select."""
        v = jnp.zeros_like(win[:, 0])
        for i in range(WIN_WORDS):
            v = jnp.where(idx == i, win[:, i], v)
        return v

    def extract32(win, rel, qmax=None):
        """32-bit big-endian view at in-window bit offset rel.  Independent
        selects per call — shorter dependency chains than the rolling
        window, so this is the fast path for small unrolled block_len.
        `qmax` statically bounds the word index (codes are <= 16 bits, so
        sample k of a block can only start within the first few words)."""
        q = rel >> 5
        r = (rel & 31).astype(jnp.uint32)
        hi = min(WIN_WORDS, (qmax if qmax is not None else WIN_WORDS - 1) + 1)
        w0 = jnp.zeros_like(win[:, 0])
        w1 = jnp.zeros_like(win[:, 0])
        for i in range(hi):
            w0 = jnp.where(q == i, win[:, i], w0)
        for i in range(min(WIN_WORDS, hi + 1)):
            w1 = jnp.where(q + 1 == i, win[:, i], w1)
        return (w0 << r) | ((w1 >> (31 - r)) >> 1)

    def block_body(carry, b):
        off, last, err = carry
        block_first = 1 + b * L
        valid_block = block_first < n

        # One sliced gather per block: K contiguous G-word slices, then
        # realign to the block's start word with (G-1)-way selects.
        sw = jnp.clip(off >> 5, 0, W - 1)
        gshift = G.bit_length() - 1
        q = sw >> gshift  # padded array keeps [G*q, G*q+K*G) in range
        raw = jnp.take_along_axis(wg, (q[:, None] + slice_iota)[:, :, None], axis=1)
        raw = raw.reshape(F, K * G)  # [F, K*G] words starting at word G*q
        delta = sw - (q << gshift)  # 0..G-1
        win = []
        for i in range(WIN_WORDS):
            v = raw[:, i]
            for d in range(1, G):
                v = jnp.where(delta == d, raw[:, i + d], v)
            win.append(v)
        win = jnp.stack(win, axis=1)  # [F, WIN_WORDS] aligned at sw
        rel = off - (sw << 5)  # in-window bit offset (0..31 at block start)

        hdr = extract32(win, rel, qmax=1)  # block header: rel <= 31
        ftype = (hdr >> 30).astype(jnp.int32)
        dec_nb = ((hdr >> 26) & 0xF).astype(jnp.int32) + 1
        is_hdr0 = ftype == 0
        is_pass = is_hdr0 & (dec_nb == 16)
        bpf_err = valid_block & is_hdr0 & (dec_nb <= 5)
        rel = rel + jnp.where(is_hdr0, constants.BFP_HDR_LEN, constants.RICE_HDR_LEN)

        # Per-ftype constants via small selects (params are static).
        nsubs_f = jnp.where(ftype == 2, int(nsubs_np[2]), int(nsubs_np[3]))
        invlen_f = jnp.where(
            ftype == 1, int(invlen_np[1]), jnp.where(ftype == 2, int(invlen_np[2]), int(invlen_np[3]))
        )
        level = (1 << nsubs_f).astype(jnp.int32)
        nbsuf = jnp.where(ftype == 2, 2, 4)  # decoder.rs:180 quirk: hardwired
        dec_nb_u = jnp.clip(dec_nb, 1, 31).astype(jnp.uint32)
        neg_thresh = 1 << jnp.clip(dec_nb - 1, 0, 30)

        def decode_math(win32, last, oob, valid):
            """Branch-free decode of one sample from its 32-bit window.
            Returns (new_sample, consumed_bits, oob flag)."""
            zeros = jax.lax.clz(win32).astype(jnp.int32)
            zc = jnp.clip(zeros, 0, 31).astype(jnp.uint32)

            # Rice ftype 1: unary index + stop bit (decoder.rs:147-170)
            # Rice ftype 2/3: unary + suffix (decoder.rs:172-196)
            suffix = ((win32 << zc) >> (32 - nbsuf.astype(jnp.uint32))).astype(jnp.int32)
            idx = jnp.where(ftype == 1, zeros, suffix + level * (zeros - 1))
            is_rice = ftype >= 1
            oob = oob | (valid & is_rice & ((idx < 0) | (idx >= invlen_f)))
            delta_rice = _inv_rice(jnp.clip(idx, 0, 59))

            # BFP / pass-through: fixed dec_nb-bit field (decoder.rs:209-235)
            a = (win32 >> (32 - dec_nb_u)).astype(jnp.int32)
            delta_bfp = a - jnp.where(a > neg_thresh, neg_thresh * 2, 0)
            v_pass = _wrap16((win32 >> 16).astype(jnp.int32))

            delta = jnp.where(is_rice, delta_rice, delta_bfp)
            new = jnp.where(is_pass, v_pass, _wrap16(last + delta))
            consume = jnp.where(
                ftype == 1, zeros + 1, jnp.where(is_rice, zeros + nbsuf, dec_nb)
            )
            return new, consume, oob

        oob = jnp.zeros_like(valid_block)
        if L <= 24:
            # Small blocks (incl. the default 20): fully unrolled; each
            # sample extracts its window independently — short dependency
            # chains, everything fuses.
            outs = []
            for k in range(L):
                valid = valid_block & ((block_first + k) < n)
                win32 = extract32(win, rel)
                new, consume, oob = decode_math(win32, last, oob, valid)
                rel = rel + jnp.where(valid, consume, 0)
                last = jnp.where(valid, new, last)
                outs.append(new)
            blk = jnp.stack(outs, axis=1)  # [F, L]
            off = (sw << 5) + rel
        else:
            # Large blocks: a rolling 64-bit register window inside lax.scan
            # keeps the trace (and compile time) O(1) in block_len.
            widx = rel >> 5
            r = rel & 31
            w0 = select_word(win, widx)
            w1 = select_word(win, widx + 1)

            def sample_step(state, k):
                widx, r, w0, w1, last, oob = state
                valid = valid_block & ((block_first + k) < n)
                ru = r.astype(jnp.uint32)
                win32 = (w0 << ru) | ((w1 >> (31 - ru)) >> 1)
                new, consume, oob = decode_math(win32, last, oob, valid)
                # Valid codes never exceed 16 bits; clamping keeps the
                # rolling invariant (r < 32 -> single-word advance) on
                # garbage lanes, which are error-flagged anyway.
                consume = jnp.minimum(consume, 16)
                r = r + jnp.where(valid, consume, 0)
                carry = r >= 32
                r = r - jnp.where(carry, 32, 0)
                w0 = jnp.where(carry, w1, w0)
                w1 = jnp.where(carry, select_word(win, widx + 2), w1)
                widx = widx + carry.astype(jnp.int32)
                last = jnp.where(valid, new, last)
                return (widx, r, w0, w1, last, oob), new

            state = (widx, r, w0, w1, last, oob)
            state, outs = jax.lax.scan(sample_step, state, jnp.arange(L, dtype=jnp.int32))
            widx, r, w0, w1, last, oob = state
            blk = jnp.transpose(outs, (1, 0))
            off = (sw << 5) + (widx << 5) + r
        # First error wins (reference decode stops at the first bad block,
        # decodefile.rs:128-135); BFP-header and Rice-OOB errors are mutually
        # exclusive within one block, so this ordering is exact.
        blk_code = jnp.where(bpf_err, ERR_INVALID_BPF, jnp.where(oob, ERR_OOB_INVERSE, ERR_OK))
        err = jnp.where(err != ERR_OK, err, blk_code)
        return (off, last, err), blk

    off0 = n * 0 + 16  # bitstream starts after the raw first sample
    err0 = jnp.zeros_like(n)
    (off, last, err), blocks = jax.lax.scan(
        block_body, (off0, first, err0), jnp.arange(B, dtype=jnp.int32)
    )
    # blocks: [B, F, L] -> sample stream [F, B*L]; slot b*L+k is sample
    # 1 + b*L + k, so prepending the raw first sample gives the frame.
    flat = jnp.transpose(blocks, (1, 0, 2)).reshape(F, B * L)
    out = jnp.concatenate([first[:, None], flat[:, : S - 1]], axis=1)
    err = jnp.where(err != ERR_OK, err, jnp.where(off > jnp.int32(W * 32), ERR_OVERRUN, ERR_OK))
    return out.astype(jnp.int16), err, words
