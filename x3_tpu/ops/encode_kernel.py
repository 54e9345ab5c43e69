"""Batched TPU encode pipeline: frames as tensors, bit packing by prefix sum.

The reference encoder is a sequential per-sample state machine
(/root/reference/src/encoder.rs:175-315 driving the scratch-byte BitPacker,
bitpacker.rs:142-163).  Here the whole computation is re-derived as array
programs over a [F, S] batch of frames (SURVEY.md §7):

1. first-order diff — one subtraction over the frame;
2. per-block (20-sample) masked max-|diff| reductions select Rice/BFP/literal
   exactly like x3_encode_block (encoder.rs:289-315);
3. per-sample (value, nbits) come from closed-form arithmetic identities of
   the Rice code tables (no gathers) — writing `code` in `num_bits` total
   bits reproduces the reference's zeros+code split exactly;
4. exclusive prefix sums of item bit lengths yield every item's bit offset
   (this replaces the BitPacker state machine);
5. packing is two-level and gather/scatter-free: each block's bits go into
   a superword-aligned register buffer (elementwise select-accumulates or
   the fused Pallas kernel), and buffers are compacted into the frame's
   word stream ON THE MXU via a one-hot byte-plane matmul (bit-disjoint
   contributions make + == |);
6. payload CRC16 runs as a GF(2) matmul on the MXU (ops/crc_jax.py).

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
from .crc_jax import crc16_words_jax

# Statistics slot mapping for Rice blocks: slot = nsubs of the selected code
# (encoder.rs:266); BFP -> 4, pass-through -> 5.


def _rice_nsubs_np(params: Parameters):
    """nsubs of the three selected Rice codes (statistics slot mapping)."""
    return np.asarray([rc.nsubs for rc in params.rice_codes], dtype=np.int32)


def rice_code_closed_form(d, order: int):
    """Closed-form Rice (code value, total bits) for a diff `d` under rice
    order `order` — arithmetic identities of the static tables in x3.rs:207-252
    (verified exhaustively against them in tests), replacing per-sample table
    gathers with elementwise VPU ops.

    order 0:   code = 1,  bits = 2|d| + [d >= 0]
    order k>0: e = d if d >= 0 else -d-1
               bits = (k+1) + (e >> (k-1))
               code = 2^k | ((d & (2^(k-1)-1)) << 1)          if d >= 0
                      (2^(k+1)-1) - ((d & (2^(k-1)-1)) << 1)  if d <  0
    """
    if order == 0:
        bits = 2 * jnp.abs(d) + jnp.where(d >= 0, 1, 0)
        code = jnp.ones_like(d)
        return code, bits
    k = order
    e = jnp.where(d >= 0, d, -d - 1)
    bits = (k + 1) + (e >> (k - 1))
    low = (d & ((1 << (k - 1)) - 1)) << 1
    code = jnp.where(d >= 0, (1 << k) | low, ((1 << (k + 1)) - 1) - low)
    return code, bits


def frame_geometry(params: Parameters):
    """Static sizes for the [F, S] pipeline."""
    B = params.blocks_per_frame
    return params.samples_per_frame, B, params.block_len, _worst_case_words(params, B)


def frame_geometry_blocks(params: Parameters, n_blocks: int):
    """Static decode sizes for a pipeline walking `n_blocks` blocks per frame.

    The reference decoder's block loop is driven purely by the caller-
    supplied sample count — `min(remaining, block_len)` per block, never by
    Parameters.blocks_per_frame (decoder.rs:36-58); blocks_per_frame is not
    serialized in the archive XML, so decode must accept frames LARGER than
    the default geometry (decodefile.rs:295-300).  Decode callers derive
    n_blocks from the batch's max header sample count (bucketed — see
    models/decoder.decode_geometry) and this helper supplies the matching
    static sizes.  The output width is 1 + n_blocks*block_len (raw first
    sample + full blocks) — note this exceeds params.samples_per_frame by
    one even at n_blocks == blocks_per_frame, since a foreign frame may
    carry one extra sample at the same block count."""
    B = n_blocks
    L = params.block_len
    return 1 + B * L, B, L, _worst_case_words(params, B)


def _worst_case_words(params: Parameters, B: int) -> int:
    # Worst case payload bits: 16 (first sample) + per block (6-bit header +
    # 16 bits per sample).  The last block of a full frame has L-1 samples
    # but we bound with L for simplicity.
    max_bits = 16 + B * (constants.BFP_HDR_LEN + 16 * params.block_len)
    n_words = -(-max_bits // 32) + 1  # +1 slack word for end-of-stream spill
    if n_words % 8:
        n_words += 8 - n_words % 8
    return n_words


def block_buffer_words(params: Parameters) -> int:
    """Words per block buffer: worst-case block bits (first sample + header +
    16 bits/sample) plus up to 31 bits of start-offset skew."""
    max_block_bits = 16 + constants.BFP_HDR_LEN + 16 * params.block_len
    return -(-(max_block_bits + 31) // 32)


def width_rungs(params: Parameters) -> list[int]:
    """Ascending payload-width specializations for adaptive encode.

    The packing cost scales with the static payload width W (one-hot merge
    columns, matmul output, CRC), but W is sized for INCOMPRESSIBLE input
    while typical audio fills a fraction of it.  The host encodes at a
    compact rung and escalates to the full width only for batches whose
    `total_bits` (computed from code lengths, independent of the packing
    writes, so it is correct even when a frame overflows the compact
    buffer) do not fit — see models/encoder.py.  Escalation jumps straight
    to the first fitting rung, so a stream pays at most ONE re-dispatch
    regardless of ladder depth.  Measured on v5e at F=1024: full W=5096
    3.8 ms vs W=2048 2.7 ms (+40%); on a very-compressible corpus
    (PI240-class, ratio ~7+) the finer rungs win again: encode 9.9 ->
    11.5 GB/s at W=512 (F=768), decode 7.43 -> 7.74 GB/s (F=6144); and on
    the music class (ratio ~1.3) W=4096 still beats the 5096 worst case by
    ~8% (with NW=10, 5.9 -> 7.4 GB/s combined)."""
    _, _, _, W = frame_geometry(params)
    ladder = [r for r in (512, 1024, 2048, 4096) if W > r]
    return ladder + [W]


def fits_width(nbytes, w_words: int, params: Parameters | None = None) -> bool:
    """True when every frame's payload fits a w_words-word buffer (with the
    end-of-stream spill slack the packer needs)."""
    import numpy as _np

    if params is not None:
        _, _, _, W = frame_geometry(params)
        if w_words >= W:
            return True
    return int(_np.max(nbytes, initial=0)) <= (w_words - 2) * 4


def block_width_rungs(params: Parameters) -> list[int]:
    """Ascending block-buffer width (NW) specializations for adaptive encode.

    The level-1 select-accumulate pack and the MXU merge both scale with
    NB4 = NW + GR - 1 word slots, but block_buffer_words sizes NW for an
    INCOMPRESSIBLE block (16 bits/sample) while compressible audio's blocks
    run ~6-8 bits/sample.  Same trick as width_rungs at block granularity:
    encode at a compact NW, escalate (sticky) when any block's
    r2 + block_bits exceeds the compact buffer — see fits_block_width and
    models/encoder.py.  Measured on v5e (hydrophone corpus, F=768,
    W rung 2048): NW=12 1.76 ms vs NW=6 1.43 ms; with the F=768 sweet spot
    this took device encode 8.6 -> ~11 GB/s.  NW=4 (very compressible
    corpora whose blocks run ~2-3 words) adds 10.0 -> 11.5 GB/s at W=512
    on the PI240 class; NW=10 serves the music class (blockfit ~520 bits,
    6.4 -> 7.4 GB/s at W=4096).  NW=7 is anomalously slow — keep it off
    ladders."""
    full = block_buffer_words(params)
    ladder = {full}
    if full > 6:
        ladder |= {6, max(6, full // 2)}
    if full > 10:
        ladder.add(10)
    if full > 4:
        ladder.add(4)
    return sorted(ladder)


def fits_block_width(blockfit_bits, nw_words: int, params: Parameters | None = None) -> bool:
    """True when every block's packed bits fit an nw_words block buffer.

    blockfit_bits is encode_frames' per-frame max of (r2 + block_bits) —
    computed from the code lengths alone, so it is reliable even when the
    packing writes themselves overflowed the compact buffer.  The last item
    of a block straddles into word (r2 + block_bits - 1) >> 5, which must
    stay within the NB4 = nw_words + GR - 1 level-1 slots."""
    import numpy as _np

    if params is not None and nw_words >= block_buffer_words(params):
        return True
    return int(_np.max(blockfit_bits, initial=0)) <= (nw_words + 8 - 1) * 32


def _pack_segment_sum(item_val, item_len, W: int):
    """Reference pack: each item contributes to <= 2 words; disjoint-bit
    contributions are combined with one big segment-sum scatter.  Correct but
    scatter-bound on TPU — kept as the differential oracle for the fast
    block-buffer pack below."""
    F, M = item_val.shape
    ends = jnp.cumsum(item_len, axis=1)
    off = ends - item_len  # exclusive prefix sum = absolute bit offsets
    total_bits = ends[:, -1]

    # Clip keeps an overflowing frame (compact w_words rung smaller than its
    # payload) inside its own segment range instead of corrupting the next
    # frame's words; its own tail is garbage, which fits_width flags.
    word = jnp.clip(off >> 5, 0, W - 1).astype(jnp.int32)
    sh = 32 - (off & 31) - item_len  # left shift if >=0, else straddles words
    shl = jnp.clip(sh, 0, 31).astype(jnp.uint32)
    shr = jnp.clip(-sh, 0, 31).astype(jnp.uint32)
    hi = jnp.where(sh >= 0, item_val << shl, item_val >> shr)
    lo = jnp.where(sh < 0, item_val << (32 - shr), jnp.uint32(0))

    frame_base = jnp.arange(F, dtype=jnp.int32)[:, None] * (W + 1)
    data = jnp.concatenate([hi.reshape(-1), lo.reshape(-1)])
    segs = jnp.concatenate([(frame_base + word).reshape(-1), (frame_base + word + 1).reshape(-1)])
    words = jax.ops.segment_sum(data, segs, num_segments=F * (W + 1))
    return words.reshape(F, W + 1)[:, :W], total_bits.astype(jnp.int32)


def _pack_block_buffers(item_val, item_len, W: int, NW: int = 12, use_pallas: bool = False):
    """Two-level TPU-native bit pack (no gathers or large scatters).

    item_val/item_len: uint32/int32 [F, B, I] — per-block item streams (slot 0
    is the frame's raw first sample, nonzero only for block 0).

    Level 1 packs each block's bits into an (NW+3)-word buffer aligned to the
    block's enclosing GR-word superword —
    purely elementwise select-accumulates over [F, B] lanes (or the fused
    Pallas kernel in ops/pack_pallas.py).  Level 2 compacts the buffers into
    the frame's word stream on the MXU: placement of the (monotone) block
    rows at their start superwords is a one-hot int8 byte-plane matmul —
    exact because contributions to any output word are bit-disjoint, so
    integer + equals | (mod-256 masked against int8 sign wraparound) —
    followed by static shifted adds to realign the word slots.
    Returns (words uint32 [F, W], total_bits int32 [F]).
    """
    F, B, I = item_val.shape
    GR = 8  # placement granularity in words (one-hot column = GR words)
    NB4 = NW + GR - 1  # word slots relative to the GR-word-aligned base

    ends_in = jnp.cumsum(item_len, axis=2)
    block_bits = ends_in[:, :, -1]  # [F, B]
    poff_in = ends_in - item_len  # exclusive, within block
    block_end = jnp.cumsum(block_bits, axis=1)
    block_off = block_end - block_bits  # global bit offset of block start
    total_bits = block_end[:, -1]
    r2 = block_off & (32 * GR - 1)  # bit offset within the GR-word superword
    blockfit = jnp.max(r2 + block_bits, axis=1)

    if use_pallas:
        from .pack_pallas import LANE_TILE, pack_blocks_pallas

        N = F * B
        pad = (-N) % LANE_TILE
        iv = jnp.moveaxis(item_val, 2, 0).reshape(I, N)
        il = jnp.moveaxis(item_len, 2, 0).reshape(I, N)
        rr = r2.reshape(1, N)
        if pad:
            iv = jnp.pad(iv, ((0, 0), (0, pad)))
            il = jnp.pad(il, ((0, 0), (0, pad)))
            rr = jnp.pad(rr, ((0, 0), (0, pad)))
        packed = pack_blocks_pallas(iv, il, rr, NB4, False)
        buf4 = jnp.moveaxis(packed[:, :N].reshape(NB4, F, B), 0, 2)
    else:
        # Pre-merge adjacent item pairs: each item is <= 16 bits, so a pair
        # concatenates into one <= 32-bit item — halving the select-
        # accumulate loop below (its cost is O(items * NB4)).
        if I % 2:
            item_val = jnp.concatenate([item_val, jnp.zeros((F, B, 1), jnp.uint32)], axis=2)
            item_len = jnp.concatenate([item_len, jnp.zeros((F, B, 1), jnp.int32)], axis=2)
        v0, v1 = item_val[:, :, 0::2], item_val[:, :, 1::2]
        l0, l1 = item_len[:, :, 0::2], item_len[:, :, 1::2]
        mval = (v0 << jnp.clip(l1, 0, 31).astype(jnp.uint32)) | v1
        mlen = l0 + l1
        return _pack_pairs(mval, mlen, W, NW)

    words = _merge_mxu(buf4, block_off, F, B, W, NW, NB4, GR)
    return words, total_bits.astype(jnp.int32), blockfit.astype(jnp.int32)


def _use_fused_encode(params: Parameters, W: int, F: int) -> bool:
    """Route encode to the fully fused Pallas kernel
    (ops/encode_fused_pallas.py): samples in, payload words out, one
    VMEM-resident pass — the R4-3 boundary confound removed.  The kernel
    routes itself only to the rungs where it measured ahead of the XLA
    pipeline (W >= 4096: music-class +15-22%; see
    encode_fused_pallas._auto_geometry).  X3_FUSED_ENCODE=0 opts out."""
    import os

    if os.environ.get("X3_FUSED_ENCODE", "1") != "1":
        return False
    if jax.default_backend() == "cpu":
        return False
    from .encode_fused_pallas import fused_encode_fits

    return fused_encode_fits(params, W, F)


def _finish_fused(samples, n_valid, params: Parameters, W: int):
    """Fused-kernel encode + the XLA epilogue (nbytes alignment, MXU CRC).
    Same output contract as the default path; blocks never truncate at an
    NW rung here (there are no block buffers), which only affects words the
    escalation contract already discards."""
    from .encode_fused_pallas import encode_frames_fused_words

    words, total_bits, blockfit, stats = encode_frames_fused_words(
        samples, n_valid.astype(jnp.int32), params, W
    )
    nbytes = (total_bits + 7) // 8
    nbytes = nbytes + (nbytes & 1)
    crc = crc16_words_jax(words, nbytes, W)
    return {
        "payload_words": words,
        "nbytes": nbytes.astype(jnp.int32),
        "crc": crc.astype(jnp.int32),
        "stats": stats,
        "total_bits": total_bits.astype(jnp.int32),
        "blockfit_bits": blockfit.astype(jnp.int32),
    }


def _use_pallas_pack(W: int, B: int, L: int, P: int, F: int) -> bool:
    """Opt-in (X3_PALLAS_PACK=1): route the pair pack to the VMEM-resident
    Pallas walk (ops/pack_walk_pallas.py).  MEASURED NEGATIVE in context on
    v5e (ROADMAP R4-3) — the XLA front fuses INTO the level-1 pack, so the
    Pallas boundary forces a [F, B, P] pair materialization the default
    path never pays, and the walk itself trails the MXU merge at F=768
    (full encode_frames A/B, fresh process per variant: pi240 -23%,
    hydrophone -17%, music -52%).  Kept as a tested experiment: the decode
    kernel's resident-words structure applied to the write side."""
    import os

    if os.environ.get("X3_PALLAS_PACK", "0") != "1":
        return False
    if jax.default_backend() == "cpu":
        return False
    from .pack_walk_pallas import pallas_pack_fits

    return pallas_pack_fits(W, B, L, P, F)


def _pack_pairs_walk(mval, mlen, W: int, L: int):
    """Pack pre-merged pairs via the Pallas walk kernel; the tiny [F, B]
    offset/bookkeeping math stays XLA (same values as _pack_pairs so the
    escalation contract and stats are engine-invariant)."""
    from .pack_walk_pallas import pack_frames_walk

    ends = jnp.cumsum(mlen, axis=2)
    block_bits = ends[:, :, -1]
    block_end = jnp.cumsum(block_bits, axis=1)
    block_off = block_end - block_bits
    total_bits = block_end[:, -1]
    r2 = block_off & (32 * 8 - 1)
    blockfit = jnp.max(r2 + block_bits, axis=1)
    words = pack_frames_walk(mval, mlen, block_off.astype(jnp.int32), W, L)
    return words, total_bits.astype(jnp.int32), blockfit.astype(jnp.int32)


def _pack_pairs(mval, mlen, W: int, NW: int):
    """Pack pre-merged <=32-bit item pairs: mval uint32 / mlen int32
    [F, B, P].  The encode front produces pairs directly (skipping an
    [F, B, 2+L] item materialization); see _pack_block_buffers for the
    algorithm description.

    Returns (words, total_bits, blockfit_bits); blockfit_bits is the
    per-frame max of r2 + block_bits, the quantity fits_block_width checks
    against the (possibly compact) NW rung."""
    F, B, P = mval.shape
    GR = 8
    NB4 = NW + GR - 1
    ends = jnp.cumsum(mlen, axis=2)
    block_bits = ends[:, :, -1]
    block_end = jnp.cumsum(block_bits, axis=1)
    block_off = block_end - block_bits
    total_bits = block_end[:, -1]
    r2 = block_off & (32 * GR - 1)
    blockfit = jnp.max(r2 + block_bits, axis=1)
    mpoff = ends - mlen + r2[:, :, None]

    t = (mpoff >> 5).astype(jnp.int32)  # target word slot, 0..NB4-1
    sh = 32 - (mpoff & 31) - mlen  # in [-31, 30] for <= 32-bit items
    shl = jnp.clip(sh, 0, 31).astype(jnp.uint32)
    shr = jnp.clip(-sh, 0, 31).astype(jnp.uint32)
    hi = jnp.where(sh >= 0, mval << shl, mval >> shr)
    lo = jnp.where(sh < 0, mval << (32 - shr), jnp.uint32(0))

    # Elementwise select-accumulate: slot[w] = sum of item pieces
    # targeted at w (bit-disjoint, so + == |).
    buf4 = []
    for w in range(NB4):
        acc = jnp.sum(jnp.where(t == w, hi, jnp.uint32(0)), axis=2)
        acc = acc + jnp.sum(jnp.where(t + 1 == w, lo, jnp.uint32(0)), axis=2)
        buf4.append(acc)
    buf4 = jnp.stack(buf4, axis=2)  # [F, B, NB4]
    words = _merge_mxu(buf4, block_off, F, B, W, NW, NB4, GR)
    return words, total_bits.astype(jnp.int32), blockfit.astype(jnp.int32)



def _encode_frames_fused(s, n_valid, params: Parameters, w_words: int | None = None, nw_words: int | None = None):
    """Fully kernel-fused encode: the front end (diff/classify/codes) and the
    block packer run as Pallas kernels in lanes-minor layout, with only the
    tiny block-offset cumsum, the MXU merge, and the CRC in XLA."""
    from .front_pallas import LANE_TILE, encode_front_pallas
    from .pack_pallas import pack_blocks_pallas

    S, B, L, W = frame_geometry(params)
    if w_words is not None:
        W = min(W, w_words)
    NW = block_buffer_words(params)
    if nw_words is not None:
        NW = min(NW, nw_words)
    GR = 8
    NB4 = NW + GR - 1
    F = s.shape[0]
    N0 = F * B
    pad = (-N0) % LANE_TILE
    N = N0 + pad

    def lanes(x, fill=0):
        flat = x.reshape(1, N0)
        if pad:
            flat = jnp.concatenate([flat, jnp.full((1, pad), fill, x.dtype)], axis=1)
        return flat

    n = n_valid[:, None]
    # Block sample layout: block b covers samples 1+bL..; its diff base is
    # sample bL.
    sblk = jnp.concatenate([s[:, 1:], jnp.zeros((F, 1), jnp.int32)], axis=1).reshape(F, B, L)
    sblk = jnp.moveaxis(sblk, 2, 0).reshape(L, N0)
    if pad:
        sblk = jnp.concatenate([sblk, jnp.zeros((L, pad), jnp.int32)], axis=1)
    sprev = lanes(s[:, ::L][:, :B])
    bidx = jax.lax.broadcasted_iota(jnp.int32, (F, B), 1)
    first_val = jnp.where((bidx == 0) & (n > 0), s[:, 0:1] & 0xFFFF, -1)
    nv_lane = jnp.clip(n - 1 - bidx * L, 0, L)
    first_l = lanes(first_val, fill=-1)
    nv_l = lanes(nv_lane)

    vals, lens, slot = encode_front_pallas(
        sblk, sprev, first_l, nv_l, L, params.codes, params.thresholds
    )

    # ---- statistics (XLA; tiny) ----
    slot_fb = slot[0, :N0].reshape(F, B)
    present = nv_lane > 0
    onehot = (slot_fb[:, :, None] == jnp.arange(6)[None, None, :]) & present[:, :, None]
    stats = jnp.sum(onehot * nv_lane[:, :, None], axis=1)

    # ---- block offsets (XLA cumsum; tiny) ----
    block_bits = jnp.sum(lens, axis=0)[:N0].reshape(F, B)
    block_end = jnp.cumsum(block_bits, axis=1)
    block_off = block_end - block_bits
    total_bits = block_end[:, -1]
    blockfit = jnp.max((block_off & (32 * GR - 1)) + block_bits, axis=1)
    r2 = lanes(block_off & (32 * GR - 1))

    buf4_ln = pack_blocks_pallas(vals, lens, r2, NB4, False)
    buf4 = jnp.moveaxis(buf4_ln[:, :N0].reshape(NB4, F, B), 0, 2)

    words = _merge_mxu(buf4, block_off, F, B, W, NW, NB4, GR)
    total_bits = total_bits.astype(jnp.int32)
    nbytes = (total_bits + 7) // 8
    nbytes = nbytes + (nbytes & 1)
    crc = crc16_words_jax(words, nbytes, W)
    return {
        "payload_words": words,
        "nbytes": nbytes.astype(jnp.int32),
        "crc": crc.astype(jnp.int32),
        "stats": stats,
        "total_bits": total_bits,
        "blockfit_bits": blockfit.astype(jnp.int32),
    }


def _merge_mxu(buf4, block_off, F, B, W, NW, NB4, GR=8):
    """Compact per-block buffers into the frame word stream on the MXU.

    Placing the (monotone) block rows at their start superwords is a one-hot
    int8 byte-plane matmul — exact because contributions to any output word
    are bit-disjoint, so integer + equals | (mod-256 masked against int8
    sign wraparound) — followed by static shifted adds to realign the GR-word
    slots.  The one-hot is the dominant traffic, hence the coarse GR-word
    placement granularity."""
    s_hi = (block_off >> (5 + GR.bit_length() - 1)).astype(jnp.int32)  # start superword
    WH = (W + NW) // GR + 2  # superword columns
    b8 = jnp.stack(
        [(buf4 >> 24) & 0xFF, (buf4 >> 16) & 0xFF, (buf4 >> 8) & 0xFF, buf4 & 0xFF], axis=3
    ).astype(jnp.int8).reshape(F, B, NB4 * 4)
    wi = jax.lax.broadcasted_iota(jnp.int32, (F, B, WH), 2)
    onehot = (wi == jnp.clip(s_hi, 0, WH - 1)[:, :, None]).astype(jnp.int8)
    placed = jax.lax.dot_general(
        onehot, b8, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32
    )
    # Disjoint-bit byte sums are exact mod 256, so the int32 accumulators can
    # be narrowed to int8 in the matmul epilogue (4x less HBM for `placed`).
    placed = placed.astype(jnp.int8).reshape(F, WH, NB4, 4)
    placed = placed.astype(jnp.uint32) & 0xFF
    pw = (placed[..., 0] << 24) | (placed[..., 1] << 16) | (placed[..., 2] << 8) | placed[..., 3]

    # out[GR*t + rr] = sum_{m} pw[t - m, rr + GR*m]
    n_m = -(-NB4 // GR)
    res_cols = []
    for rr in range(GR):
        acc = jnp.zeros((F, WH), jnp.uint32)
        for m in range(n_m):
            j = rr + GR * m
            if j < NB4:
                col = pw[:, : WH - m, j]
                acc = acc + jnp.concatenate([jnp.zeros((F, m), col.dtype), col], axis=1)
        res_cols.append(acc)
    words = jnp.stack(res_cols, axis=2).reshape(F, WH * GR)[:, :W]
    return words


# Sub-batch geometry for wide batches: XLA keeps the level-1 pack's
# [F, B]-shaped intermediates VMEM-resident up to roughly F=1024 (profiled
# S(1) placements); beyond that they spill to HBM and throughput falls off
# a cliff (F=1536 monolithic: 7.6 GB/s vs 10.2 GB/s as 2x768 sub-batches
# inside ONE jitted program, measured v5e).  Wide batches are therefore
# chunked at trace time — callers keep a single dispatch and a single
# output pytree.
_SUBBATCH = 768
_SUBBATCH_THRESHOLD = 1024


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def encode_frames(samples: jax.Array, n_valid: jax.Array, params: Parameters, pack_mode: str = "block", w_words: int | None = None, nw_words: int | None = None):
    """Encode a batch of frames (batches > 1024 frames are processed as
    768-frame sub-batches inside the jitted program; see _SUBBATCH).

    samples: int16/int32 [F, S] (payload samples, zero-padded past n_valid)
    n_valid: int32 [F] — number of valid samples per frame (0 = dummy frame)
    w_words: static payload width specialization (None = worst case from
      frame_geometry).  With a compact width the packing stages shrink
      proportionally; frames whose payload exceeds the buffer produce
      correct `nbytes`/`total_bits`/`stats` but truncated words — callers
      check `fits_width(nbytes, w_words)` and re-dispatch at a bigger rung
      (see width_rungs / models/encoder.py).
    nw_words: static block-buffer width specialization (None = worst case
      from block_buffer_words).  Same contract as w_words at block
      granularity: a block whose r2 + block_bits exceeds the compact buffer
      yields truncated words but correct `nbytes`/`total_bits`/`stats`/
      `blockfit_bits` — callers check `fits_block_width(blockfit_bits,
      nw_words)` and re-dispatch (see block_width_rungs).
    Returns dict with:
      payload:  uint8 [F, n_words*4] — packed payload bytes (zero past length)
      nbytes:   int32 [F] — payload length in bytes (word-aligned, even)
      crc:      int32 [F] — payload CRC16
      stats:    int32 [F, 6] — per-frame code-usage sample counts
      blockfit_bits: int32 [F] — max block r2+bits (block-rung escalation)
    """
    F = samples.shape[0]
    if F > _SUBBATCH_THRESHOLD:
        outs = [
            _encode_frames_body(
                samples[b : b + _SUBBATCH], n_valid[b : b + _SUBBATCH], params, pack_mode, w_words, nw_words
            )
            for b in range(0, F, _SUBBATCH)
        ]
        return {k: jnp.concatenate([o[k] for o in outs], axis=0) for k in outs[0]}
    return _encode_frames_body(samples, n_valid, params, pack_mode, w_words, nw_words)


def _encode_frames_body(samples, n_valid, params: Parameters, pack_mode, w_words, nw_words):
    S, B, L, W = frame_geometry(params)
    if w_words is not None:
        W = min(W, w_words)
    NW = block_buffer_words(params)
    if nw_words is not None:
        NW = min(NW, nw_words)
    F = samples.shape[0]
    t0, t1, t2 = params.thresholds
    nsubs = jnp.asarray(_rice_nsubs_np(params))

    s = samples.astype(jnp.int32)
    n = n_valid.astype(jnp.int32)[:, None]  # [F, 1]

    if pack_mode == "fused_pallas":
        return _encode_frames_fused(s, n_valid.astype(jnp.int32), params, w_words, nw_words)

    if pack_mode == "block" and _use_fused_encode(params, W, F):
        return _finish_fused(samples, n_valid, params, W)

    # ---- diffs over the frame (encoder.rs:222-225) ----
    # One shared shifted copy feeds both the diffs and the literal samples.
    snext = jnp.concatenate([s[:, 1:], jnp.zeros((F, 1), jnp.int32)], axis=1)  # [F, S]
    d = snext - s
    samp_idx = jax.lax.broadcasted_iota(jnp.int32, (F, S), 1)  # diff i belongs to sample i+1
    valid = (samp_idx + 1) < n  # [F, S]
    db = d.reshape(F, B, L)
    vb = valid.reshape(F, B, L)
    sb = snext.reshape(F, B, L)

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

    # ---- per-sample (value, nbits): closed-form rice codes, no gathers ----
    # One tensor-order evaluation (the per-block order k broadcast over the
    # block) instead of evaluating all three tables and selecting — the
    # closed form of rice_code_closed_form with k as data.
    rsel = jnp.clip(ftype_r, 0, 2)[:, :, None]  # selected rice table when is_rice
    c0, c1, c2 = params.codes
    k = jnp.where(rsel == 0, c0, jnp.where(rsel == 1, c1, c2))  # [F, B, 1]
    kk = jnp.maximum(k, 1)
    e = jnp.where(db >= 0, db, -db - 1)
    bits_k = (k + 1) + (e >> (kk - 1))
    low = (db & ((1 << (kk - 1)) - 1)) << 1
    code_k = jnp.where(db >= 0, (1 << kk) | low, ((1 << (kk + 1)) - 1) - low)
    bits0 = 2 * jnp.abs(db) + jnp.where(db >= 0, 1, 0)
    rice_val = jnp.where(k == 0, 1, code_k)
    rice_bits = jnp.where(k == 0, bits0, bits_k)
    bfp_bits = (nb + 1)[:, :, None]
    bfp_val = db & ((1 << jnp.minimum(bfp_bits, 31)) - 1)
    lit_val = sb & 0xFFFF

    val = jnp.where(is_rice[:, :, None], rice_val, jnp.where(is_literal[:, :, None], lit_val, bfp_val))
    ln = jnp.where(is_rice[:, :, None], rice_bits, jnp.where(is_literal[:, :, None], 16, bfp_bits))
    ln = jnp.where(vb, ln, 0)
    val = jnp.where(vb, val, 0)

    # ---- statistics (encoder.rs:63,266) ----
    slot = jnp.where(is_rice, nsubs[rsel[:, :, 0]], jnp.where(is_literal, 5, 4))  # [F, B]
    cnt = jnp.sum(vb, axis=2)  # samples per block
    stats = jnp.zeros((F, 6), jnp.int32)
    onehot = (slot[:, :, None] == jnp.arange(6)[None, None, :]) & present[:, :, None]
    stats = jnp.sum(onehot * cnt[:, :, None], axis=1)

    if pack_mode == "block":
        # ---- direct pair production: [F, B, 1 + ceil(L/2)] <=32-bit
        # items, skipping the [F, B, 2+L] item-stream materialization.
        # Pair 0 concatenates [raw first sample (block 0 only)][header];
        # pair j >= 1 concatenates samples (2j-2, 2j-1) of the block. ----
        is_b0 = jax.lax.broadcasted_iota(jnp.int32, (F, B), 1) == 0
        first_val = jnp.where(is_b0 & (n > 0), (s[:, 0] & 0xFFFF)[:, None], 0)  # [F, B]
        first_len = jnp.where(is_b0 & (n > 0), 16, 0)
        p0_val = (first_val.astype(jnp.uint32) << jnp.clip(hdr_len, 0, 31).astype(jnp.uint32)) | hdr_val.astype(jnp.uint32)
        p0_len = first_len + hdr_len
        valu = val.astype(jnp.uint32)
        if L % 2:
            valu = jnp.concatenate([valu, jnp.zeros((F, B, 1), jnp.uint32)], axis=2)
            ln = jnp.concatenate([ln, jnp.zeros((F, B, 1), jnp.int32)], axis=2)
        v0, v1 = valu[:, :, 0::2], valu[:, :, 1::2]
        l0, l1 = ln[:, :, 0::2], ln[:, :, 1::2]
        pv = (v0 << jnp.clip(l1, 0, 31).astype(jnp.uint32)) | v1
        pl = l0 + l1
        mval = jnp.concatenate([p0_val[:, :, None], pv], axis=2)
        mlen = jnp.concatenate([p0_len[:, :, None], pl], axis=2)
        if _use_pallas_pack(W, B, L, mval.shape[2], F):
            words, total_bits, blockfit = _pack_pairs_walk(mval, mlen, W, L)
        else:
            words, total_bits, blockfit = _pack_pairs(mval, mlen, W, NW)
    elif pack_mode in ("segment", "block_pallas"):
        # ---- item stream as [F, B, 2+L]: [first?][hdr][samples] ----
        # Slot 0 carries the frame's raw 16-bit first sample in block 0 only.
        first_val = jnp.zeros((F, B, 1), jnp.int32).at[:, 0, 0].set(s[:, 0] & 0xFFFF)
        first_len = jnp.zeros((F, B, 1), jnp.int32).at[:, 0, 0].set(jnp.where(n_valid > 0, 16, 0))
        item_val = jnp.concatenate([first_val, hdr_val[:, :, None], val], axis=2).astype(jnp.uint32)
        item_len = jnp.concatenate([first_len, hdr_len[:, :, None], ln], axis=2)
        if pack_mode == "block_pallas":
            words, total_bits, blockfit = _pack_block_buffers(
                item_val, item_len, W, NW, use_pallas=True
            )
        else:
            words, total_bits = _pack_segment_sum(item_val.reshape(F, -1), item_len.reshape(F, -1), W)
            blockfit = jnp.zeros((F,), jnp.int32)  # segment pack has no block buffers
    else:
        raise ValueError(f"unknown pack_mode {pack_mode!r}")

    nbytes = (total_bits + 7) // 8
    nbytes = nbytes + (nbytes & 1)  # word-align to 2 bytes (bitpacker.rs:124-132)

    crc = crc16_words_jax(words, nbytes, W)

    # The payload stays as u32 words: the host turns them into big-endian
    # bytes with a free numpy byteswap-view instead of a device-side expand.
    return {
        "payload_words": words,
        "nbytes": nbytes.astype(jnp.int32),
        "crc": crc.astype(jnp.int32),
        "stats": stats,
        "total_bits": total_bits.astype(jnp.int32),
        "blockfit_bits": blockfit.astype(jnp.int32),
    }
