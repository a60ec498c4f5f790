"""Pallas TPU kernels for the entropy back-end: symbolize + bitstream pack.

Replaces the XLA scatter/gather formulation (jpegtpu.entropy.scan/assemble —
kept as the semantics oracle) whose table-gathers and scatter-adds lower
poorly on TPU. Two kernels:

Kernel B — block_pack: [N, 64] zigzag coefficients -> per-block packed
    bitstreams ([N, 56] big-endian u32 words + [N] bit lengths). Everything
    is VMEM-local per tile:
      * zero-run recovery via log-step rolls (cummax), no serial scan;
      * Huffman table lookup via native 128-lane gathers (dynamic_gather /
        take_along_axis), chunk-selected over the 512-entry packed table;
      * bit placement exploits that word targets are monotone along the
        slot axis: each output word is a difference of prefix sums at a
        rank found by branchless binary search (6 lane gathers) — a
        scatter expressed entirely as gathers.

Kernel C — segment merge: per-block streams -> per-restart-segment
    bitstreams. The bit-level concatenation is the one sequential
    dependence JPEG leaves after restart segmentation (SURVEY §2.14).
    Two implementations:
      * seg_merge (v1): fori loop per segment over blocks with a VMEM
        accumulator; one funnel shift + dynamic 2-row read-modify-write
        per block.
      * seg_merge_v2: vectorized MCU pre-merge (mcu_merge: G block streams
        -> one MCU stream via per-row lane gathers, no serial work), then a
        register-window serial phase — the stream cursor lives in a
        [16, 128] vreg window and flushes one 1024-word frame to the output
        only when crossed, cutting serial iterations by G and removing
        almost all memory traffic from the loop.
    Both apply the final-byte 1-padding (T.81 F.1.2.3). Grid = segments.

The reference's GPU path never got this far: its rleKernel stops at (run,
value) pairs with an indexing bug (.cl:198-235, SURVEY §2.9) and Huffman/
packing never ran on device at all.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpegtpu.entropy import huffman_tables as ht

# Per-block word capacity: 63 AC * 26 bits + DC 22 bits = 1660 bits -> 52
# words; +1 spill word, padded to 56 for layout friendliness.
BLOCK_WORDS = 56
_TILE = 512  # MCU rows per grid step in kernel B / block_pack_mcu
# (TPU sweep 2026-08: 512 -> 2.46 ms vs 2.56 ms at 256 on a 4K g=6
# frame; 1024 exceeds VMEM. scripts/tpu_probe_bp_tile.py)

# Timing-attribution hook for block_pack_mcu (scripts/tpu_probe_bp_attr.py):
# trace-time Python branch only — production traces with None and carries
# no cost. Outputs are GARBAGE in every non-None mode; they exist to bound
# each stage's share of the kernel time by subtraction:
#   "nosym"     skip _symbolize_pair entirely (raw coeffs as pair streams)
#   "nocummax"  skip the run-length cummax rolls
#   "nolut"     skip the Huffman table gathers (AC + DC)
#   "nomm"      skip the MXU prefix matmuls (identity passthrough)
#   "norank"    skip the binary-search rank gathers in _place_pair
#   "nopsat"    skip the prefix-sum-at-rank gathers in _place_pair
#   "nomergegather"  skip the per-chunk placement gathers in _merge_pairs
#   "staticchain"    break _merge_pairs' serial off-chain (static offsets)
_BP_ATTR_MODE = None


def _interpret() -> bool:
    """Pallas interpreter mode off-TPU (tests on the CPU backend)."""
    return jax.default_backend() != "tpu"


def _lut_tables() -> np.ndarray:
    """[4, 128] i32 packed AC table: entry cls*256 + (run<<4|size), value
    (code << 5) | len — one lane-gather per 128-entry chunk retrieves both
    fields (codes <=16 bits, lens <=16 -> 21 bits total)."""
    _, _, ac_codes, ac_lens = ht.packed_luts()
    packed = ((ac_codes.reshape(-1).astype(np.int64) << 5) |
              ac_lens.reshape(-1)).astype(np.int32)
    return packed.reshape(4, 128)


def _dc_tables() -> np.ndarray:
    """[1, 128] i32 packed DC table: entry cls*16 + size -> (code<<5)|len."""
    dc_codes, dc_lens, _, _ = ht.packed_luts()
    packed = ((dc_codes.reshape(-1).astype(np.int64) << 5) |
              dc_lens.reshape(-1)).astype(np.int32)
    out = np.zeros(128, np.int32)
    out[:32] = packed
    return out.reshape(1, 128)


def _cumlog(x, op, identity, axis=1):
    """Inclusive scan along `axis` via log-step rolls (no serial loop)."""
    n = x.shape[axis]
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    k = 1
    while k < n:
        rolled = pltpu.roll(x, k, axis=axis)
        rolled = jnp.where(ids >= k, rolled, identity)
        x = op(x, rolled)
        k *= 2
    return x


def _size_category(av):
    """bit-length of av (0 for 0): float32 exponent extraction — exact for
    av < 2^24, ~5 vector ops instead of 12 compare+adds."""
    f = av.astype(jnp.float32)
    e = jnp.right_shift(pltpu.bitcast(f, jnp.int32), 23) & 0xFF
    return jnp.where(av > 0, e - 126, 0)


def _symbolize_pair(c, cls2, dcd2, ac_tbl_ref, dc_tbl_ref,
                    static_cls=None):
    """Kernel B core on one two-block row group: lanes [0,64) are block
    A's zigzag slots, [64,128) block B's. Every scan/select masks on
    k = lane%64, so the two halves never interact and all ops run at
    native vector width. [T,128] i32 (+[T,2] class, [T,2] dcdiff) ->
    ([T,128] u32 packed words: A's stream in lanes [0,64), B's in
    [64,128); [T,2] i32 total bit lengths).

    static_cls: when the caller knows BOTH blocks of the pair share one
    Huffman class (trace-time constant — true for every pair in the 420
    and 422 MCU layouts), the AC table lookup touches only that class's
    2 chunks of the packed 512-entry table: 2 lane-gathers instead of 4.
    The gather passes are the kernel's measured cost (docs/PERF.md:
    rank 7 + ps_at 4 + LUT 5 per pair); this trims LUT to 3. cls2 must
    agree with static_cls (asserted by the bit-parity tests)."""
    t = c.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, 128), 1)
    k = lane & 63                                       # slot within block
    half = jnp.right_shift(lane, 6)                     # 0 / 1

    def per_half(a2):
        """[T2, 2] per-block scalars -> [T2, 128] per-lane broadcast."""
        return jnp.where(half == 0, a2[:, 0:1], a2[:, 1:2])

    cls = per_half(cls2)
    dcdiff = per_half(dcd2)

    # --- run-length structure (cf. entropy.scan.block_symbols) ---
    nz = c != 0
    m = nz | (k == 0)                                   # DC slot sentinel
    masked = jnp.where(m, k, -1)
    if _BP_ATTR_MODE == "nocummax":                     # timing only
        cmax = masked
    else:
        cmax = _cumlog64(masked, jnp.maximum, -1, k)    # per-half cummax
    prev = pltpu.roll(cmax, 1, axis=1)
    prev = jnp.where(k == 0, 0, prev)                   # half-safe shift
    # last nonzero slot = the cummax at each half's final lane (the DC
    # sentinel keeps it >= 0) — no full-lane reductions needed
    last_nz = per_half(jnp.concatenate(
        [cmax[:, 63:64], cmax[:, 127:128]], axis=1))

    run = k - prev - 1
    av = jnp.abs(c)
    size = _size_category(av)

    is_ac = k > 0
    emit_nz = is_ac & nz
    emit_zrl = is_ac & (~nz) & (k < last_nz) & ((k - prev) % 16 == 0)
    emit_eob = (k == last_nz + 1) & (last_nz < 63)
    emit_any = emit_nz | emit_zrl | emit_eob

    rs = jnp.where(emit_nz, ((run % 16) << 4) | size,
                   jnp.where(emit_zrl, ht.ZRL, ht.EOB))
    d_size2 = _size_category(jnp.abs(dcd2))             # [T2, 2]

    # --- Huffman lookup: native 128-lane gathers over the packed table.
    if static_cls is None:
        idx = cls * 256 + rs                            # [T2,128] in [0,512)
        chunk_set = range(4)
    else:
        idx = static_cls * 256 + rs                     # 2 chunks only
        chunk_set = (2 * static_cls, 2 * static_cls + 1)
    low = idx & 127
    chunk = jnp.right_shift(idx, 7)
    if _BP_ATTR_MODE == "nolut":                        # timing only
        packed = (idx << 5) | 5
        d_packed = (per_half(cls2 * 16 + d_size2) << 5) | 5
        a_code = jnp.right_shift(packed, 5)
        a_len = packed & 31
    else:
        packed = jnp.zeros((t, 128), jnp.int32)
        for ci in chunk_set:
            tbl_c = jnp.broadcast_to(ac_tbl_ref[ci:ci + 1, :], (t, 128))
            g = jnp.take_along_axis(tbl_c, low, axis=1)
            packed = jnp.where(chunk == ci, g, packed)
        a_code = jnp.right_shift(packed, 5)
        a_len = packed & 31

        dc_idx = per_half(cls2 * 16 + d_size2)          # [T2, 128]
        dc_tbl = jnp.broadcast_to(dc_tbl_ref[...], (t, 128))
        d_packed = jnp.take_along_axis(dc_tbl, dc_idx, axis=1)
    d_code = jnp.right_shift(d_packed, 5)
    d_len = d_packed & 31
    d_size = per_half(d_size2)

    # --- symbol bits: code||magnitude, right-aligned ---
    mag_sz = jnp.where(emit_nz, size, 0)
    neg = c + (jnp.left_shift(1, mag_sz) - 1)
    mag = jnp.where(c < 0, neg, c).astype(jnp.uint32) & \
        (jnp.left_shift(jnp.uint32(1), mag_sz.astype(jnp.uint32)) - 1)
    bits = (jnp.left_shift(a_code.astype(jnp.uint32),
                           mag_sz.astype(jnp.uint32)) | mag)
    lens = jnp.where(emit_any, a_len + mag_sz, 0)
    bits = jnp.where(emit_any, bits, 0)

    d_mag_neg = dcdiff + (jnp.left_shift(1, d_size) - 1)
    d_mag = jnp.where(dcdiff < 0, d_mag_neg, dcdiff).astype(jnp.uint32) & \
        (jnp.left_shift(jnp.uint32(1), d_size.astype(jnp.uint32)) - 1)
    d_bits = (jnp.left_shift(d_code.astype(jnp.uint32),
                             d_size.astype(jnp.uint32)) | d_mag)
    d_total = d_len + d_size

    lens = jnp.where(k == 0, d_total, lens)             # [T2, 128]
    bits = jnp.where(k == 0, d_bits, bits)

    # --- per-block packing into BLOCK_WORDS big-endian u32 words ---
    # per-half cumsum on the MXU (lens <= ~1700 per half: f32-exact)
    csum = _prefix64_mm(lens.astype(jnp.float32),
                        _halfprefix_tril()).astype(jnp.int32)
    offs = csum - lens                                  # exclusive
    total = jnp.concatenate([csum[:, 63:64], csum[:, 127:128]], axis=1)

    w_idx = jnp.right_shift(offs, 5)
    b_in_w = offs & 31
    n1 = jnp.minimum(lens, 32 - b_in_w)
    rem = lens - n1
    rem_u = rem.astype(jnp.uint32)
    # Branch-free forms (where(...) guards lower pathologically, see the
    # funnel carries): slots with lens==0 have bits==0 so every masked
    # operand is already zero; shift amounts are kept < 32 by the
    # (x<<1)<<((31-k)&31) identity.
    # shift amounts hit 32 only when the operand is already zero, so
    # masking them to [0,31] is exact
    hi = jnp.left_shift(jnp.right_shift(bits, rem_u),
                        (32 - b_in_w - n1).astype(jnp.uint32) & 31)
    rem_mask = jnp.left_shift(jnp.uint32(1), rem_u) - 1
    lo = jnp.left_shift(bits & rem_mask,
                        (32 - rem).astype(jnp.uint32) & 31)

    # Place (value, word) pairs: hi at w_idx, lo at w_idx+1. All bit ranges
    # are disjoint, so per-word accumulation is exact on 16-bit halves in
    # f32. Word targets are NON-DECREASING along each half's slot axis, so
    # each output word is a difference of prefix sums at a rank found by
    # branchless binary search — a scatter expressed entirely as gathers.
    words = _place_pair(hi, lo, w_idx, k, half)
    return words, total


def _block_pack_kernel(coeffs_ref, cls_ref, dcdiff_ref, ac_tbl_ref,
                       dc_tbl_ref, words_ref, lens_ref):
    words, total = _symbolize_pair(
        coeffs_ref[...].astype(jnp.int32), cls_ref[...].astype(jnp.int32),
        dcdiff_ref[...].astype(jnp.int32), ac_tbl_ref, dc_tbl_ref)
    words_ref[...] = words
    lens_ref[...] = total


def _place_pair(v_hi, v_lo, wt, k, half):
    """Per-half scatter-by-monotone-key on two-block rows: v_hi placed at
    word targets wt, v_lo at wt+1 (both [T2,128] u32, wt per-half sorted) ->
    [T2,128] u32 word sums.

    One branchless binary search serves both: count for targets wt+1 at
    word w equals the count for wt at word w-1, i.e. the hi ranks shifted
    one lane."""
    t = v_hi.shape[0]
    base = half * 64                                    # gather offset

    # count[., w] = #slots with wt <= w, via branchless binary search.
    # Steps start at 64 so the count can reach all 64 slots; probes clamp.
    if _BP_ATTR_MODE == "norank":                       # timing only
        pos = jnp.minimum(k + 1, 64)
    else:
        pos = jnp.zeros((t, 128), jnp.int32)
        for step in (64, 32, 16, 8, 4, 2, 1):
            cand = pos + step
            probe = jnp.take_along_axis(
                wt, jnp.minimum(cand, 64) - 1 + base, axis=1)
            pos = jnp.where((cand <= 64) & (probe <= k), cand, pos)
    pos_lo = jnp.where(k == 0, 0, pltpu.roll(pos, 1, axis=1))

    def place(v, pos_v):
        # 16-bit halves accumulated through f32 prefix sums. An int32
        # formulation is semantically equivalent (mod-2^32 prefix
        # differences are exact for disjoint bits) and passes interpret
        # tests, but blows Mosaic compile time up ~15x (seconds -> ~8 min
        # for block_pack) on this toolchain — keep the f32 split.
        vh = pltpu.bitcast(jnp.right_shift(v, 16),
                           jnp.int32).astype(jnp.float32)
        vl = pltpu.bitcast(v & 0xFFFF, jnp.int32).astype(jnp.float32)

        def ps_at(ps):
            if _BP_ATTR_MODE == "nopsat":               # timing only
                return pltpu.bitcast(ps.astype(jnp.int32), jnp.uint32)
            g = jnp.take_along_axis(pltpu.bitcast(ps, jnp.int32),
                                    jnp.maximum(pos_v - 1, 0) + base,
                                    axis=1)
            g = pltpu.bitcast(g, jnp.float32)
            g = jnp.where(pos_v > 0, g, 0.0)
            prev = pltpu.roll(g, 1, axis=1)
            cum = g - jnp.where(k == 0, 0.0, prev)
            return pltpu.bitcast(cum.astype(jnp.int32), jnp.uint32)

        bd = _halfprefix_tril()
        psh = _prefix64_mm(vh, bd)
        psl = _prefix64_mm(vl, bd)
        return jnp.left_shift(ps_at(psh), 16) | ps_at(psl)

    return place(v_hi, pos) + place(v_lo, pos_lo)


def _cumlog64(x, op, identity, k):
    """Inclusive per-half scan along 128 lanes (halves of 64 never mix:
    rolled values whose in-half index k < step are replaced by identity)."""
    y = x
    step = 1
    while step < 64:
        rolled = pltpu.roll(y, step, axis=1)
        rolled = jnp.where(k >= step, rolled, identity)
        y = op(y, rolled)
        step *= 2
    return y


def _halfprefix_tril():
    """[128,128] f32 block-diagonal lower-triangular: x @ this = inclusive
    per-64-half prefix sum — one MXU matmul instead of a 6-step VPU scan
    (the f32 sums are exact below 2^24, which every caller satisfies)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    return ((i <= j) & ((i >> 6) == (j >> 6))).astype(jnp.float32)


def _prefix64_mm(x_f32, bd):
    """Per-half inclusive prefix along 128 lanes on the MXU.

    Precision.HIGHEST is required for exactness: the default bf16 MXU
    pass truncates >8-bit-mantissa integer inputs (the 16-bit value
    halves), which corrupted real-TPU output while interpret mode stayed
    bit-exact. HIGHEST's hi+lo bf16 decomposition is exact for 16-bit
    integers against a 0/1 matrix."""
    if _BP_ATTR_MODE == "nomm":                         # timing only
        return x_f32
    return jax.lax.dot_general(x_f32, bd, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=())
def block_pack(coeffs: jax.Array, cls: jax.Array,
               dcdiff: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[N, 64] i32 zigzag blocks (+[N] class, [N] dcdiff) ->
    ([N, BLOCK_WORDS] u32 words, [N] i32 bit lengths). N % 32 == 0."""
    n = coeffs.shape[0]
    pad = (-n) % (2 * _TILE)
    if pad:
        coeffs = jnp.concatenate(
            [coeffs, jnp.zeros((pad, 64), coeffs.dtype)])
        cls = jnp.concatenate([cls.reshape(-1), jnp.zeros(pad, cls.dtype)])
        dcdiff = jnp.concatenate(
            [dcdiff.reshape(-1), jnp.zeros(pad, dcdiff.dtype)])
        w, l = block_pack(coeffs, cls, dcdiff)
        return w[:n], l[:n]
    ac_tbl = jnp.asarray(_lut_tables())
    dc_tbl = jnp.asarray(_dc_tables())
    n2 = n // 2                                        # two blocks per row
    grid = (n2 // _TILE,)
    words, lens = pl.pallas_call(
        _block_pack_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_TILE, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n2, 128), jnp.uint32),
            jax.ShapeDtypeStruct((n2, 2), jnp.int32),
        ),
        interpret=_interpret(),
    )(coeffs.reshape(n2, 128), cls.reshape(n2, 2),
      dcdiff.reshape(n2, 2), ac_tbl, dc_tbl)
    return words.reshape(n, 64)[:, :BLOCK_WORDS], lens.reshape(n)


def mcu_group(g: int, bits_budget: int, mcus_per_seg: int) -> int:
    """MCU grouping factor for the entropy kernels: gm > 1 merges gm
    consecutive MCUs into ONE merge unit in block_pack_mcu, cutting
    seg_merge_mcu's serial append count by gm at identical bytes (the
    segment stream is the same concatenation either way).

    Grouping is chosen ONLY when it is free on the block_pack side: the
    grouped unit must still fit the SAME number of stream chunks as a
    single MCU (otherwise every placement/merge pass doubles — the
    round-3 negative result for pre-merging 420 pairs, docs/PERF.md).
    That makes it a no-op for 420 (g=6 already fills the budget chunk)
    and a structural win for the small-g modes the round-3 verdict
    flagged 2.6x off 420's per-pixel throughput: 444/422 group 2 MCUs,
    gray groups 8 (one chunk holds 8 grayscale MCU streams).

    Requires gm | mcus_per_seg so groups never straddle a restart
    segment boundary. Returns a power of two in {1, 2, 4, 8}."""
    chunks1, _ = mcu_capacity(g, bits_budget)
    for cand in (8, 4, 2):
        if mcus_per_seg % cand:
            continue
        ch, _ = mcu_capacity(g * cand, bits_budget)
        if ch == chunks1:
            return cand
    return 1


def mcu_capacity(g: int, bits_budget: int) -> Tuple[int, int]:
    """Per-MCU stream capacity under a per-block bit budget.

    Returns (chunks, cap_bits): the MCU stream is staged in chunks*128
    words; cap_bits is the largest per-MCU bit count that provably fits
    (2 words of funnel-spill slack). The caller must escalate to the
    worst-case budget when any MCU exceeds cap_bits — with
    bits_budget >= MAX_BITS_PER_BLOCK this is the true worst case and
    can never overflow."""
    cap_words = min(g * 52 + 2, -(-g * bits_budget // 32) + 2)
    chunks = -(-cap_words // 128)
    return chunks, (chunks * 128 - 2) * 32


def _block_pack_mcu_kernel(coeffs_ref, cls_ref, dcd_ref, ac_tbl_ref,
                           dc_tbl_ref, mwords_ref, mlens_ref,
                           *, g: int, chunks: int,
                           n_luma: int | None = None,
                           merge_rot: bool | None = None,
                           cls_period: int | None = None):
    """Kernels B+C fused: symbolize + per-block pack + MCU merge with the
    per-block streams never leaving registers (saves the full [N,56]
    HBM round trip and the mcu_merge kernel's streaming floor).

    coeffs [T, G2*128] (pair-major zigzag slots: pair p's lanes hold
    blocks 2p / 2p+1), cls/dcd [T, 2*G2] -> mwords [T, chunks*128],
    mlens [T, 1]. Odd g pads a dummy block whose stream is simply never
    merged."""
    g2 = (g + 1) // 2
    cls_a = cls_ref[...].astype(jnp.int32)
    dcd_a = dcd_ref[...].astype(jnp.int32)
    pair_words = []
    pair_tot = []
    for p in range(g2):
        c = coeffs_ref[:, 128 * p:128 * (p + 1)].astype(jnp.int32)
        # Static per-pair class when the MCU layout fixes it (420/422:
        # luma blocks first, then Cb, Cr; an odd-g dummy block is never
        # merged, so it inherits its neighbor's class harmlessly).
        # cls_period: with MCU grouping (mcu_group > 1) the class pattern
        # repeats every cls_period blocks instead of running luma-first
        # across all g.
        static_cls = None
        if n_luma is not None:
            per = cls_period or g
            ca = int(min(2 * p, g - 1) % per >= n_luma)
            cb = int(min(2 * p + 1, g - 1) % per >= n_luma)
            if ca == cb:
                static_cls = ca
        if _BP_ATTR_MODE == "nosym":                    # timing only
            w_p = pltpu.bitcast(c, jnp.uint32)
            tot_p = jnp.full((c.shape[0], 2), 500, jnp.int32)
        else:
            w_p, tot_p = _symbolize_pair(
                c, cls_a[:, 2 * p:2 * p + 2], dcd_a[:, 2 * p:2 * p + 2],
                ac_tbl_ref, dc_tbl_ref, static_cls=static_cls)
        pair_words.append(w_p)
        pair_tot.append(tot_p)

    merged, off = _merge_pairs(pair_words, pair_tot, g, chunks,
                               rot=merge_rot)
    # ref shapes differ by a unit middle dim in mcu-major mode
    mwords_ref[...] = merged.reshape(mwords_ref.shape)
    mlens_ref[...] = off.reshape(mlens_ref.shape)


def _merge_pairs(pair_words, pair_tot, g: int, chunks: int,
                 rot: bool | None = None):
    """Register MCU merge: per-pair packed streams ([T,128] u32, block A
    in lanes [0,64), B in [64,128)) + per-pair totals [T,2] -> (merged
    MCU streams [T, chunks*128] u32, total bits [T,1] i32). Shared by
    _block_pack_mcu_kernel and the fused pixel+block-pack kernel.
    rot selects the rotate+select placement variant (None = the module
    default _BP_MERGE_ROT; production paths pass EncoderConfig.bp_merge_rot)."""
    if rot is None:
        rot = _BP_MERGE_ROT
    t = pair_words[0].shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, 128), 1)
    out_chunks = [jnp.zeros((t, 128), jnp.uint32) for _ in range(chunks)]
    off = jnp.zeros((t, 1), jnp.int32)                   # exclusive bits
    for gi in range(g):
        p, hh = divmod(gi, 2)
        w = pair_words[p]
        if hh:                      # bring block B's words to lanes [0,64)
            w = pltpu.roll(w, 64, axis=1)
        w_pad = jnp.where(lane < 64, w, 0)
        if _BP_ATTR_MODE == "staticchain":  # timing only: break the
            # serial off-dependency with trace-time-constant offsets
            off = jnp.full((t, 1), gi * 500, jnp.int32)
        r = (off & 31).astype(jnp.uint32)
        q = off >> 5
        rolled1 = pltpu.roll(w_pad, 1, axis=1)
        sh = jnp.right_shift(w_pad, r)
        sh = sh | jnp.left_shift(jnp.left_shift(rolled1, 1),
                                 (31 - r) & 31)
        if rot:
            # One per-row rotation to the in-chunk lane position, then
            # masked chunk selects: a block's <= 65 stream words (64 +
            # funnel spill) span exactly the chunk windows q>>7 and
            # q>>7 + 1, so per-chunk gathers (the kernel's measured cost)
            # reduce to one gather plus 2*chunks-1 cheap selects.
            # Bit-identical to the per-chunk-gather form:
            # rot[lane] = sh[(lane - q%128) & 127] places word j at
            # absolute position q + j exactly as idx = lane+128*ci-q did.
            m = q & 127
            rot = pltpu.bitcast(
                jnp.take_along_axis(pltpu.bitcast(sh, jnp.int32),
                                    (lane - m) & 127, axis=1), jnp.uint32)
            hi = jnp.where(lane >= m, rot, 0)
            lo = jnp.where(lane < m, rot, 0)
            ca = q >> 7
            for ci in range(chunks):
                out_chunks[ci] = out_chunks[ci] | jnp.where(ca == ci, hi, 0)
                if ci:
                    out_chunks[ci] = out_chunks[ci] | \
                        jnp.where(ca + 1 == ci, lo, 0)
        elif _BP_ATTR_MODE == "nomergegather":          # timing only
            out_chunks[0] = out_chunks[0] | sh
        else:
            for ci in range(chunks):
                idx = lane + (128 * ci) - q
                valid = (idx >= 0) & (idx < 128)
                gat = jnp.take_along_axis(sh, jnp.clip(idx, 0, 127),
                                          axis=1)
                out_chunks[ci] = out_chunks[ci] | jnp.where(valid, gat, 0)
        off = off + pair_tot[p][:, hh:hh + 1]
    return jnp.concatenate(out_chunks, axis=1), off


def block_pack_mcu(coeffs: jax.Array, cls: jax.Array, dcdiff: jax.Array,
                   g: int, chunks: int | None = None,
                   n_luma: int | None = None,
                   merge_rot: bool | None = None):
    """[N, 64] i32 zigzag blocks in MCU-major order (+[N] class, [N]
    dcdiff) -> ([N/g, chunks*128] u32 MCU streams, [N/g] i32 bit
    lengths). Bit-identical to mcu_merge(*block_pack(...), g, chunks);
    see _block_pack_mcu_kernel."""
    n = coeffs.shape[0]
    assert n % g == 0
    return block_pack_mcu_pairs(coeffs.reshape(n // g, g * 64), cls,
                                dcdiff, g, chunks, n_luma=n_luma,
                                merge_rot=merge_rot)


def block_pack_mcu_pairs(c2: jax.Array, cls: jax.Array, dcdiff: jax.Array,
                         g: int, chunks: int | None = None,
                         mcu_major_segs: int | None = None,
                         n_luma: int | None = None,
                         merge_rot: bool | None = None,
                         cls_period: int | None = None):
    """block_pack_mcu on the pairs/native form: c2 [nM, g*64] with
    block-major columns (block i's zigzag slots at columns [64i, 64i+64))
    — the device kernel's own input layout, so production paths whose
    pixel path already emits this form (fused_dctq.encode_blocks_pairs)
    avoid the [N, 64] relayout entirely (~1.4 ms/4K frame, see
    scripts/tpu_trace_ab.py). cls/dcdiff stay flat [nM*g].

    mcu_major_segs = n_seg emits the stream words MCU-MAJOR — mwords
    [mps, n_seg_p * chunks*128] with mps = nM // n_seg and n_seg_p =
    n_seg rounded up to 8 — by running one segment per grid step and
    writing its streams as a lane-column block (mlens stays flat
    segment-major). This is seg_merge_mcu's kernel-native input order,
    turning its 50 MB [n_seg, mps] -> [G, mps, S] transpose (~1.2 ms/4K
    frame in-context, scripts/tpu_trace_ab.py; XLA layout-optimizes it
    away standalone but cannot against a pallas_call consumer) into a
    free lane-split reshape. The 2D form is forced by Mosaic's block
    rule (last two block dims divisible by (8, 128) or full): block
    (mps, chunks*128) over [mps, n_seg_p*chunks*128] qualifies, a
    (mps, 1, CW) block over [mps, n_seg, CW] does not. Columns of
    segments in [n_seg, n_seg_p) are never written: their off/len are
    zero downstream, every window row they touch belongs to a padded
    segment, and those output rows are sliced off — asserted by the
    byte-parity tests. Requires n_seg | nM and 8 | mps."""
    nm = c2.shape[0]
    if chunks is None:
        chunks = -(-(g * 52 + 2) // 128)
    if mcu_major_segs:
        assert nm % mcu_major_segs == 0
        tile = nm // mcu_major_segs                     # = mps
        assert tile % 8 == 0
    else:
        tile = _TILE
        pad = (-nm) % tile
        if pad:
            c2 = jnp.concatenate(
                [c2, jnp.zeros((pad, c2.shape[1]), c2.dtype)])
            cls = jnp.concatenate([cls.reshape(-1),
                                   jnp.zeros(pad * g, cls.dtype)])
            dcdiff = jnp.concatenate([dcdiff.reshape(-1),
                                      jnp.zeros(pad * g, dcdiff.dtype)])
            mw, ml = block_pack_mcu_pairs(c2, cls, dcdiff, g, chunks,
                                          n_luma=n_luma,
                                          merge_rot=merge_rot,
                                          cls_period=cls_period)
            return mw[:nm], ml[:nm]
    g2 = (g + 1) // 2
    cls2 = cls.reshape(nm, g)
    dcd2 = dcdiff.reshape(nm, g)
    if g != 2 * g2:                                     # odd g: dummy block
        c2 = jnp.pad(c2, ((0, 0), (0, 64)))
        cls2 = jnp.pad(cls2, ((0, 0), (0, 1)))
        dcd2 = jnp.pad(dcd2, ((0, 0), (0, 1)))
    ac_tbl = jnp.asarray(_lut_tables())
    dc_tbl = jnp.asarray(_dc_tables())
    kernel = functools.partial(_block_pack_mcu_kernel, g=g, chunks=chunks,
                               n_luma=n_luma, merge_rot=merge_rot,
                               cls_period=cls_period)
    if mcu_major_segs:
        n_seg_p = -(-mcu_major_segs // 8) * 8
        out_specs = (
            pl.BlockSpec((tile, chunks * 128), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((tile, n_seg_p * chunks * 128),
                                 jnp.uint32),
            jax.ShapeDtypeStruct((nm, 1), jnp.int32),
        )
    else:
        out_specs = (
            pl.BlockSpec((tile, chunks * 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((nm, chunks * 128), jnp.uint32),
            jax.ShapeDtypeStruct((nm, 1), jnp.int32),
        )
    mw, ml = pl.pallas_call(
        kernel,
        grid=(nm // tile,),
        in_specs=[
            pl.BlockSpec((tile, g2 * 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2 * g2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2 * g2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(c2, cls2, dcd2, ac_tbl, dc_tbl)
    return mw, ml.reshape(nm)



def _seg_merge_v3_kernel(mwords_ref, off_ref, len_ref, map_ref, out_ref,
                         win_ref, stage_ref, sem_out,
                         *, mb: int, m_steps: int, chunks: int, s_rows: int,
                         frames: int, mcu_major: bool = False):
    """Sublane-vectorized segment merge: S segments advance together.

    Each grid step (g, m) appends `mb` MCU streams to each of `s_rows`
    segments (segment = sublane row). All bit offsets are precomputed in
    XLA, so the only loop-carried state is the window content:
      * 16-chunk modular register window per row ([s_rows, 128] vregs);
        an MCU stream is funnel-shifted by off&31, lane-rotated by a
        native per-row gather (idx = (lane - pos) & 127), and OR-masked
        into the window chunks addressed by (off>>5>>7) mod 16;
      * frames flush to HBM via DMA when a row's offset crosses a
        1024-word boundary (crossing iterations come in via an SMEM-cheap
        scalar bitmap, also precomputed);
      * the window persists across m grid steps in VMEM scratch, so a
        segment's length never bounds VMEM — the streaming fix for the
        restart=0 cliff.
    mwords [1, mb, S, chunks*128], off/len [1, mb, S, 1], map [1, mb, 1, 2]
    (two crossing-bitmap words since s_rows=64 support)
    -> out [(G*S)*frames, 8, 128] via DMA only.
    """
    nwin = 16
    frame_bits = 1024 * 32
    g_id = pl.program_id(0)
    m_id = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (s_rows, 128), 1)
    su8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    zero = jnp.zeros((s_rows, 128), jnp.uint32)

    is_first = m_id == 0
    win = [jnp.where(is_first, zero, win_ref[c]) for c in range(nwin)]

    def _stage(w, half, srow):
        """[8, 128] frame image of window half `half`, row `srow`."""
        acc = jnp.zeros((8, 128), jnp.uint32)
        for k in range(8):
            acc = acc | jnp.where(su8 == k,
                                  w[half * 8 + k][srow:srow + 1, :], 0)
        return acc

    def body(j, win):
        win = list(win)
        o = off_ref[0, j]                                # [S, 1] i32
        l = len_ref[0, j]                                # [S, 1]
        # mcu-major mode blocks are [mb, 1, S, CW] (j outermost)
        s = mwords_ref[j, 0] if mcu_major else mwords_ref[0, j]  # [S, CW]
        r = (o & 31).astype(jnp.uint32)

        # funnel shift right by r bits across the whole stream (branch-free
        # carry: (x<<1)<<((31-r)&31) == x<<(32-r) for r>=1, 0 for r==0)
        shifted = []
        prev_last = jnp.zeros((s_rows, 1), jnp.uint32)
        for c in range(chunks):
            ch = s[:, c * 128:(c + 1) * 128]
            rolled1 = pltpu.roll(ch, 1, axis=1)
            carry_in = jnp.where(lane == 0, prev_last, rolled1)
            sh = jnp.right_shift(ch, r) | \
                jnp.left_shift(jnp.left_shift(carry_in, 1), (31 - r) & 31)
            shifted.append(sh)
            prev_last = ch[:, 127:128]

        # per-row lane rotation to the window-local position
        p_abs = o >> 5                                   # word offset [S,1]
        mrot = p_abs & 127
        idx = (lane - mrot) & 127
        rot = [pltpu.bitcast(
            jnp.take_along_axis(pltpu.bitcast(sh, jnp.int32), idx, axis=1),
            jnp.uint32) for sh in shifted]
        hi = [jnp.where(lane >= mrot, rc, 0) for rc in rot]
        lo = [jnp.where(lane < mrot, rc, 0) for rc in rot]

        pw = (p_abs >> 7)                                # chunk index [S,1]
        for w in range(nwin):
            acc = win[w]
            for c in range(chunks):
                acc = acc | jnp.where(((pw + c) & (nwin - 1)) == w,
                                      hi[c], 0)
                acc = acc | jnp.where(((pw + c + 1) & (nwin - 1)) == w,
                                      lo[c], 0)
            win[w] = acc

        # flush completed frames (rare; bitmap precomputed in XLA; two
        # 32-bit words so s_rows=64 fits)
        mp0 = map_ref[0, j, 0, 0]
        mp1 = map_ref[0, j, 0, 1]

        @pl.when((mp0 | mp1) != 0)
        def _():
            for srow in range(s_rows):
                mp_w = mp1 if srow >= 32 else mp0

                @pl.when(((mp_w >> (srow & 31)) & 1) != 0)
                def _(srow=srow):
                    o_s = off_ref[0, j, srow, 0]
                    f = o_s >> 15                        # frame completed
                    f_safe = jnp.minimum(f, frames - 1)  # budget overflow
                    seg = g_id * s_rows + srow

                    @pl.when((f & 1) == 0)
                    def _():
                        stage_ref[...] = _stage(win, 0, srow)

                    @pl.when((f & 1) == 1)
                    def _():
                        stage_ref[...] = _stage(win, 1, srow)

                    cp = pltpu.make_async_copy(
                        stage_ref, out_ref.at[seg * frames + f_safe],
                        sem_out)
                    cp.start()
                    cp.wait()

        # retire the flushed half so it can host frame f+2
        fstart = o >> 15
        crossed = ((o + l) >> 15) > fstart               # [S,1] bool
        parity = fstart & 1
        for w in range(nwin):
            win[w] = jnp.where(crossed & (parity == (w // 8)), 0, win[w])
        return tuple(win)

    win = jax.lax.fori_loop(0, mb, body, tuple(win))
    win = list(win)

    # Final grid step per group: 1-pad the last byte (T.81 F.1.2.3) and
    # flush the remaining partial frame (+1 slack frame for pad spill).
    # The pad OR is value-level, so it is masked by is_last rather than
    # wrapped in pl.when — on earlier steps it must not touch the window.
    is_last = m_id == m_steps - 1
    total = off_ref[0, mb - 1] + len_ref[0, mb - 1]      # [S, 1]
    padb = (8 - (total & 7)) & 7
    b_in = total & 31
    padval = pltpu.bitcast(
        jnp.left_shift((jnp.left_shift(1, padb) - 1),
                       (32 - b_in - padb) & 31), jnp.uint32)
    p_pad = total >> 5
    contrib = jnp.where(lane == (p_pad & 127), padval, jnp.uint32(0))
    pwp = p_pad >> 7
    for w in range(nwin):
        win[w] = win[w] | jnp.where(
            is_last & ((pwp & (nwin - 1)) == w), contrib, 0)

    @pl.when(is_last)
    def _():
        for srow in range(s_rows):
            o_s = off_ref[0, mb - 1, srow, 0] + len_ref[0, mb - 1, srow, 0]
            fcur = o_s >> 15
            f_safe = jnp.minimum(fcur, frames - 1)
            seg = g_id * s_rows + srow

            @pl.when((fcur & 1) == 0)
            def _(srow=srow):
                stage_ref[...] = _stage(win, 0, srow)

            @pl.when((fcur & 1) == 1)
            def _(srow=srow):
                stage_ref[...] = _stage(win, 1, srow)

            cp = pltpu.make_async_copy(
                stage_ref, out_ref.at[seg * frames + f_safe], sem_out)
            cp.start()
            cp.wait()

            # slack frame: byte padding can spill past a frame boundary
            @pl.when(fcur + 1 < frames)
            def _(srow=srow, seg=seg, fcur=fcur):
                @pl.when((fcur & 1) == 1)
                def _():
                    stage_ref[...] = _stage(win, 0, srow)

                @pl.when((fcur & 1) == 0)
                def _():
                    stage_ref[...] = _stage(win, 1, srow)

                cp2 = pltpu.make_async_copy(
                    stage_ref, out_ref.at[seg * frames + fcur + 1], sem_out)
                cp2.start()
                cp2.wait()

    for c in range(nwin):
        win_ref[c] = win[c]


def seg_merge_v3(words: jax.Array, lens: jax.Array, n_seg: int, bps: int,
                 w_cap: int, blocks_per_mcu: int,
                 mcu_chunks: int | None = None,
                 block_mcus: int | None = None):
    """Per-block streams -> per-segment streams, offset-precomputed and
    sublane-vectorized (up to 8 segments advance per serial iteration).

    Returns (seg_words [n_seg, frames*1024] u32, seg_bits [n_seg] i32,
    max_mcu_bits scalar i32). Unlike v2, VMEM use is independent of
    segment length (MCU blocks stream through a grid dimension), so
    restart_interval=0 runs here too. Caller must escalate when
    max_mcu_bits exceeds mcu_capacity(...)[1] or any seg_bits exceeds the
    frame capacity."""
    g = blocks_per_mcu
    # Lazy: mcu_merge lives in entropy_oracles (module __getattr__ does not
    # cover global lookups inside function bodies, only attribute access).
    from jpegtpu.kernels.entropy_oracles import mcu_merge
    mwords, mlens = mcu_merge(words, lens, g, mcu_chunks)
    return seg_merge_mcu(mwords, mlens, n_seg, bps // g, w_cap,
                         block_mcus)


def seg_merge_mcu(mwords: jax.Array, mlens: jax.Array, n_seg: int,
                  mps: int, w_cap: int, block_mcus: int | None = None,
                  mcu_major: bool = False, s_rows: int | None = None):
    """seg_merge_v3's serial-window phase on pre-merged MCU streams
    ([nm, chunks*128] u32 + [nm] i32, e.g. from block_pack_mcu).

    mcu_major: mwords is [mps, n_seg_p * chunks*128] MCU-major
    (block_pack_mcu_pairs with mcu_major_segs; n_seg_p = n_seg rounded
    up to 8) — the kernel's own block order, so the input prep is a
    free lane-split reshape instead of a full-tensor transpose. mlens
    stays flat segment-major [nm] in both modes."""
    if mcu_major:
        assert s_rows in (None, 8), "mcu_major blocks are grouped by 8"
        s_rows = 8
        n_seg_p8 = -(-n_seg // 8) * 8
        chunks = mwords.shape[1] // n_seg_p8 // 128
        nm = mwords.shape[0] * n_seg
        assert mwords.shape == (mps, n_seg_p8 * chunks * 128)
    else:
        chunks = mwords.shape[1] // 128
        nm = mwords.shape[0]
    assert nm == n_seg * mps
    max_mcu_bits = jnp.max(mlens)

    # XLA precompute: per-MCU exclusive bit offsets + crossing bitmap.
    ml = mlens.reshape(n_seg, mps).astype(jnp.int32)
    csum = jnp.cumsum(ml, axis=1)
    off = csum - ml
    seg_bits = csum[:, -1]

    # s_rows segments advance together as sublane rows (>= 8: Mosaic's
    # native lane gather fails to lower for <8-sublane operands; the
    # crossing bitmap rides in two i32 words so 64 fits). Small/single
    # segment counts pad up (padded rows are zero-length no-ops). More
    # rows = fewer serial append iterations at constant vector work: the
    # TPU sweep (scripts/tpu_probe_srows.py, bit-identical) measured
    # 1.30 / 1.01 / 0.83 / 1.01 ms for 8/16/32/64 on the 4K rows-restart
    # geometry — the curve bottoms at 32 (at 64 the n_seg=135 -> 192
    # padding waste plus doubled per-iteration vector work beats the
    # halved iteration count; tested negative result, still selectable).
    if s_rows is None:
        s_rows = 32 if n_seg >= 32 else (16 if n_seg >= 16 else 8)
    assert s_rows in (8, 16, 32, 64)
    n_groups = -(-n_seg // s_rows)
    n_seg_p = n_groups * s_rows

    # MCU-block grid size: keep the input block around <=1 MB of VMEM
    # (block_mcus overrides for tests that force multi-step streaming).
    mb = block_mcus or max(
        8, min(mps, (1 << 20) // max(1, s_rows * chunks * 128 * 4)))
    if mcu_major and not block_mcus:
        # Mosaic wants the (mb, 1, S, CW) block's outer dim well-formed
        # and mb | mps skips a 50 MB zero-pad copy; mps % 8 == 0 is a
        # caller precondition, so the walk always terminates.
        mb = max(8, mb // 8 * 8)
        while mps % mb and mb > 8:
            mb -= 8
    mps_p = -(-mps // mb) * mb
    m_steps = mps_p // mb

    def _pad_seg_mcu(x, fill=0):
        """[n_seg, mps, ...] -> [n_seg_p, mps_p, ...]."""
        pad_s = n_seg_p - n_seg
        pad_m = mps_p - mps
        cfg = [(0, pad_s), (0, pad_m)] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, cfg) if (pad_s or pad_m) else x

    # Padded MCUs carry their segment's final offset (zero length, no-op
    # placement, stable `total` reads in the kernel's final flush).
    off_p = _pad_seg_mcu(off)
    if mps_p > mps:
        tail = jnp.broadcast_to(csum[:, -1:], (n_seg, mps_p - mps))
        off_p = off_p.at[:n_seg, mps:].set(tail)
    len_p = _pad_seg_mcu(ml)
    if mcu_major:
        # zero rows are REQUIRED for padded MCUs (their streams OR into
        # live window positions); padded-segment columns may hold
        # anything (their window rows are never flushed into kept rows)
        mw_m = jnp.pad(mwords, ((0, mps_p - mps), (0, 0)))
    else:
        mw_p = _pad_seg_mcu(mwords.reshape(n_seg, mps, chunks * 128))

    fstart = off_p >> 15
    crossed = ((off_p + len_p) >> 15) > fstart
    cr = crossed.reshape(n_groups, s_rows, mps_p).astype(jnp.int32)
    # Two 32-bit bitmap words per (group, MCU) so s_rows=64 fits; word 1
    # is all-zero below 33 rows.
    ridx = jnp.arange(s_rows, dtype=jnp.int32)[None, :, None]
    fmap0 = jnp.sum(jnp.where(ridx < 32, cr, 0) << (ridx & 31),
                    axis=1)                              # [G, mps_p]
    fmap1 = jnp.sum(jnp.where(ridx >= 32, cr, 0) << (ridx & 31),
                    axis=1)
    fmap = jnp.stack([fmap0, fmap1], axis=-1)            # [G, mps_p, 2]

    def _to_kernel(x, last):
        """[n_seg_p, mps_p, last] -> [G, mps_p, S, last]."""
        return x.reshape(n_groups, s_rows, mps_p, last).transpose(0, 2, 1, 3)

    off_k = _to_kernel(off_p[..., None], 1)
    len_k = _to_kernel(len_p[..., None], 1)
    map_k = fmap.reshape(n_groups, mps_p, 1, 2)
    if mcu_major:
        # [mps_p, n_seg_p*CW] -> [mps_p, G, S, CW] is a free lane-split
        # reshape; the BlockSpec addresses (mi, gi) blocks directly.
        mw_k = mw_m.reshape(mps_p, n_groups, s_rows, chunks * 128)
        mw_spec = pl.BlockSpec((mb, 1, s_rows, chunks * 128),
                               lambda gi, mi: (mi, gi, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        mw_k = _to_kernel(mw_p, chunks * 128)
        mw_spec = pl.BlockSpec((1, mb, s_rows, chunks * 128),
                               lambda gi, mi: (gi, mi, 0, 0),
                               memory_space=pltpu.VMEM)

    frames = -(-w_cap // 1024) + 1
    kernel = functools.partial(
        _seg_merge_v3_kernel, mb=mb, m_steps=m_steps, chunks=chunks,
        s_rows=s_rows, frames=frames, mcu_major=mcu_major)
    out = pl.pallas_call(
        kernel,
        grid=(n_groups, m_steps),
        in_specs=[
            mw_spec,
            pl.BlockSpec((1, mb, s_rows, 1), lambda gi, mi: (gi, mi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mb, s_rows, 1), lambda gi, mi: (gi, mi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mb, 1, 2), lambda gi, mi: (gi, mi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n_seg_p * frames, 8, 128),
                                       jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((16, s_rows, 128), jnp.uint32),
            pltpu.VMEM((8, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(mw_k, off_k, len_k, map_k)
    out = out.reshape(n_seg_p, frames * 1024)[:n_seg]
    return out, seg_bits, max_mcu_bits


def bit_join(seg_words: jax.Array, seg_bits: jax.Array, out_words: int,
             pad_final: bool = True):
    """Concatenate S bit-streams into ONE at bit granularity — pure
    vectorized XLA (masks + funnel shifts + word rolls), no kernel.

    seg_words [S, Wv] u32 big-endian bit-packed, seg_bits [S] -> (joined
    [out_words] u32, total_bits i32). Strips each stream's per-segment
    byte 1-padding (seg_merge pads every segment tail) via the
    bit-length masks and applies the T.81 F.1.2.3 final-byte 1-padding
    to the JOINED stream. Each masked stream occupies disjoint bit
    ranges after shifting, so plain ORs are exact. out_words must cover
    sum(bits)/32 plus 2 words of funnel spill (no roll wraparound).

    Purpose: restart_interval=0 produces ONE segment, which would leave
    7 of 8 seg_merge sublane rows idle (555 vs 1215 MPix/s at 4K); the
    encoder merges 8 VIRTUAL segments in parallel instead and bit-joins
    them here (~0.2 ms of HBM passes replacing ~8 ms of idle-row serial
    appends)."""
    s, wv = seg_words.shape
    sb = seg_bits.astype(jnp.int32)
    starts = jnp.cumsum(sb) - sb
    total = jnp.sum(sb)
    idx = jnp.arange(wv, dtype=jnp.int32)
    out = jnp.zeros(out_words, jnp.uint32)
    for k in range(s):
        nb = sb[k]
        nw = (nb + 31) >> 5
        r = (nb & 31).astype(jnp.uint32)
        head = jnp.where(r > 0,
                         ~jnp.right_shift(jnp.uint32(0xFFFFFFFF), r),
                         jnp.uint32(0xFFFFFFFF))
        m = jnp.where(idx < nw - 1, jnp.uint32(0xFFFFFFFF),
                      jnp.where(idx == nw - 1, head, jnp.uint32(0)))
        sk = seg_words[k] & jnp.where(nb > 0, m, jnp.uint32(0))
        # funnel-shift right by the start's bit phase (branch-free carry)
        t = (starts[k] & 31).astype(jnp.uint32)
        prev = jnp.concatenate([jnp.zeros(1, jnp.uint32), sk[:-1]])
        sh = jnp.right_shift(sk, t) | \
            jnp.left_shift(jnp.left_shift(prev, 1), (31 - t) & 31)
        spill = jnp.left_shift(jnp.left_shift(sk[-1:], 1), (31 - t) & 31)
        shp = jnp.concatenate(
            [sh, spill, jnp.zeros(out_words - wv - 1, jnp.uint32)])
        out = out | jnp.roll(shp, starts[k] >> 5)
    if pad_final:
        padb = ((8 - (total & 7)) & 7).astype(jnp.uint32)
        r = (total & 31).astype(jnp.uint32)
        padval = jnp.left_shift(jnp.left_shift(jnp.uint32(1), padb) - 1,
                                (32 - r - padb) & 31)
        oidx = jnp.arange(out_words, dtype=jnp.int32)
        out = out | jnp.where(oidx == (total >> 5), padval, jnp.uint32(0))
    # pad_final=False emits the RAW unaligned stream (the sharded
    # no-restart path joins shard streams at bit level on the host)
    return out, total


def _compact_kernel(bits_ref, frames_ref, out_ref, chunk_ref, flush_ref,
                    sem_in, sem_out, *, n_seg: int, f_per_seg: int):
    """Kernel D: concatenate trimmed segments into one contiguous stream.

    frames [n_seg, F, 8, 128] u32 (big-endian words from seg_merge) ->
    out [n_seg*F, 8, 128] u32 little-endian-swapped so the host reads raw
    stream bytes with zero post-processing. Segments are byte-aligned but
    not word-aligned, so chunks funnel-shift by (offset&3)*8 bits through
    the same register-window machinery as seg_merge_v2. Grid = 1; inner
    work is one 4KB DMA + ~20 vector ops per 4KB chunk.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    su16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    su8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    frame_bits = 1024 * 32

    def bswap(w):
        return (jnp.right_shift(w, 24) |
                (jnp.right_shift(w, 8) & jnp.uint32(0xFF00)) |
                (jnp.left_shift(w & jnp.uint32(0xFF00), 8)) |
                jnp.left_shift(w, 24))

    def place16(win, local_bits, rows8):
        """OR an [8,128] contribution into the [16,128] window at the
        window-local word offset (local_bits is a bit offset, 32-aligned
        after the funnel shift)."""
        m = (local_bits >> 5) & 127
        p0 = (local_bits >> 5) >> 7
        rolled = pltpu.roll(rows8, m, axis=1)
        prev = pltpu.roll(rolled, 1, axis=0)            # row k-1, rolled
        hi = jnp.where(lane >= m, rolled, 0)
        lo = jnp.where(lane < m, prev, 0)
        lo0 = jnp.where(lane < m, rolled, 0)            # for row p0+8
        contrib = jnp.zeros((16, 128), jnp.uint32)
        for k in range(9):
            if k == 0:
                rk = hi[0:1]
            elif k < 8:
                rk = hi[k:k + 1] | lo[k:k + 1]
            else:
                rk = lo0[7:8]
            contrib = contrib | jnp.where(su16 == p0 + k, rk, 0)
        return win | contrib

    def flush(f_out, win):
        flush_ref[...] = bswap(win[0:8, :])
        f_safe = jnp.minimum(f_out, n_seg * f_per_seg - 1)
        cp = pltpu.make_async_copy(flush_ref, out_ref.at[f_safe], sem_out)
        cp.start()
        cp.wait()

    def seg_body(s, state):
        local_bits, f_out, win, carry = state
        nbits = ((bits_ref[0, s] + 7) >> 3) << 3
        # clamp for budget-overflow runs (host escalates afterwards)
        nbits = jnp.minimum(nbits, f_per_seg * frame_bits)
        nchunks = (nbits + frame_bits - 1) // frame_bits

        def chunk_body(i, st):
            local_bits, f_out, win, carry = st
            cp = pltpu.make_async_copy(frames_ref.at[s, i], chunk_ref,
                                       sem_in)
            cp.start()
            cp.wait()
            ch = chunk_ref[...]                          # [8, 128]
            r = (local_bits & 31).astype(jnp.uint32)
            rolled_l = pltpu.roll(ch, 1, axis=1)
            rolled_lr = pltpu.roll(rolled_l, 1, axis=0)
            prev_w = jnp.where(lane == 0, rolled_lr, rolled_l)
            # carry is a [1,128] row with the previous chunk's last word at
            # lane 0 (sublane-only broadcast; 2D broadcasts are unsupported)
            prev_w = jnp.where((lane == 0) & (su8 == 0), carry, prev_w)
            sh = jnp.right_shift(ch, r)
            # branch-free funnel carry: (x<<1)<<((31-r)&31) == x<<(32-r)
            # for r>=1 and 0 for r==0 (where(r>0,...) lowers ~10x slower)
            sh = sh | jnp.left_shift(jnp.left_shift(prev_w, 1),
                                     (31 - r) & 31)
            win = place16(win, local_bits, sh)
            carry = pltpu.roll(ch[7:8, :], 1, axis=1)
            adv = jnp.minimum(frame_bits, nbits - i * frame_bits)
            new_bits = local_bits + adv
            crossed = new_bits >= frame_bits

            @pl.when(crossed)
            def _():
                flush(f_out, win)

            win = jnp.where(
                crossed,
                jnp.concatenate(
                    [win[8:16, :], jnp.zeros((8, 128), jnp.uint32)]),
                win)
            local_bits = jnp.where(crossed, new_bits - frame_bits, new_bits)
            f_out = f_out + crossed.astype(jnp.int32)
            return local_bits, f_out, win, carry

        # reset the inter-chunk carry at each segment start
        carry = jnp.zeros((1, 128), jnp.uint32)
        return jax.lax.fori_loop(
            0, nchunks, chunk_body, (local_bits, f_out, win, carry))

    zero_win = jnp.zeros((16, 128), jnp.uint32)
    zero_carry = jnp.zeros((1, 128), jnp.uint32)
    local_bits, f_out, win, _ = jax.lax.fori_loop(
        0, n_seg, seg_body,
        (jnp.int32(0), jnp.int32(0), zero_win, zero_carry))

    flush(f_out, win)
    total_frames = n_seg * f_per_seg

    @pl.when(f_out + 1 < total_frames)
    def _():
        flush_ref[...] = bswap(win[8:16, :])
        cp = pltpu.make_async_copy(flush_ref, out_ref.at[f_out + 1],
                                   sem_out)
        cp.start()
        cp.wait()


def compact_segments(seg_words: jax.Array, seg_bits: jax.Array,
                     frames_per_seg: int) -> jax.Array:
    """[n_seg, F*1024] u32 + [n_seg] bits -> flat [n_seg*F*1024] u32 stream
    of concatenated trimmed segments (byte-swapped: raw bytes in order).
    Host fetches exactly sum(ceil(bits/8)) bytes of it."""
    n_seg = seg_words.shape[0]
    f = frames_per_seg
    kernel = functools.partial(_compact_kernel, n_seg=n_seg, f_per_seg=f)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n_seg * f, 8, 128), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.uint32),
            pltpu.VMEM((8, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(seg_bits.astype(jnp.int32).reshape(1, n_seg),
      seg_words.reshape(n_seg, f, 8, 128))
    return out.reshape(-1)


def _stuff_precompute(seg_words: jax.Array, seg_bits: jax.Array,
                      frames_per_seg: int, mnum: np.ndarray):
    """XLA side of the device-stuffing pass: every output byte offset is
    computable from the merged segment words alone (FF counts per 4 KB
    chunk + 2-byte RST markers between segments), so the Pallas kernel
    carries no data-dependent reductions — it just reads scalars.
    mnum[s] is the RST marker's second byte after segment s (0 = none)."""
    n_seg = seg_words.shape[0]
    f = frames_per_seg
    fr = seg_words.reshape(n_seg, f, 8, 128)
    nbytes = ((seg_bits.astype(jnp.int32) + 7) >> 3)           # [n_seg]
    widx = jnp.arange(f * 1024, dtype=jnp.int32).reshape(1, f, 8, 128)
    # 0xFF count per word, word-parallel: zero the invalid byte tail
    # (big-endian: byte 0 is the MSB), nibble-fold each byte's AND-reduce,
    # then a multiply-based horizontal byte sum — one fused pass over the
    # words instead of four per-byte passes.
    r = jnp.clip(nbytes[:, None, None, None] - widx * 4, 0, 4)
    keep = jnp.where(
        r >= 4, jnp.uint32(0xFFFFFFFF),
        ~jnp.right_shift(jnp.uint32(0xFFFFFFFF),
                         ((r * 8) & 31).astype(jnp.uint32)))
    keep = jnp.where(r > 0, keep, jnp.uint32(0))
    w = fr & keep
    x1 = w & jnp.right_shift(w, 4) & jnp.uint32(0x0F0F0F0F)
    x2 = x1 & jnp.right_shift(x1, 2) & jnp.uint32(0x03030303)
    x3 = x2 & jnp.right_shift(x2, 1) & jnp.uint32(0x01010101)
    cnt = jnp.right_shift(x3 * jnp.uint32(0x01010101), 24)
    ffc = jnp.sum(cnt.astype(jnp.int32), axis=(2, 3))
    in_chunk = jnp.clip(nbytes[:, None] - jnp.arange(f)[None, :] * 4096,
                        0, 4096).astype(jnp.int32)
    out_chunk = in_chunk + ffc                                  # stuffed len
    marker = 2 * (jnp.asarray(mnum) > 0)
    seg_len = jnp.sum(out_chunk, axis=1) + marker
    seg_start = jnp.cumsum(seg_len) - seg_len
    chunk_off = (seg_start[:, None] +
                 jnp.cumsum(out_chunk, axis=1) - out_chunk)
    seg_end = seg_start + jnp.sum(out_chunk, axis=1)            # marker pos
    total = seg_start[-1] + seg_len[-1]
    nchunks = -(-nbytes // 4096)
    return chunk_off, out_chunk, in_chunk, seg_end, nchunks, seg_start, total


# Timing-attribution hook (scripts/tpu_probe_compact_attr.py): trace-time
# Python branch only — production traces with None and carries no cost.
# "norank" skips the rank/val gathers, "noplace" the window placement,
# "noexp" the byte-expansion math; outputs are garbage in those modes.
_COMPACT_ATTR_MODE = None

# Conditional third output plane (lax.cond on the row-max expanded
# target). TESTED NEGATIVE RESULT (2026-08-19, scripts/tpu_ab_compact_p2
# on the real chip): byte-identical in-context, but ZERO speedup —
# 6.20 vs 6.16 ms/frame over 3 interleaved reps; the t_max reduction +
# cond overhead (or Mosaic executing both branches) cancels the skipped
# third of the vector work. Default stays the simpler unconditional
# 3-plane path; the flag remains for re-measurement on future
# toolchains. Env override: JPEGTPU_COMPACT_P2=1 enables the skip.
_COMPACT_SKIP_P2 = os.environ.get("JPEGTPU_COMPACT_P2", "0") != "0"


def _compact_stuff_kernel(off_ref, slen_ref, innb_ref, send_ref, nch_ref,
                          mnum_ref, frames_ref, out_ref, chunk_ref,
                          flush_ref, sem_in, sem_out,
                          *, n_seg: int, f_per_seg: int, out_frames: int):
    """Kernel D': trim + 0xFF00 byte-stuff + RST splice in one pass.

    The device output IS the final entropy scan — the host does one
    memcpy and concatenates headers (no C++ stuffing on the hot path;
    the reference never had a scan at all, SURVEY §2.10/§2.11).

    Serial walk over 4 KB chunks, like _compact_kernel, but each chunk is
    byte-expanded in registers before placement: per-word FF flags give
    intra-word expanded positions; a log-step scan gives per-word output
    byte offsets; per-row monotone-target placement (rank search +
    prefix-sum differences, as _place_pair) materializes three 128-word
    output planes per sublane row; planes land in a [32, 128] modular
    register window (4 output frames) via rotate + two-row masked OR.
    All cursor positions come from XLA-precomputed scalars (_stuff_
    precompute). Stuffed 0x00s materialize from the zero window.
    """
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    su8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    su32 = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
    gw = su8 * 128 + lane8                         # word index in chunk

    def bswap(w):
        return (jnp.right_shift(w, 24) |
                (jnp.right_shift(w, 8) & jnp.uint32(0xFF00)) |
                (jnp.left_shift(w & jnp.uint32(0xFF00), 8)) |
                jnp.left_shift(w, 24))

    def place_rows(win, planes8, t_vec):
        """OR row r of planes8 [8,128] into the modular window at absolute
        out word t_vec[r] ([8,1]): one batched per-row lane rotation
        (Mosaic's native gather needs >=8 sublanes — [1,128] gathers fail
        to lower), then per-row two-window-row masked ORs."""
        m = t_vec & 127
        idx = (lane8 - m) & 127
        rot = pltpu.bitcast(
            jnp.take_along_axis(pltpu.bitcast(planes8, jnp.int32), idx,
                                axis=1), jnp.uint32)
        hi = jnp.where(lane8 >= m, rot, 0)
        lo = jnp.where(lane8 < m, rot, 0)
        wr = (t_vec >> 7) & 31                      # [8,1]
        for r in range(8):
            win = win | jnp.where(su32 == wr[r:r + 1], hi[r:r + 1, :], 0)
            win = win | jnp.where(su32 == ((wr[r:r + 1] + 1) & 31),
                                  lo[r:r + 1, :], 0)
        return win

    def _out_copy(fi):
        return pltpu.make_async_copy(
            flush_ref.at[fi & 1],
            out_ref.at[jnp.minimum(fi, out_frames - 1)],
            sem_out.at[fi & 1])

    def flush_frame(win, fi):
        """Stage frame fi's 8 window rows (static parity slices) into
        flush slot fi&1 and start the DMA. Output DMAs are double-
        buffered: frames flush in strictly increasing fi, each exactly
        once, so the slot's previous DMA is always frame fi-2 — wait on
        it before restaging. The kernel tail drains the last two."""
        @pl.when(fi >= 2)
        def _():
            _out_copy(fi - 2).wait()
        for par in range(4):
            @pl.when((fi & 3) == par)
            def _(par=par):
                flush_ref[par & 1] = bswap(win[par * 8:(par + 1) * 8, :])
        _out_copy(fi).start()

    def flush_and_zero(win, cur, end):
        """DMA out every frame completed in [cur, end); zero its rows.
        Flushed rows are disjoint from each other and untouched by the
        zeroing of other frames, so all flushes read the pre-loop window."""
        win0 = win
        f0 = cur >> 12
        f1 = end >> 12
        for t in range(3):                          # chunk expands < 3 frames
            fi = f0 + t

            @pl.when(fi < f1)
            def _(fi=fi):
                flush_frame(win0, fi)
            zmask = (fi < f1) & ((su32 >> 3) == (fi & 3))
            win = jnp.where(zmask, 0, win)
        return win

    def _in_copy(s, i, slot):
        return pltpu.make_async_copy(frames_ref.at[s, i],
                                     chunk_ref.at[slot], sem_in.at[slot])

    def chunk_body(i, state):
        s, win, nch = state
        # double-buffered input: wait chunk i (started by the previous
        # iteration / segment prologue), prefetch chunk i+1
        slot = i & 1
        _in_copy(s, i, slot).wait()

        @pl.when(i + 1 < nch)
        def _():
            _in_copy(s, i + 1, 1 - slot).start()
        ch = chunk_ref[slot]                        # [8,128] u32 BE
        cur = off_ref[0, s * f_per_seg + i, 0]
        rem = innb_ref[0, s * f_per_seg + i, 0]
        slen = slen_ref[0, s * f_per_seg + i, 0]

        b = [jnp.right_shift(ch, sh) & 0xFF for sh in (24, 16, 8, 0)]
        valid = [((4 * gw + k) < rem) for k in range(4)]
        f = [(b[k] == 0xFF) & valid[k] for k in range(4)]
        e = [jnp.where(valid[k], 1 + f[k].astype(jnp.int32), 0)
             for k in range(4)]
        p1 = e[0]
        p2 = p1 + e[1]
        p3 = p2 + e[2]
        wexp = p3 + e[3]

        def at_pos(bk, vk, pk):
            lo_sh = ((3 - pk) & 3) * 8
            hi_sh = ((7 - pk) & 3) * 8
            v0c = jnp.where(vk & (pk <= 3),
                            jnp.left_shift(bk, lo_sh.astype(jnp.uint32)), 0)
            v1c = jnp.where(vk & (pk >= 4),
                            jnp.left_shift(bk, hi_sh.astype(jnp.uint32)), 0)
            return v0c, v1c

        v0 = jnp.where(valid[0], jnp.left_shift(b[0], 24), jnp.uint32(0))
        v1 = jnp.zeros((8, 128), jnp.uint32)
        for k, pk in ((1, p1), (2, p2), (3, p3)):
            c0, c1 = at_pos(b[k], valid[k], pk)
            v0 = v0 | c0
            v1 = v1 | c1

        incl = _cumlog(wexp, jnp.add, 0, axis=1)
        row_tot = incl[:, 127:128]
        rincl = _cumlog(row_tot, jnp.add, 0, axis=0)
        row_base = rincl - row_tot
        o_glob = cur + row_base + incl - wexp        # [8,128] out byte
        phi = ((o_glob & 3) * 8).astype(jnp.uint32)
        t_abs = o_glob >> 2
        w0 = jnp.right_shift(v0, phi)
        w1 = (jnp.left_shift(jnp.left_shift(v0, 1), (31 - phi) & 31) |
              jnp.right_shift(v1, phi))
        w2 = jnp.left_shift(jnp.left_shift(v1, 1), (31 - phi) & 31)
        t_base = (cur + row_base) >> 2               # [8,1]
        t_rel = t_abs - t_base                       # in [0, 258]
        # Invalid (past-rem) words would tie the final partial word's
        # target (strict monotonicity only holds for full words); push
        # them past every real target so ranks resolve to real sources.
        t_rel = jnp.where(wexp > 0, t_rel, jnp.int32(1 << 14))

        def rank_at(q):
            """#lanes i with t_rel[i] <= q, per row (q [8,128])."""
            pos = jnp.zeros((8, 128), jnp.int32)
            for step in (128, 64, 32, 16, 8, 4, 2, 1):
                cand = pos + step
                probe = jnp.take_along_axis(
                    t_rel, jnp.minimum(cand, 128) - 1, axis=1)
                pos = jnp.where((cand <= 128) & (probe <= q), cand, pos)
            return pos

        def val_at(vals, j, eq_q):
            """vals[j] where t_rel[j] == eq_q, else 0 (j clamped; pure
            gather — valid words' targets are strictly increasing, so at
            most one source word maps to any output word)."""
            jc = jnp.maximum(j, 0)
            t = jnp.take_along_axis(t_rel, jc, axis=1)
            v = pltpu.bitcast(
                jnp.take_along_axis(pltpu.bitcast(vals, jnp.int32), jc,
                                    axis=1), jnp.uint32)
            return jnp.where((j >= 0) & (t == eq_q), v, 0)

        if _COMPACT_ATTR_MODE == "noexp":
            # timing attribution only: raw chunk words as planes, fake
            # monotone targets — dead-codes the whole expansion chain
            w0, w1, w2 = ch, ch, ch
            t_rel = gw
            t_base = (cur >> 2) + su8 * 16
        # Output word w takes w0 from the word targeting w, w1 from the
        # word targeting w-1, w2 from w-2. Targets of valid words are
        # strictly increasing (every full word expands to >= 1 output
        # word), so each is a unique gather — no prefix sums needed.
        # Plane-edge lanes take the previous plane's tail ranks.
        def build_plane(p, prev_r):
            q = lane8 + 128 * p
            r0 = rank_at(q)
            r1 = jnp.where(lane8 == 0, prev_r[0],
                           pltpu.roll(r0, 1, axis=1))
            r2 = jnp.where(lane8 == 0, prev_r[1],
                           jnp.where(lane8 == 1, prev_r[0],
                                     pltpu.roll(r0, 2, axis=1)))
            outp = (val_at(w0, r0 - 1, q) |
                    val_at(w1, r1 - 1, q - 1) |
                    val_at(w2, r2 - 1, q - 2))
            tail = [
                jnp.take_along_axis(r0, jnp.full_like(lane8, 127 - k),
                                    axis=1)[:, 0:1]
                for k in range(2)]
            return outp, tail

        if _COMPACT_ATTR_MODE is None and _COMPACT_SKIP_P2:
            # Planes 0 and 1 always exist (any in-row misalignment spills
            # past word 128); plane 2 (q in [256, 384)) receives data only
            # when some row's expanded stream reaches output word 254
            # (w2 of a source targeting 254 lands at q=256) — which needs
            # ~500 stuffed bytes in a 512-byte row. Skip its rank search,
            # gathers and window placement for every other chunk: a third
            # of the kernel's vector work on real content.
            prev_r = [jnp.zeros((8, 1), jnp.int32)] * 2  # ranks 128p-1,-2
            for p in range(2):
                outp, prev_r = build_plane(p, prev_r)
                win = place_rows(win, outp, t_base + 128 * p)
            t_max = jnp.max(jnp.where(wexp > 0, t_rel, 0))

            def with_p2(w):
                outp, _ = build_plane(2, prev_r)
                return place_rows(w, outp, t_base + 256)

            win = jax.lax.cond(t_max >= 254, with_p2, lambda w: w, win)
        else:
            # timing-attribution modes keep the unconditional 3-plane path
            if _COMPACT_ATTR_MODE == "norank":
                out_planes = [w0, w1, w2]
            else:
                out_planes = []
                prev_r = [jnp.zeros((8, 1), jnp.int32)] * 2
                for p in range(3):
                    outp, prev_r = build_plane(p, prev_r)
                    out_planes.append(outp)
            if _COMPACT_ATTR_MODE == "noplace":
                for p in range(3):
                    win = win | jnp.pad(out_planes[p], ((0, 24), (0, 0)))
            else:
                for p in range(3):
                    win = place_rows(win, out_planes[p], t_base + 128 * p)

        win = flush_and_zero(win, cur, cur + slen)
        return s, win, nch

    def seg_body(s, win):
        nch = nch_ref[0, s, 0]

        @pl.when(nch > 0)
        def _():
            _in_copy(s, 0, 0).start()
        _, win, _ = jax.lax.fori_loop(0, nch, chunk_body, (s, win, nch))
        # RSTn marker (T.81 B.2.1.2); mnum holds the precomputed second
        # byte (0xD0+n within the owning image) or 0 for no marker.
        # Value-level placement masked by mnum so it stays fori-friendly.
        send = send_ref[0, s, 0]
        mnum = mnum_ref[0, s, 0]
        mk = jnp.where(mnum > 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        m32 = (jnp.uint32(0xFF000000) |
               jnp.left_shift(mnum.astype(jnp.uint32), 16)) & mk
        phi = ((send & 3) * 8).astype(jnp.uint32)
        w0 = jnp.right_shift(m32, phi)
        w1 = jnp.left_shift(jnp.left_shift(m32, 1), (31 - phi) & 31)
        # The marker is two scalar words at send>>2 and send>>2 + 1:
        # OR them straight into the modular window (2 masked selects on
        # [32,128]) instead of a full place_rows pass (~17 vector ops).
        lane32 = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1)
        for val, t in ((w0, send >> 2), (w1, (send >> 2) + 1)):
            win = win | jnp.where((su32 == ((t >> 7) & 31)) &
                                  (lane32 == (t & 127)), val, 0)
        win = flush_and_zero(win, send,
                             send + jnp.where(mnum > 0, 2, 0))
        return win

    zero_win = jnp.zeros((32, 128), jnp.uint32)
    win = jax.lax.fori_loop(0, n_seg, seg_body, zero_win)

    # Final partial frame: total scan bytes = seg_end of the last segment
    # PLUS its trailing RST marker, if any (sharded row shards keep a
    # marker after their final segment). When that end is frame-aligned,
    # seg_body's flush_and_zero already emitted the frame and zeroed its
    # window rows — a duplicate flush_frame here would DMA zeros over the
    # completed frame and reuse its flush slot, breaking the exactly-once
    # double-buffer protocol. Flush only a genuine partial frame, then
    # drain the (up to two) in-flight output DMAs.
    total = (send_ref[0, n_seg - 1, 0] +
             jnp.where(mnum_ref[0, n_seg - 1, 0] > 0, 2, 0))
    last = total >> 12
    partial = (total & 4095) > 0
    top = jnp.where(partial, last, last - 1)   # highest frame flushed

    @pl.when(partial)
    def _():
        flush_frame(win, last)

    @pl.when(top >= 1)
    def _():
        _out_copy(top - 1).wait()

    @pl.when(top >= 0)
    def _():
        _out_copy(top).wait()


def _compact_stuff_kernel_kb(off_ref, slen_ref, innb_ref, send_ref,
                             nch_ref, mnum_ref, frames_ref, out_ref,
                             chunk_ref, flush_ref, sem_in, sem_out,
                             *, n_seg: int, f_per_seg: int, f_pad: int,
                             out_frames: int, kb: int):
    """_compact_stuff_kernel processing kb input chunks per serial
    iteration.

    Motivation (scripts/tpu_probe_compact_attr.py, 2026-08-19 on HW):
    stubbing out each stage of the single-chunk kernel recovers only
    0.47 + 0.14 + 0.04 ms of its 1.87 ms, and the gutted scaffold costs
    62 ns/chunk — the loop is LATENCY-bound on the serial dependency
    chain through the register window, not throughput-bound. Stacking
    kb chunks on the sublane axis ([kb*8, 128]) gives the scheduler kb
    independent expansion/rank chains per iteration (same trick as
    seg_merge_mcu's s_rows: 8->32 rows took 1.31->0.80 ms at constant
    vector work).

    Differences from the single-chunk kernel:
      * window is 8 frames ([64, 128]; 16 for kb > 3, whose doubled
        placement-select cost made kb=4/6 LOSE on hardware — kb=3 is
        the measured optimum) so one iteration's combined span
        (<= kb*8 KB expanded) plus the in-progress frame never wraps
        onto an unflushed frame;
      * per-chunk cursor scalars come from arrays padded to f_pad
        (= ceil-multiple of kb) per segment: padded chunks carry
        in/out length 0 and cursor = segment data end, making them
        exact no-ops in every stage (their DMA index is clamped);
      * the row prefix-sum is group-masked so chunk boundaries on the
        sublane axis do not accumulate across chunks;
      * flushing happens once per iteration over the combined span
        (placement order within an iteration is irrelevant: the window
        is OR-accumulated and spans never alias within 8 frames).
    Output bytes are identical to the single-chunk kernel by
    construction; tests assert it on adversarial vectors and fuzz.
    """
    wf = 8 if kb <= 3 else 16                 # window frames (modular)
    wr_n = wf * 8                             # window rows
    k8 = kb * 8
    lane = jax.lax.broadcasted_iota(jnp.int32, (k8, 128), 1)
    suk = jax.lax.broadcasted_iota(jnp.int32, (k8, 1), 0)
    suw = jax.lax.broadcasted_iota(jnp.int32, (wr_n, 1), 0)
    lanew = jax.lax.broadcasted_iota(jnp.int32, (wr_n, 128), 1)
    gw = (suk & 7) * 128 + lane               # word index within chunk

    def bswap(w):
        return (jnp.right_shift(w, 24) |
                (jnp.right_shift(w, 8) & jnp.uint32(0xFF00)) |
                (jnp.left_shift(w & jnp.uint32(0xFF00), 8)) |
                jnp.left_shift(w, 24))

    def place_rows(win, planes, t_vec):
        """OR row r of planes [k8,128] into the modular window at
        absolute out word t_vec[r] ([k8,1])."""
        m = t_vec & 127
        idx = (lane - m) & 127
        rot = pltpu.bitcast(
            jnp.take_along_axis(pltpu.bitcast(planes, jnp.int32), idx,
                                axis=1), jnp.uint32)
        hi = jnp.where(lane >= m, rot, 0)
        lo = jnp.where(lane < m, rot, 0)
        wr = (t_vec >> 7) & (wr_n - 1)
        for r in range(k8):
            win = win | jnp.where(suw == wr[r:r + 1], hi[r:r + 1, :], 0)
            win = win | jnp.where(suw == ((wr[r:r + 1] + 1) & (wr_n - 1)),
                                  lo[r:r + 1, :], 0)
        return win

    def _out_copy(fi):
        return pltpu.make_async_copy(
            flush_ref.at[fi & 1],
            out_ref.at[jnp.minimum(fi, out_frames - 1)],
            sem_out.at[fi & 1])

    def flush_frame(win, fi):
        """Stage frame fi's 8 window rows into flush slot fi&1 and start
        the DMA (see the single-chunk kernel's protocol notes)."""
        @pl.when(fi >= 2)
        def _():
            _out_copy(fi - 2).wait()
        for par in range(wf):
            @pl.when((fi & (wf - 1)) == par)
            def _(par=par):
                flush_ref[par & 1] = bswap(win[par * 8:(par + 1) * 8, :])
        _out_copy(fi).start()

    def flush_and_zero(win, cur, end):
        """DMA out every frame completed in [cur, end); zero its rows."""
        win0 = win
        f0 = cur >> 12
        f1 = end >> 12
        for t in range(2 * kb + 1):           # kb chunks expand < 2kb+1 fr
            fi = f0 + t

            @pl.when(fi < f1)
            def _(fi=fi):
                flush_frame(win0, fi)
            zmask = (fi < f1) & ((suw >> 3) == (fi & (wf - 1)))
            win = jnp.where(zmask, 0, win)
        return win

    def _in_copy(s, j, slot, k):
        idx = jnp.minimum(j * kb + k, f_per_seg - 1)   # clamped: padded
        return pltpu.make_async_copy(frames_ref.at[s, idx],
                                     chunk_ref.at[slot, k],
                                     sem_in.at[slot, k])

    def group_body(j, state):
        s, win, nj = state
        slot = j & 1
        for k in range(kb):
            _in_copy(s, j, slot, k).wait()

        @pl.when(j + 1 < nj)
        def _():
            for k in range(kb):
                _in_copy(s, j + 1, 1 - slot, k).start()
        ch = chunk_ref[slot].reshape(k8, 128)

        base = s * f_pad + j * kb
        curs = [off_ref[0, base + k, 0] for k in range(kb)]
        rems = [innb_ref[0, base + k, 0] for k in range(kb)]
        slens = [slen_ref[0, base + k, 0] for k in range(kb)]

        def vec(vals):
            cid = suk >> 3
            acc = jnp.full((k8, 1), vals[0], jnp.int32)
            for k in range(1, kb):
                acc = jnp.where(cid == k, vals[k], acc)
            return acc

        cur_v = vec(curs)
        rem_v = vec(rems)

        b = [jnp.right_shift(ch, sh) & 0xFF for sh in (24, 16, 8, 0)]
        valid = [((4 * gw + k) < rem_v) for k in range(4)]
        f = [(b[k] == 0xFF) & valid[k] for k in range(4)]
        e = [jnp.where(valid[k], 1 + f[k].astype(jnp.int32), 0)
             for k in range(4)]
        p1 = e[0]
        p2 = p1 + e[1]
        p3 = p2 + e[2]
        wexp = p3 + e[3]

        def at_pos(bk, vk, pk):
            lo_sh = ((3 - pk) & 3) * 8
            hi_sh = ((7 - pk) & 3) * 8
            v0c = jnp.where(vk & (pk <= 3),
                            jnp.left_shift(bk, lo_sh.astype(jnp.uint32)), 0)
            v1c = jnp.where(vk & (pk >= 4),
                            jnp.left_shift(bk, hi_sh.astype(jnp.uint32)), 0)
            return v0c, v1c

        v0 = jnp.where(valid[0], jnp.left_shift(b[0], 24), jnp.uint32(0))
        v1 = jnp.zeros((k8, 128), jnp.uint32)
        for k, pk in ((1, p1), (2, p2), (3, p3)):
            c0, c1 = at_pos(b[k], valid[k], pk)
            v0 = v0 | c0
            v1 = v1 | c1

        incl = _cumlog(wexp, jnp.add, 0, axis=1)
        row_tot = incl[:, 127:128]
        # Group-masked sublane prefix sum: rows of different chunks must
        # not accumulate into each other (masks from the suk iota —
        # pallas forbids captured array constants).
        x = row_tot
        step = 1
        while step < 8:
            ok = (suk >= step) & ((suk >> 3) == ((suk - step) >> 3))
            x = x + jnp.where(ok, pltpu.roll(x, step, axis=0), 0)
            step *= 2
        row_base = x - row_tot
        o_glob = cur_v + row_base + incl - wexp      # [k8,128] out byte
        phi = ((o_glob & 3) * 8).astype(jnp.uint32)
        t_abs = o_glob >> 2
        w0 = jnp.right_shift(v0, phi)
        w1 = (jnp.left_shift(jnp.left_shift(v0, 1), (31 - phi) & 31) |
              jnp.right_shift(v1, phi))
        w2 = jnp.left_shift(jnp.left_shift(v1, 1), (31 - phi) & 31)
        t_base = (cur_v + row_base) >> 2             # [k8,1]
        t_rel = t_abs - t_base                       # in [0, 258]
        t_rel = jnp.where(wexp > 0, t_rel, jnp.int32(1 << 14))

        def rank_at(q):
            pos = jnp.zeros((k8, 128), jnp.int32)
            for step in (128, 64, 32, 16, 8, 4, 2, 1):
                cand = pos + step
                probe = jnp.take_along_axis(
                    t_rel, jnp.minimum(cand, 128) - 1, axis=1)
                pos = jnp.where((cand <= 128) & (probe <= q), cand, pos)
            return pos

        def val_at(vals, jj, eq_q):
            jc = jnp.maximum(jj, 0)
            t = jnp.take_along_axis(t_rel, jc, axis=1)
            v = pltpu.bitcast(
                jnp.take_along_axis(pltpu.bitcast(vals, jnp.int32), jc,
                                    axis=1), jnp.uint32)
            return jnp.where((jj >= 0) & (t == eq_q), v, 0)

        def build_plane(p, prev_r):
            q = lane + 128 * p
            r0 = rank_at(q)
            r1 = jnp.where(lane == 0, prev_r[0],
                           pltpu.roll(r0, 1, axis=1))
            r2 = jnp.where(lane == 0, prev_r[1],
                           jnp.where(lane == 1, prev_r[0],
                                     pltpu.roll(r0, 2, axis=1)))
            outp = (val_at(w0, r0 - 1, q) |
                    val_at(w1, r1 - 1, q - 1) |
                    val_at(w2, r2 - 1, q - 2))
            tail = [
                jnp.take_along_axis(r0, jnp.full_like(lane, 127 - k),
                                    axis=1)[:, 0:1]
                for k in range(2)]
            return outp, tail

        prev_r = [jnp.zeros((k8, 1), jnp.int32)] * 2
        for p in range(3):
            outp, prev_r = build_plane(p, prev_r)
            win = place_rows(win, outp, t_base + 128 * p)

        win = flush_and_zero(win, curs[0], curs[kb - 1] + slens[kb - 1])
        return s, win, nj

    def seg_body(s, win):
        nch = nch_ref[0, s, 0]
        nj = (nch + kb - 1) // kb

        @pl.when(nj > 0)
        def _():
            for k in range(kb):
                _in_copy(s, 0, 0, k).start()
        _, win, _ = jax.lax.fori_loop(0, nj, group_body, (s, win, nj))
        send = send_ref[0, s, 0]
        mnum = mnum_ref[0, s, 0]
        mk = jnp.where(mnum > 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        m32 = (jnp.uint32(0xFF000000) |
               jnp.left_shift(mnum.astype(jnp.uint32), 16)) & mk
        phi = ((send & 3) * 8).astype(jnp.uint32)
        w0 = jnp.right_shift(m32, phi)
        w1 = jnp.left_shift(jnp.left_shift(m32, 1), (31 - phi) & 31)
        for val, t in ((w0, send >> 2), (w1, (send >> 2) + 1)):
            win = win | jnp.where((suw == ((t >> 7) & (wr_n - 1))) &
                                  (lanew == (t & 127)), val, 0)
        win = flush_and_zero(win, send,
                             send + jnp.where(mnum > 0, 2, 0))
        return win

    zero_win = jnp.zeros((wr_n, 128), jnp.uint32)
    win = jax.lax.fori_loop(0, n_seg, seg_body, zero_win)

    # Final partial frame + drain (see the single-chunk kernel).
    total = (send_ref[0, n_seg - 1, 0] +
             jnp.where(mnum_ref[0, n_seg - 1, 0] > 0, 2, 0))
    last = total >> 12
    partial = (total & 4095) > 0
    top = jnp.where(partial, last, last - 1)

    @pl.when(partial)
    def _():
        flush_frame(win, last)

    @pl.when(top >= 1)
    def _():
        _out_copy(top - 1).wait()

    @pl.when(top >= 0)
    def _():
        _out_copy(top).wait()


# Chunks per serial iteration in the device stuffing kernel: 1 = the
# round-2 single-chunk kernel; 2/3 = the batched kernel (latency hiding
# via kb independent expansion chains per iteration). HW A/B 2026-08-19
# (scripts/tpu_ab_compact_kb.py, full 4K program, interleaved): kb=1
# 6.24 ms, kb=2 5.92, kb=3 5.71 — confirming the attribution probe's
# latency-bound diagnosis. kb=4/6 require a 16-frame window whose
# placement-select cost dominates (7.9 / 6.9 ms) — tested negative
# results. Env override: JPEGTPU_COMPACT_KB.
_COMPACT_KB = int(os.environ.get("JPEGTPU_COMPACT_KB", "3"))

# Rotate-once + masked-chunk-select MCU merge in block_pack_mcu (vs the
# per-chunk-gather form). TESTED NEGATIVE RESULT (2026-08-19,
# scripts/tpu_ab_bp_merge.py on HW): byte-identical, zero speedup
# (5.72-5.78 vs 5.66-5.76 ms interleaved) — trading 2 gathers for
# ~5 selects per block is cost-neutral; block_pack is not simply
# gather-count-bound. Default stays the long-validated gather form.
# Env override: JPEGTPU_BP_MERGE_ROT=1.
_BP_MERGE_ROT = os.environ.get("JPEGTPU_BP_MERGE_ROT", "0") != "0"


def compact_segments_stuffed(seg_words: jax.Array, seg_bits: jax.Array,
                             frames_per_seg: int, restart: int,
                             segs_per_image: int | None = None,
                             mnum: jax.Array | None = None,
                             full_offsets: bool = False,
                             k_chunks: int | None = None):
    """[n_seg, F*1024] u32 + [n_seg] bits -> (scan stream u32 (byte-swapped:
    raw final scan bytes in order), image_offsets [n_images] i32,
    total_scan_bytes i32 scalar).

    The stream holds the COMPLETE entropy-coded scan(s): segments trimmed,
    0xFF00-stuffed and joined with RSTn markers on device. Host work is a
    fetch of total_scan_bytes bytes plus header concatenation. With
    segs_per_image set (batched encode), markers and RST numbering reset
    at image boundaries and image_offsets gives each image's byte start.

    mnum overrides the marker table: [n_seg] i32, the RSTn marker's second
    byte after each segment (0 = no marker). May be a traced array — the
    sharded encoder computes it from the mesh row index so marker
    numbering runs across row shards. full_offsets returns every
    segment's stuffed byte start [n_seg] instead of image offsets.

    k_chunks selects chunks per serial kernel iteration (default: the
    module flag _COMPACT_KB); >1 uses the latency-hiding batched kernel
    (_compact_stuff_kernel_kb), byte-identical output."""
    n_seg = seg_words.shape[0]
    f = frames_per_seg
    kb = _COMPACT_KB if k_chunks is None else k_chunks
    assert 1 <= kb <= 6
    spi = segs_per_image or n_seg
    assert n_seg % spi == 0
    if mnum is None:
        within = np.arange(n_seg, dtype=np.int32) % spi
        mnum = np.where((restart > 0) & (within != spi - 1),
                        0xD0 + (within % 8), 0).astype(np.int32)
    chunk_off, out_chunk, in_chunk, seg_end, nchunks, seg_start, total = \
        _stuff_precompute(seg_words, seg_bits, f, mnum)
    img_off = seg_start if full_offsets else seg_start[::spi]
    out_frames = n_seg * f * 2 + 1
    if kb == 1:
        kernel = functools.partial(
            _compact_stuff_kernel, n_seg=n_seg, f_per_seg=f,
            out_frames=out_frames)
        f_pad = f
    else:
        f_pad = -(-f // kb) * kb
        if f_pad != f:
            # Padded chunks: cursor = segment data end, lengths 0 — exact
            # no-ops in every kernel stage (see the kernel docstring).
            tail = chunk_off[:, -1:] + out_chunk[:, -1:]
            chunk_off = jnp.concatenate(
                [chunk_off] + [tail] * (f_pad - f), axis=1)
            zpad = [(0, 0), (0, f_pad - f)]
            out_chunk = jnp.pad(out_chunk, zpad)
            in_chunk = jnp.pad(in_chunk, zpad)
        kernel = functools.partial(
            _compact_stuff_kernel_kb, n_seg=n_seg, f_per_seg=f,
            f_pad=f_pad, out_frames=out_frames, kb=kb)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # chunk_off
            pl.BlockSpec(memory_space=pltpu.VMEM),   # out_chunk (stuffed)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # in_chunk
            pl.BlockSpec(memory_space=pltpu.VMEM),   # seg_end
            pl.BlockSpec(memory_space=pltpu.VMEM),   # nchunks
            pl.BlockSpec(memory_space=pltpu.VMEM),   # marker bytes
            pl.BlockSpec(memory_space=pltpu.ANY),    # frames
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((out_frames, 8, 128), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((2, 8, 128), jnp.uint32) if kb == 1 else
            pltpu.VMEM((2, kb, 8, 128), jnp.uint32),  # dbl-buffered in
            pltpu.VMEM((2, 8, 128), jnp.uint32),     # double-buffered out
            pltpu.SemaphoreType.DMA((2,)) if kb == 1 else
            pltpu.SemaphoreType.DMA((2, kb)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(chunk_off.reshape(1, n_seg * f_pad, 1),
      out_chunk.reshape(1, n_seg * f_pad, 1),
      in_chunk.reshape(1, n_seg * f_pad, 1),
      seg_end.reshape(1, n_seg, 1),
      nchunks.reshape(1, n_seg, 1),
      jnp.asarray(mnum).reshape(1, n_seg, 1),
      seg_words.reshape(n_seg, f, 8, 128))
    return out.reshape(-1), img_off, total




# Oracle-tier merge generations (v1/v2 + mcu_merge) live in
# entropy_oracles; re-exported here for compatibility (tests, scripts).
# Lazy (PEP 562) so the two modules have no import cycle — a top-level
# import here would break `import jpegtpu.kernels.entropy_oracles` run
# first (it imports this module's helpers at its own top level).
def __getattr__(name):
    if name in ("mcu_merge", "seg_merge", "seg_merge_v2"):
        from jpegtpu.kernels import entropy_oracles
        return getattr(entropy_oracles, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
