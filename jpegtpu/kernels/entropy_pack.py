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

# Round-4 gather cuts in _place_pair (interpret-bit-identical on
# dense/sparse/zero/max vectors; HW in-context byte gate
# scripts/tpu_ab_bp_place.py 2026-08-20: all four combos IDENTICAL on
# the full 4K program — run because int32 vector variants of this
# kernel have miscompiled in-context before):
#   _BP_PLACE_PACKED  pack both 16-bit prefix planes mod 2^16 into one
#                     i32 -> 1 ps_at gather per place call instead of 2.
#                     PRODUCTION DEFAULT ON: 5.13-5.19 -> 4.76-4.95
#                     ms/4K over 3 interleaved reps (~1617 -> ~1700
#                     MPix/s).
#   _BP_RANK6         6-probe rank search + broadcast count==64 fix-up.
#                     TESTED NEUTRAL (5.05-5.12 alone, and slightly
#                     WORSE combined with packed: 4.94-5.06) — default
#                     off, kept selectable.
_BP_PLACE_PACKED = os.environ.get("JPEGTPU_BP_PLACE_PACKED", "1") != "0"
_BP_RANK6 = os.environ.get("JPEGTPU_BP_RANK6", "0") != "0"

# Round-5 candidate (VERDICT r4 #2a): arithmetic DC lookup. The Annex-K
# DC tables' canonical codes have closed forms (luma: len 2/3/s-2,
# code 0/s+1/2^len-2; chroma: len max(s,2), code s or 2^len-2), so the
# per-pair DC table gather can be replaced by ~12 elementwise ops on the
# tiny [T,2] tensors. The roofline model predicts ~break-even (the
# kernel is elementwise-ISSUE bound and its gathers are fully hidden, so
# removing a gather buys nothing while the arith adds passes) — measured
# to close the question; falls back to the gather when the configured
# tables don't match the closed form (asserted at trace time).
_BP_DC_ARITH = os.environ.get("JPEGTPU_BP_DC_ARITH", "0") != "0"


@functools.lru_cache(maxsize=1)
def _dc_arith_ok() -> bool:
    """True iff the packed DC tables equal the Annex-K closed forms."""
    dc_codes, dc_lens, _, _ = ht.packed_luts()
    s = np.arange(16)
    l_len = np.where(s == 0, 2, np.where(s <= 5, 3, np.maximum(s - 2, 0)))
    l_code = np.where(s == 0, 0, np.where(s <= 5, s + 1,
                                          (1 << np.maximum(s - 2, 0)) - 2))
    c_len = np.where(s <= 2, 2, s)
    c_code = np.where(s <= 2, s, (1 << s) - 2)
    return (np.array_equal(l_len[:12], dc_lens[0][:12]) and
            np.array_equal(l_code[:12], dc_codes[0][:12]) and
            np.array_equal(c_len[:12], dc_lens[1][:12]) and
            np.array_equal(c_code[:12], dc_codes[1][:12]))

# seg_merge natural-layout input: byte-identical on HW but COST-NEUTRAL
# (the transpose it removes is already XLA-fused to 0.015-0.06 ms) —
# tested-neutral result, default off (scripts/ab_sm_nat.log).
_SM_NAT_INPUT = os.environ.get("JPEGTPU_SM_NAT", "0") != "0"

# seg_merge MCU columns per serial iteration (jb batching — the same
# latency-hiding axis as compact's kb and the 444 gm=4 grouping).
# PRODUCTION DEFAULT 8 (HW A/B scripts/ab_sm_jb.log + ab_sm_jb8.log
# 2026-08-20: byte-identical at jb 2/4/8 on 420 and 444; 420 4.14-4.44
# -> 3.32-3.89 ms at jb=4 and a further ~3% at jb=8; 444(gm4)
# 8.19-8.29 -> ~7.9 ms — its chunks=2 capacity clamps jb to 4). The
# safety bound in seg_merge_mcu clamps jb so jb*cap_bits < one frame;
# jb also shrinks to divide mb.
_SM_JB = int(os.environ.get("JPEGTPU_SM_JB", "8"))


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

        if _BP_DC_ARITH and _dc_arith_ok():
            # Closed-form (code<<5)|len on the [T,2] per-block scalars —
            # no table gather (see _BP_DC_ARITH header).
            s2 = d_size2
            sm2 = jnp.maximum(s2 - 2, 0)
            lum = jnp.where(
                s2 == 0, 2,
                jnp.where(s2 <= 5, jnp.left_shift(s2 + 1, 5) | 3,
                          jnp.left_shift(jnp.left_shift(1, sm2) - 2, 5)
                          | sm2))
            chrm = jnp.where(
                s2 <= 2, jnp.left_shift(s2, 5) | 2,
                jnp.left_shift(jnp.left_shift(1, s2) - 2, 5) | s2)
            d_packed = per_half(jnp.where(cls2 == 0, lum, chrm))
        else:
            dc_idx = per_half(cls2 * 16 + d_size2)      # [T2, 128]
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
    if _BP_ATTR_MODE == "norank":                       # timing only
        pos = jnp.minimum(k + 1, 64)
    elif _BP_RANK6:
        # 6-probe variant (candidate, HW gate pending): search [0,63]
        # (steps sum to 63, probe index cand-1 <= 62 needs no clamp) and
        # resolve count==64 with a broadcast compare against each half's
        # LAST target — wt is per-half sorted, so count==64 iff
        # wt[63] <= w. One gather pass cheaper than the 7-step form.
        full = jnp.where(half == 0, wt[:, 63:64], wt[:, 127:128]) <= k
        pos = jnp.zeros((t, 128), jnp.int32)
        for step in (32, 16, 8, 4, 2, 1):
            cand = pos + step
            probe = jnp.take_along_axis(wt, cand - 1 + base, axis=1)
            pos = jnp.where(probe <= k, cand, pos)
        pos = jnp.where(full, 64, pos)
    else:
        # Steps start at 64 so the count can reach all 64 slots; probes
        # clamp.
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

        if _BP_PLACE_PACKED and _BP_ATTR_MODE != "nopsat":
            # Packed-plane variant (production default, HW byte-gated): the
            # per-word plane DIFFS are exact 16-bit values (bits within
            # one output word are disjoint, so each plane's sum over a
            # rank range <= 0xFFFF), so prefix sums mod 2^16 suffice —
            # pack both planes into one i32 and gather ONCE per place
            # call instead of once per plane. Mod-2^16 subtraction of
            # mod-2^16 prefix reductions is exact for in-range diffs.
            # CAUTION: int32 vector math in this kernel has a miscompile
            # history in-context (module docstring / place() note). The
            # HW byte gate HAS run (scripts/tpu_ab_bp_place.py,
            # 2026-08-20, all combos byte-identical) and this variant is
            # the production default — but RE-GATE with the full bisect
            # ladder after any toolchain/jax upgrade.
            ph = psh.astype(jnp.int32)
            plo = psl.astype(jnp.int32)
            packed = jnp.left_shift(ph, 16) | (plo & 0xFFFF)
            g = jnp.take_along_axis(packed,
                                    jnp.maximum(pos_v - 1, 0) + base,
                                    axis=1)
            g = jnp.where(pos_v > 0, g, 0)
            prev = jnp.where(k == 0, 0, pltpu.roll(g, 1, axis=1))
            gu = pltpu.bitcast(g, jnp.uint32)
            pu = pltpu.bitcast(prev, jnp.uint32)
            dh = (jnp.right_shift(gu, 16) - jnp.right_shift(pu, 16)) \
                & 0xFFFF
            dl = ((gu & 0xFFFF) - (pu & 0xFFFF)) & 0xFFFF
            return jnp.left_shift(dh, 16) | dl
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
    segment boundary. The auto rule returns a power of two in
    {1, 2, 4, 8}; the one HW-validated exception (444 chunk-growing
    gm=4 below) is also a power of two.

    JPEGTPU_FORCE_GM is an UNCHECKED experiment-only escape hatch for
    A/B probes (e.g. scripts/tpu_ab_gm4.py): any divisor of
    mcus_per_seg is accepted — including non-powers-of-two — and the
    chunk-capacity rule is bypassed entirely, so a forced gm can exceed
    the block_pack scoped-VMEM budget and fail to compile (gm=8 at 444
    does, measured). Never set it outside probe scripts; production
    paths must rely on the auto rule."""
    force = os.environ.get("JPEGTPU_FORCE_GM")
    if force:
        gm = int(force)
        return gm if gm > 1 and mcus_per_seg % gm == 0 else 1
    # HW-validated override: 444 (g=3) at gm=4. Under the round-4
    # 384-bit budget this ran chunk-GROWING (two chunks per unit, half
    # the serial appends; 8.51-8.72 -> 8.21-8.32 ms, ab_gm4b.log);
    # since the round-5 mode-aware 330-bit first-pass budget
    # (config.first_pass_budget) the same gm=4 unit fits ONE chunk —
    # chunk-free by the generic rule too — and measured another
    # 7.3-7.6 -> 6.7-7.1 ms (ab_budget444.log). gm=8 fails Mosaic
    # compilation at any budget (g_eff=24 block_pack; probed at 330 and
    # 300, ab_budget444.log). Other geometries keep the chunk-free rule.
    if g == 3 and mcus_per_seg % 4 == 0:
        # Capacity guard (round-5 HW finding, check_escalation2.log):
        # the unconditional return built the ESCALATED
        # (MAX_BITS_PER_BLOCK) program as a 12-block x 5-chunk unit
        # whose scoped-VMEM stack (24.3 MB) fails Mosaic on real
        # hardware — so any dense-content 444 encode that triggered
        # escalation crashed instead of re-running. Only take gm=4
        # within its HW-validated envelope (<= 2 chunks: the round-4
        # chunk-growing configuration); escalated/huge budgets fall
        # through to the generic rule and run ungrouped.
        ch4, _ = mcu_capacity(12, bits_budget)
        if ch4 <= 2:
            return 4
    chunks1, _ = mcu_capacity(g, bits_budget)
    # cand=16 (gray at user budgets <= 252) was probed in round 5 and
    # REMOVED: gm=16@248 measured neutral-to-worse than gm=8@384
    # (ab_budget_all2.log) and under every auto default the candidate
    # is dead code — keeping it selectable would be a reachable
    # untested configuration (the compact_kb 5..6 class, VERDICT r4 #5).
    #
    # VMEM feasibility cap (round-5 HW finding, scripts/
    # check_escalation.log): a tiny user bits_budget makes HUGE groups
    # look chunk-free — e.g. budget=48 at 420 picked gm=8 (g_eff=48,
    # a [T, 3072]-lane block_pack) whose scoped-VMEM stack (33 MB)
    # FAILS Mosaic compilation on real hardware while interpret mode
    # (no VMEM limits) passes. Cap the grouped unit at 16 blocks: every
    # HW-validated configuration (444 gm=4 -> 12, 422 gm=4 -> 16,
    # gray gm=8 -> 8) is within it, and g_eff=24 is already a known
    # compile failure (444 gm=8 probes).
    for cand in (8, 4, 2):
        if mcus_per_seg % cand or g * cand > 16:
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
        if _BP_ATTR_MODE in ("nosym", "floor"):         # timing only
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
    if _BP_ATTR_MODE in ("floor", "nomerge"):           # timing only:
        # skip the merge loop entirely — OR the pair streams into chunk 0
        # (garbage bytes, load/compute structure preserved upstream)
        merged = functools.reduce(jnp.bitwise_or, pair_words)
        if chunks > 1:
            merged = jnp.concatenate(
                [merged] + [jnp.zeros((t, 128), jnp.uint32)] *
                (chunks - 1), axis=1)
        off = functools.reduce(
            jnp.add, [tp[:, :1] + tp[:, 1:] for tp in pair_tot])
        return merged, off
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
        # Prefer a tile that DIVIDES nm (largest divisor of nm in
        # [256, _TILE], multiple of 8): a non-dividing tile forces a
        # concat pad of the whole coeffs tensor — a ~0.33 ms/4K-444 XLA
        # copy (trace_r4_444.log pad.11+reshape.46; 420 pays ~0.15).
        # The round-2 tile sweep showed 256 within ~15% of 512, so any
        # divisor in range beats the pad copy.
        tile = _TILE
        for cand in range(_TILE, 255, -8):
            if cand <= nm and nm % cand == 0:
                tile = cand
                break
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
                         frames: int, mcu_major: bool = False,
                         nat_input: bool = False, jb: int = 1):
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

    lane_b = jax.lax.broadcasted_iota(jnp.int32, (jb * s_rows, 128), 1)

    def body(i, win):
        # jb MCU columns per serial iteration, stacked on sublanes
        # ([jb*S, ...]): every per-MCU computation is independent given
        # the XLA-precomputed offsets, so the batched form issues the
        # same vector work in 1/jb the op count and touches the
        # loop-carried window once per batch instead of once per MCU —
        # the same latency-hiding batching as the compact kernel's kb
        # and gm=4 at 444. SAFETY: per-MCU streams are capped at
        # cap_bits (mcu_capacity; overruns escalate and the first-pass
        # output is discarded), so jb*cap_bits < one 32768-bit frame
        # guarantees at most ONE frame crossing per row per batch — a
        # later sub-column can never wrap onto the half being flushed.
        win = list(win)
        j0 = i * jb

        def sub(ref3):
            if jb == 1:
                return ref3(j0)
            return jnp.concatenate([ref3(j0 + t) for t in range(jb)])

        o_b = sub(lambda j: off_ref[0, j])               # [jb*S, 1] i32
        l_b = sub(lambda j: len_ref[0, j])
        if nat_input:
            s_b = sub(lambda j: mwords_ref[:, j, :])     # [jb*S, CW]
        elif mcu_major:
            s_b = sub(lambda j: mwords_ref[j, 0])
        else:
            s_b = sub(lambda j: mwords_ref[0, j])
        r = (o_b & 31).astype(jnp.uint32)

        # funnel shift right by r bits across the whole stream (branch-free
        # carry: (x<<1)<<((31-r)&31) == x<<(32-r) for r>=1, 0 for r==0)
        shifted = []
        prev_last = jnp.zeros((jb * s_rows, 1), jnp.uint32)
        for c in range(chunks):
            ch = s_b[:, c * 128:(c + 1) * 128]
            rolled1 = pltpu.roll(ch, 1, axis=1)
            carry_in = jnp.where(lane_b == 0, prev_last, rolled1)
            sh = jnp.right_shift(ch, r) | \
                jnp.left_shift(jnp.left_shift(carry_in, 1), (31 - r) & 31)
            shifted.append(sh)
            prev_last = ch[:, 127:128]

        # per-row lane rotation to the window-local position
        p_abs = o_b >> 5                                 # word offset
        mrot = p_abs & 127
        idx = (lane_b - mrot) & 127
        rot = [pltpu.bitcast(
            jnp.take_along_axis(pltpu.bitcast(sh, jnp.int32), idx, axis=1),
            jnp.uint32) for sh in shifted]
        hi = [jnp.where(lane_b >= mrot, rc, 0) for rc in rot]
        lo = [jnp.where(lane_b < mrot, rc, 0) for rc in rot]

        pw = (p_abs >> 7)                                # chunk index
        for w in range(nwin):
            sel = jnp.zeros((jb * s_rows, 128), jnp.uint32)
            for c in range(chunks):
                sel = sel | jnp.where(((pw + c) & (nwin - 1)) == w,
                                      hi[c], 0)
                sel = sel | jnp.where(((pw + c + 1) & (nwin - 1)) == w,
                                      lo[c], 0)
            fold = sel[0:s_rows, :]
            for t in range(1, jb):                       # sublane fold
                fold = fold | sel[t * s_rows:(t + 1) * s_rows, :]
            win[w] = win[w] | fold

        # flush completed frames (rare; bitmaps OR'd over the batch; two
        # 32-bit words so s_rows=64 fits). With <=1 crossing per batch
        # the completed frame is the batch's STARTING frame per row.
        mp0 = map_ref[0, j0, 0, 0]
        mp1 = map_ref[0, j0, 0, 1]
        for t in range(1, jb):
            mp0 = mp0 | map_ref[0, j0 + t, 0, 0]
            mp1 = mp1 | map_ref[0, j0 + t, 0, 1]

        @pl.when((mp0 | mp1) != 0)
        def _():
            for srow in range(s_rows):
                mp_w = mp1 if srow >= 32 else mp0

                @pl.when(((mp_w >> (srow & 31)) & 1) != 0)
                def _(srow=srow):
                    o_s = off_ref[0, j0, srow, 0]
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

        # retire the flushed half so it can host frame f+2 (crossing
        # detected over the whole batch span; monotone offsets)
        fstart = o_b[0:s_rows, :] >> 15
        o_end = (o_b[(jb - 1) * s_rows:, :] +
                 l_b[(jb - 1) * s_rows:, :])
        crossed = (o_end >> 15) > fstart                 # [S,1] bool
        parity = fstart & 1
        for w in range(nwin):
            win[w] = jnp.where(crossed & (parity == (w // 8)), 0, win[w])
        return tuple(win)

    assert mb % jb == 0
    win = jax.lax.fori_loop(0, mb // jb, body, tuple(win))
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
                  mcu_major: bool = False, s_rows: int | None = None,
                  nat_input: bool | None = None):
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
    if nat_input is None:
        nat_input = _SM_NAT_INPUT
    nat_input = bool(nat_input) and not mcu_major
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
    elif nat_input:
        # NATURAL layout: block (s_rows, mb, CW) straight out of the
        # padded [n_seg_p, mps_p, CW] tensor — no [G, mps, S, CW]
        # transpose copy of the stream tensor (the kernel slices
        # [:, j, :] per iteration instead). Candidate (env
        # JPEGTPU_SM_NAT; HW gate scripts/tpu_ab_sm_nat.py).
        mw_k = mw_p
        mw_spec = pl.BlockSpec((s_rows, mb, chunks * 128),
                               lambda gi, mi: (gi, mi, 0),
                               memory_space=pltpu.VMEM)
    else:
        mw_k = _to_kernel(mw_p, chunks * 128)
        mw_spec = pl.BlockSpec((1, mb, s_rows, chunks * 128),
                               lambda gi, mi: (gi, mi, 0, 0),
                               memory_space=pltpu.VMEM)

    frames = -(-w_cap // 1024) + 1
    # MCU columns per serial iteration (candidate, HW gate pending —
    # scripts/tpu_ab_sm_jb.py). Safety: per-MCU streams are capped at
    # cap_bits (overruns escalate; first-pass bytes discarded), so
    # jb*cap_bits < one frame (32768 bits) keeps the <=1-crossing-per-
    # batch invariant the 2-frame window needs. jb must divide mb.
    jb = 1
    if _SM_JB > 1:
        cap_bits = (chunks * 128 - 2) * 32
        jb = min(_SM_JB, max(1, (32768 - 1) // cap_bits))
        while mb % jb:
            jb -= 1
    kernel = functools.partial(
        _seg_merge_v3_kernel, mb=mb, m_steps=m_steps, chunks=chunks,
        s_rows=s_rows, frames=frames, mcu_major=mcu_major,
        nat_input=nat_input, jb=jb)
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
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
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


# Round-5 candidate: tree-structured bit_join — TESTED NEGATIVE on HW
# (2026-08-20, scripts/ab_bjtree.log, byte-identical at VSEG 8/16/32):
# restart=0 lin-v8 4.74-5.09 ms vs tree-v8 5.14-5.67 and tree-v16/32
# worse still. The pass-count model (log2(S) x OW vs S x OW) loses to
# reality: the vmap'd per-pair DYNAMIC rolls lower as gathers and the
# doubling intermediate buffers add HBM round trips the linear form's
# single accumulator avoids. Kept selectable as the negative-result
# record; restart=0's gap to rows-restart is NOT the join.
_BJ_TREE = os.environ.get("JPEGTPU_BJ_TREE", "0") != "0"


def _bj_mask_tail(w, nb):
    """Zero stream words past nb bits (strips seg_merge's byte padding)."""
    wv = w.shape[0]
    idx = jnp.arange(wv, dtype=jnp.int32)
    nw = (nb + 31) >> 5
    r = (nb & 31).astype(jnp.uint32)
    head = jnp.where(r > 0,
                     ~jnp.right_shift(jnp.uint32(0xFFFFFFFF), r),
                     jnp.uint32(0xFFFFFFFF))
    m = jnp.where(idx < nw - 1, jnp.uint32(0xFFFFFFFF),
                  jnp.where(idx == nw - 1, head, jnp.uint32(0)))
    return w & jnp.where(nb > 0, m, jnp.uint32(0))


def _bit_join_tree(seg_words: jax.Array, seg_bits: jax.Array,
                   out_words: int, pad_final: bool = True):
    """bit_join via pairwise tree joins (see _BJ_TREE). Buffer sizes
    double per level (2*cur+1: left operand + shifted right + funnel
    spill, no roll wraparound); the final stream truncates/pads to
    out_words — exact because every word past the total bit count is
    provably zero (inputs are tail-masked and joins only OR shifted
    real bits)."""
    s, wv = seg_words.shape
    bits = seg_bits.astype(jnp.int32)
    total = jnp.sum(bits)
    words = jax.vmap(_bj_mask_tail)(seg_words, bits)
    cur = wv
    while words.shape[0] > 1:
        n = words.shape[0]
        if n % 2:
            words = jnp.concatenate(
                [words, jnp.zeros((1, cur), jnp.uint32)])
            bits = jnp.concatenate([bits, jnp.zeros(1, jnp.int32)])
            n += 1
        new_w = 2 * cur + 1
        a, b = words[0::2], words[1::2]
        ba, bb = bits[0::2], bits[1::2]

        def join(av, bv, nba):
            r = (nba & 31).astype(jnp.uint32)
            prev = jnp.concatenate([jnp.zeros(1, jnp.uint32), bv[:-1]])
            sh = jnp.right_shift(bv, r) | \
                jnp.left_shift(jnp.left_shift(prev, 1), (31 - r) & 31)
            spill = jnp.left_shift(jnp.left_shift(bv[-1:], 1),
                                   (31 - r) & 31)
            shp = jnp.concatenate(
                [sh, spill, jnp.zeros(new_w - cur - 1, jnp.uint32)])
            shr = jnp.roll(shp, nba >> 5)
            ap = jnp.concatenate(
                [av, jnp.zeros(new_w - cur, jnp.uint32)])
            return ap | shr

        words = jax.vmap(join)(a, b, ba)
        bits = ba[...] + bb[...]
        cur = new_w
    out = words[0]
    if cur < out_words:
        out = jnp.concatenate(
            [out, jnp.zeros(out_words - cur, jnp.uint32)])
    elif cur > out_words:
        out = out[:out_words]
    if pad_final:
        padb = ((8 - (total & 7)) & 7).astype(jnp.uint32)
        r = (total & 31).astype(jnp.uint32)
        padval = jnp.left_shift(
            jnp.left_shift(jnp.uint32(1), padb) - 1, (32 - r - padb) & 31)
        oidx = jnp.arange(out_words, dtype=jnp.int32)
        out = out | jnp.where(oidx == (total >> 5), padval, jnp.uint32(0))
    return out, total


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
    appends). _BJ_TREE selects the log-depth pairwise form."""
    if _BJ_TREE:
        return _bit_join_tree(seg_words, seg_bits, out_words, pad_final)
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


# Rotate-once + masked-chunk-select MCU merge in block_pack_mcu (vs the
# per-chunk-gather form). TESTED NEGATIVE RESULT (2026-08-19,
# scripts/tpu_ab_bp_merge.py on HW): byte-identical, zero speedup
# (5.72-5.78 vs 5.66-5.76 ms interleaved) — trading 2 gathers for
# ~5 selects per block is cost-neutral; block_pack is not simply
# gather-count-bound. Default stays the long-validated gather form.
# Env override: JPEGTPU_BP_MERGE_ROT=1.
_BP_MERGE_ROT = os.environ.get("JPEGTPU_BP_MERGE_ROT", "0") != "0"


# Oracle-tier merge generations (v1/v2 + mcu_merge) live in
# entropy_oracles; the compaction kernels (kernel D: compact_segments /
# compact_segments_stuffed + their diagnostic flags) in compact. Both
# re-exported here for compatibility (encoder, tests, scripts). Lazy
# (PEP 562) so the modules have no import cycle — both import this
# module's helpers at their own top level. NOTE: the compact flags
# (_COMPACT_KB / _COMPACT_ATTR_MODE / _COMPACT_SKIP_P2) forward READS
# only; diagnostic scripts that mutate them must do so on
# jpegtpu.kernels.compact directly.
def __getattr__(name):
    if name in ("mcu_merge", "seg_merge", "seg_merge_v2"):
        from jpegtpu.kernels import entropy_oracles
        return getattr(entropy_oracles, name)
    if name in ("compact_segments", "compact_segments_stuffed",
                "_COMPACT_KB", "_COMPACT_ATTR_MODE", "_COMPACT_SKIP_P2",
                "_stuff_precompute"):
        from jpegtpu.kernels import compact
        return getattr(compact, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
