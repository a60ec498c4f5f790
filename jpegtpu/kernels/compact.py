"""Pallas TPU compaction kernels: segment streams -> the final scan.

Kernel D tier, split from entropy_pack.py (round-4, VERDICT r3 #9):

* compact_segments — concatenate trimmed per-segment bitstreams into one
  contiguous u32 stream (no stuffing; host/native tier finishes the scan).
* compact_segments_stuffed — the production pure-device path: 0xFF00
  byte stuffing + RSTn marker splicing fused into the compaction pass,
  so the device output IS the complete entropy scan and only compressed
  bytes ever cross the (slow, possibly tunneled) host link.

Both kernels are scatter-free (monotone-target placement via rank search
+ prefix-sum differences, register window flushes) — see the kernel
docstrings and the memory note "mosaic-kernel-constraints" before
editing. The chunk-batched variant (_compact_stuff_kernel_kb, kb>1
independent expansion chains per serial iteration) is the production
default; kb=1 remains the fallback tier.

The reference has no counterpart: its GPU path stops at RLE pairs and
its Huffman stage emits a '0'/'1' std::string that is never packed to
bytes (src/utils.cpp:656-698, SURVEY §2.10-2.11).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpegtpu.kernels import entropy_pack as _ep
from jpegtpu.kernels.entropy_pack import _cumlog


def _interpret() -> bool:
    """Resolve through the entropy_pack facade at CALL time so tests
    that monkeypatch entropy_pack._interpret govern this module too."""
    return _ep._interpret()

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
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
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

# Round-5 candidate: MXU one-hot window placement. The serial backbone of
# the stuffing kernels is place_rows' per-source-row fold into the window
# (2 chained OR-selects per row -> 144 dependent [wr_n,128] ops per
# iteration at kb=3): the window row scatter is really a tiny matmul —
# contrib = onehot[wr_n, R] @ rotated_planes[R, 128] — which runs on the
# MXU (idle in this kernel) with a ~6-op critical path, then ONE OR into
# the window. Exactness: every (window row, lane) cell receives at most
# one nonzero contribution (valid word targets are strictly increasing
# across the iteration's chunks and planes; rotated lanes outside a
# row's span are zero), so the f32 dot's sums are single-term and the
# 16-bit halves reassemble the exact u32 — OR == ADD on disjoint values.
# Env override until HW byte-gated: JPEGTPU_COMPACT_MM=0 disables.
_COMPACT_MM_PLACE = os.environ.get("JPEGTPU_COMPACT_MM", "1") != "0"

# Round-5 companion cut: single-mask window zeroing in flush_and_zero.
# The fold form zeroes flushed frames with 2kb+1 sequential selects on
# the window; since an iteration flushes at most 2kb+1 < wf distinct
# frame slots, one modular-distance mask zeroes them all in a single
# select: rel = (slot - f0) mod wf < (f1 - f0). Byte-identical by
# construction (same rows zeroed); HW-gated with the MM placement.
_COMPACT_ZMASK = os.environ.get("JPEGTPU_COMPACT_ZMASK", "1") != "0"


def _mm_place_contrib(planes_list, tvec_list, wr_n: int):
    """One-hot-matmul window placement: per (planes [k,128] u32, t_vec
    [k,1] absolute out-word targets) pair, rotate each row to its
    in-window lane position, then scatter rows onto the [wr_n, 128]
    window via ONE f32 matmul pair instead of a chained per-row fold.
    Returns the window contribution to OR in (see _COMPACT_MM_PLACE)."""
    srcs, tgts = [], []
    for planes, t_vec in zip(planes_list, tvec_list):
        k = planes.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (k, 128), 1)
        m = t_vec & 127
        idx = (lane - m) & 127
        rot = pltpu.bitcast(
            jnp.take_along_axis(pltpu.bitcast(planes, jnp.int32), idx,
                                axis=1), jnp.uint32)
        hi = jnp.where(lane >= m, rot, 0)
        lo = jnp.where(lane < m, rot, 0)
        wr = t_vec >> 7
        srcs += [hi, lo]
        tgts += [wr & (wr_n - 1), (wr + 1) & (wr_n - 1)]
    src = jnp.concatenate(srcs, axis=0)                 # [R, 128] u32
    tgt = jnp.concatenate(tgts, axis=0)                 # [R, 1] i32
    rr = src.shape[0]
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (rr, wr_n), 1)
    a = (lane_w == tgt).astype(jnp.float32)             # onehot^T [R, wr_n]
    si = pltpu.bitcast(src, jnp.int32)
    s_hi = (jnp.right_shift(si, 16) & 0xFFFF).astype(jnp.float32)
    s_lo = (si & 0xFFFF).astype(jnp.float32)
    dn = (((0,), (0,)), ((), ()))                       # a^T @ s
    # Precision.HIGHEST is required for exactness: the default bf16 MXU
    # pass truncates the 16-bit value halves (HW-corrupt while interpret
    # stays bit-exact — the _prefix64_mm lesson, relearned here on the
    # first HW gate run of this kernel).
    c_hi = jax.lax.dot_general(a, s_hi, dn,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
    c_lo = jax.lax.dot_general(a, s_lo, dn,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
    contrib = (jnp.left_shift(c_hi.astype(jnp.int32), 16) |
               c_lo.astype(jnp.int32))
    return pltpu.bitcast(contrib, jnp.uint32)


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
            if not _COMPACT_ZMASK:
                zmask = (fi < f1) & ((suw >> 3) == (fi & (wf - 1)))
                win = jnp.where(zmask, 0, win)
        if _COMPACT_ZMASK:
            # One modular-distance mask zeroes every flushed slot
            # (2kb+1 < wf, so flushed slots are distinct; see the
            # _COMPACT_ZMASK header).
            rel = ((suw >> 3) - (f0 & (wf - 1))) & (wf - 1)
            win = jnp.where(rel < (f1 - f0), 0, win)
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
        if _COMPACT_MM_PLACE:
            planes, tvecs = [], []
            for p in range(3):
                outp, prev_r = build_plane(p, prev_r)
                planes.append(outp)
                tvecs.append(t_base + 128 * p)
            win = win | _mm_place_contrib(planes, tvecs, wr_n)
        else:
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
            pl.BlockSpec(memory_space=pl.ANY),    # frames
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
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


def _compact_stuff_kernel_gkb(off_ref, slen_ref, innb_ref, send_ref,
                              mnum_ref, gtot_ref, njmax_ref, sseg_ref,
                              sj_ref, slast_ref, svalid_ref, frames_ref,
                              out_ref, chunk_ref, flush_ref, sem_in,
                              sem_out, *, n_seg: int, f_per_seg: int,
                              f_pad: int, capf: int, kb: int, gs: int,
                              imax: int):
    """_compact_stuff_kernel_kb with gs INDEPENDENT segment-group chains.

    Motivation: after kb=3 the loop is still serial across all segments
    — one register-window dependency chain end to end. kb=4/6 lost
    because batching MORE chunks of the SAME chain needs a 16-frame
    window (docstring above). Groups batch on the other axis: gs chains
    over DISJOINT segment ranges, each with its OWN 8-frame window and
    its OWN frame-aligned output region out_ref[g] — so windows never
    grow and chains never interact. The host stitches the gs exact-size
    spans (byte lengths are XLA-precomputed scalars) during assembly it
    already does. Output bytes per group are identical to the
    single-chain kernel's corresponding span by construction.

    The flat iteration schedule replaces the seg/chunk nested walk: at
    iteration i, chain g processes chunk-group sj[g,i] of segment
    sseg[g,i] (schedule precomputed in XLA from the chunk counts;
    svalid masks tail iterations of shorter chains into exact no-ops,
    cursor == group end so no flush fires). A chain's trailing RST
    marker splice is folded into its segment's LAST iteration
    (slast[g,i]) and covered by the same flush span.

    All per-iteration vector work is stacked on sublanes ([gs*kb*8,
    128]) like the kb batching; only window placement and flushing are
    per-group (their per-row loops address each group's own [64, 128]
    window and DMA slots)."""
    assert kb <= 3, "grouped kernel uses the 8-frame window (kb <= 3)"
    k8 = kb * 8
    gk8 = gs * k8
    lane = jax.lax.broadcasted_iota(jnp.int32, (gk8, 128), 1)
    lanek = jax.lax.broadcasted_iota(jnp.int32, (k8, 128), 1)
    suk = jax.lax.broadcasted_iota(jnp.int32, (gk8, 1), 0)
    suw = jax.lax.broadcasted_iota(jnp.int32, (64, 1), 0)
    lanew = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 1)
    gw = (suk & 7) * 128 + lane               # word index within chunk

    def bswap(w):
        return (jnp.right_shift(w, 24) |
                (jnp.right_shift(w, 8) & jnp.uint32(0xFF00)) |
                (jnp.left_shift(w & jnp.uint32(0xFF00), 8)) |
                jnp.left_shift(w, 24))

    def place_rows_g(win, planes, t_vec):
        """OR row r of planes [k8,128] into group window win [64,128]
        at absolute (group-local) out word t_vec[r] ([k8,1])."""
        m = t_vec & 127
        idx = (lanek - m) & 127
        rot = pltpu.bitcast(
            jnp.take_along_axis(pltpu.bitcast(planes, jnp.int32), idx,
                                axis=1), jnp.uint32)
        hi = jnp.where(lanek >= m, rot, 0)
        lo = jnp.where(lanek < m, rot, 0)
        wr = (t_vec >> 7) & 63
        for r in range(k8):
            win = win | jnp.where(suw == wr[r:r + 1], hi[r:r + 1, :], 0)
            win = win | jnp.where(suw == ((wr[r:r + 1] + 1) & 63),
                                  lo[r:r + 1, :], 0)
        return win

    def _out_copy(g, fi):
        # out is FLAT [gs*capf, 8, 128]: a 4D [gs, capf, 8, 128] ANY
        # output made Mosaic stage a >16 MB scoped-VMEM stack slice at
        # the 8K geometry (capf=2382) and fail compile; the 3D form is
        # exactly the single-chain kernel's shape and stays in HBM.
        return pltpu.make_async_copy(
            flush_ref.at[g, fi & 1],
            out_ref.at[g * capf + jnp.minimum(fi, capf - 1)],
            sem_out.at[g, fi & 1])

    def flush_frame_g(g, win, fi):
        @pl.when(fi >= 2)
        def _():
            _out_copy(g, fi - 2).wait()
        for par in range(8):
            @pl.when((fi & 7) == par)
            def _(par=par):
                flush_ref[g, par & 1] = bswap(win[par * 8:(par + 1) * 8, :])
        _out_copy(g, fi).start()

    def flush_and_zero_g(g, win, cur, end):
        win0 = win
        f0 = cur >> 12
        f1 = end >> 12
        for t in range(2 * kb + 1):
            fi = f0 + t

            @pl.when(fi < f1)
            def _(fi=fi):
                flush_frame_g(g, win0, fi)
            if not _COMPACT_ZMASK:
                zmask = (fi < f1) & ((suw >> 3) == (fi & 7))
                win = jnp.where(zmask, 0, win)
        if _COMPACT_ZMASK:
            rel = ((suw >> 3) - (f0 & 7)) & 7
            win = jnp.where(rel < (f1 - f0), 0, win)
        return win

    def _sched(g, i):
        b = g * imax + i
        return (sseg_ref[0, b], sj_ref[0, b],
                slast_ref[0, b], svalid_ref[0, b])

    def _in_copy(g, i, slot, k):
        seg, j, _, _ = _sched(g, i)
        idx = jnp.minimum(j * kb + k, f_per_seg - 1)   # clamped: padded
        return pltpu.make_async_copy(frames_ref.at[seg, idx],
                                     chunk_ref.at[slot, g, k],
                                     sem_in.at[slot, g, k])

    def iter_body(i, wins):
        slot = i & 1
        nj = njmax_ref[0, 0]
        for g in range(gs):
            for k in range(kb):
                _in_copy(g, i, slot, k).wait()

        @pl.when(i + 1 < nj)
        def _():
            for g in range(gs):
                for k in range(kb):
                    _in_copy(g, i + 1, 1 - slot, k).start()
        ch = chunk_ref[slot].reshape(gk8, 128)

        curs, rems, slens, segs, lasts, vals = [], [], [], [], [], []
        for g in range(gs):
            seg, j, lastf, val = _sched(g, i)
            base = seg * f_pad + j * kb
            gend = gtot_ref[0, g]
            for k in range(kb):
                curs.append(jnp.where(val > 0, off_ref[0, base + k],
                                      gend))
                rems.append(jnp.where(val > 0, innb_ref[0, base + k],
                                      0))
                slens.append(jnp.where(val > 0, slen_ref[0, base + k],
                                       0))
            segs.append(seg)
            lasts.append(lastf)
            vals.append(val)

        def vec(vals_):
            cid = suk >> 3
            acc = jnp.full((gk8, 1), vals_[0], jnp.int32)
            for c in range(1, gs * kb):
                acc = jnp.where(cid == c, vals_[c], acc)
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
        v1 = jnp.zeros((gk8, 128), jnp.uint32)
        for k, pk in ((1, p1), (2, p2), (3, p3)):
            c0, c1 = at_pos(b[k], valid[k], pk)
            v0 = v0 | c0
            v1 = v1 | c1

        incl = _cumlog(wexp, jnp.add, 0, axis=1)
        row_tot = incl[:, 127:128]
        # Group-masked sublane prefix: accumulation confined to each
        # 8-row chunk band (bands never span chains).
        x = row_tot
        step = 1
        while step < 8:
            ok = (suk >= step) & ((suk >> 3) == ((suk - step) >> 3))
            x = x + jnp.where(ok, pltpu.roll(x, step, axis=0), 0)
            step *= 2
        row_base = x - row_tot
        o_glob = cur_v + row_base + incl - wexp      # [gk8,128] out byte
        phi = ((o_glob & 3) * 8).astype(jnp.uint32)
        t_abs = o_glob >> 2
        w0 = jnp.right_shift(v0, phi)
        w1 = (jnp.left_shift(jnp.left_shift(v0, 1), (31 - phi) & 31) |
              jnp.right_shift(v1, phi))
        w2 = jnp.left_shift(jnp.left_shift(v1, 1), (31 - phi) & 31)
        t_base = (cur_v + row_base) >> 2             # [gk8,1]
        t_rel = t_abs - t_base                       # in [0, 258]
        t_rel = jnp.where(wexp > 0, t_rel, jnp.int32(1 << 14))

        def rank_at(q):
            pos = jnp.zeros((gk8, 128), jnp.int32)
            for step in (128, 64, 32, 16, 8, 4, 2, 1):
                cand = pos + step
                probe = jnp.take_along_axis(
                    t_rel, jnp.minimum(cand, 128) - 1, axis=1)
                pos = jnp.where((cand <= 128) & (probe <= q), cand, pos)
            return pos

        def val_at(vals_, jj, eq_q):
            jc = jnp.maximum(jj, 0)
            t = jnp.take_along_axis(t_rel, jc, axis=1)
            v = pltpu.bitcast(
                jnp.take_along_axis(pltpu.bitcast(vals_, jnp.int32), jc,
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

        prev_r = [jnp.zeros((gk8, 1), jnp.int32)] * 2
        planes = []
        for p in range(3):
            outp, prev_r = build_plane(p, prev_r)
            planes.append(outp)

        new_wins = []
        for g in range(gs):
            win = wins[g]
            rows = slice(g * k8, (g + 1) * k8)
            if _COMPACT_MM_PLACE:
                win = win | _mm_place_contrib(
                    [planes[p][rows, :] for p in range(3)],
                    [t_base[rows, :] + 128 * p for p in range(3)], 64)
            else:
                for p in range(3):
                    win = place_rows_g(win, planes[p][rows, :],
                                       t_base[rows, :] + 128 * p)
            # trailing RST marker, folded into the segment's last
            # iteration (masked to zero otherwise)
            seg = segs[g]
            send = send_ref[0, seg]
            mnum = mnum_ref[0, seg]
            do_mark = (lasts[g] > 0) & (vals[g] > 0) & (mnum > 0)
            mk = jnp.where(do_mark, jnp.uint32(0xFFFFFFFF),
                           jnp.uint32(0))
            m32 = (jnp.uint32(0xFF000000) |
                   jnp.left_shift(mnum.astype(jnp.uint32), 16)) & mk
            mphi = ((send & 3) * 8).astype(jnp.uint32)
            mw0 = jnp.right_shift(m32, mphi)
            mw1 = jnp.left_shift(jnp.left_shift(m32, 1), (31 - mphi) & 31)
            for val_, t in ((mw0, send >> 2), (mw1, (send >> 2) + 1)):
                win = win | jnp.where((suw == ((t >> 7) & 63)) &
                                      (lanew == (t & 127)), val_, 0)
            end = (curs[g * kb + kb - 1] + slens[g * kb + kb - 1] +
                   jnp.where(do_mark, 2, 0))
            win = flush_and_zero_g(g, win, curs[g * kb], end)
            new_wins.append(win)
        return tuple(new_wins)

    zero_wins = tuple(jnp.zeros((64, 128), jnp.uint32) for _ in range(gs))
    njmax = njmax_ref[0, 0]

    @pl.when(njmax > 0)
    def _():
        for g in range(gs):
            for k in range(kb):
                _in_copy(g, 0, 0, k).start()
    wins = jax.lax.fori_loop(0, njmax, iter_body, zero_wins)

    # Final drain per chain (see the single-chain kernel's notes): flush
    # a genuine partial last frame, then wait the in-flight output DMAs.
    for g in range(gs):
        total = gtot_ref[0, g]
        last = total >> 12
        partial = (total & 4095) > 0
        top = jnp.where(partial, last, last - 1)

        @pl.when(partial)
        def _(g=g, last=last):
            flush_frame_g(g, wins[g], last)

        @pl.when(top >= 1)
        def _(g=g, top=top):
            _out_copy(g, top - 1).wait()

        @pl.when(top >= 0)
        def _(g=g, top=top):
            _out_copy(g, top).wait()


def compact_segments_stuffed_grouped(seg_words: jax.Array,
                                     seg_bits: jax.Array,
                                     frames_per_seg: int, restart: int,
                                     groups: int,
                                     segs_per_image: int | None = None,
                                     mnum: jax.Array | None = None,
                                     k_chunks: int | None = None):
    """compact_segments_stuffed with `groups` independent serial chains
    (_compact_stuff_kernel_gkb): segments split into contiguous groups
    of spg = ceil(n_seg/groups); chain g emits its segments' stuffed
    span into its OWN frame-aligned region.

    Returns (stream2d [groups, capf*1024] u32 (byte-swapped raw bytes),
    group_bytes [groups] i32, img_off, total). The final scan is the
    concatenation of stream2d[g]'s first group_bytes[g] bytes — the
    caller stitches spans during the host assembly it already does.
    Byte-identical to compact_segments_stuffed's single stream by
    construction (asserted by tests on adversarial vectors + fuzz)."""
    n_seg = seg_words.shape[0]
    f = frames_per_seg
    gs = int(groups)
    kb = _COMPACT_KB if k_chunks is None else k_chunks
    # Grouped kernel clamps kb to <= 3: its double-buffered window holds
    # 8 frames, so kb=4 (wf=16) is single-chain only. Documented on
    # EncoderConfig.compact_kb — a user-set kb=4 with compact_groups>1
    # silently runs kb=3 (output is byte-identical either way).
    kb = min(kb, 3)
    assert gs >= 1 and 1 <= kb <= 3
    spi = segs_per_image or n_seg
    assert n_seg % spi == 0
    if mnum is None:
        within = np.arange(n_seg, dtype=np.int32) % spi
        mnum = np.where((restart > 0) & (within != spi - 1),
                        0xD0 + (within % 8), 0).astype(np.int32)
    mnum = jnp.asarray(mnum, jnp.int32)
    chunk_off, out_chunk, in_chunk, seg_end, nchunks, seg_start, total = \
        _stuff_precompute(seg_words, seg_bits, f, mnum)
    img_off = seg_start[::spi]

    spg = -(-n_seg // gs)
    gidx = jnp.arange(gs, dtype=jnp.int32)
    sidx = jnp.arange(n_seg, dtype=jnp.int32)
    gid = sidx // spg
    gfirst = jnp.clip(gidx * spg, 0, n_seg - 1)
    glast = jnp.clip((gidx + 1) * spg - 1, 0, n_seg - 1)
    gempty = (gidx * spg) >= n_seg
    group_start = seg_start[gfirst]
    off_local = chunk_off - group_start[gid][:, None]
    send_local = seg_end - group_start[gid]
    gtot = jnp.where(gempty, 0,
                     send_local[glast] +
                     2 * (mnum[glast] > 0).astype(jnp.int32))

    # chunk-group schedule: chain g's iteration i -> (segment, chunk
    # group) plus last-of-segment / validity flags
    f_pad = -(-f // kb) * kb
    if f_pad != f:
        tail = off_local[:, -1:] + out_chunk[:, -1:]
        off_local = jnp.concatenate(
            [off_local] + [tail] * (f_pad - f), axis=1)
        zpad = [(0, 0), (0, f_pad - f)]
        out_chunk = jnp.pad(out_chunk, zpad)
        in_chunk = jnp.pad(in_chunk, zpad)
    cnt = (nchunks + kb - 1) // kb                       # [n_seg]
    sgrid = gidx[:, None] * spg + jnp.arange(spg)[None, :]
    seg_ok = sgrid < n_seg
    cntg = jnp.where(seg_ok, cnt[jnp.clip(sgrid, 0, n_seg - 1)], 0)
    ccnt = jnp.cumsum(cntg, axis=1)                      # [gs, spg]
    nj = ccnt[:, -1]
    njmax = jnp.max(nj)
    jpg = f_pad // kb
    imax = spg * jpg + 1
    ii = jnp.arange(imax, dtype=jnp.int32)
    s_local = jnp.sum((ccnt[:, :, None] <= ii[None, None, :])
                      .astype(jnp.int32), axis=1)        # [gs, imax]
    s_cl = jnp.clip(s_local, 0, spg - 1)
    ccnt0 = jnp.concatenate(
        [jnp.zeros((gs, 1), ccnt.dtype), ccnt], axis=1)
    prev = jnp.take_along_axis(ccnt0, s_cl, axis=1)
    jj = jnp.clip(ii[None, :] - prev, 0, jpg - 1)
    validi = (ii[None, :] < nj[:, None]).astype(jnp.int32)
    cnt_at = jnp.take_along_axis(cntg, s_cl, axis=1)
    is_last = (validi > 0) & (ii[None, :] - prev == cnt_at - 1)
    sseg = jnp.clip(gidx[:, None] * spg + s_cl, 0, n_seg - 1)

    capf = spg * f * 2 + 2
    kernel = functools.partial(
        _compact_stuff_kernel_gkb, n_seg=n_seg, f_per_seg=f,
        f_pad=f_pad, capf=capf, kb=kb, gs=gs, imax=imax)
    # scalar operands ride in SMEM ([1, N] i32): the [1, N, 1] VMEM
    # form lane-pads 128x and blew the 16 MB scoped-vmem stack at the
    # 8K geometry (off/slen/innb alone are 14.6 MB there)
    sc = lambda x: x.astype(jnp.int32).reshape(1, -1)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 11 +
                 [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((gs * capf, 8, 128), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((2, gs, kb, 8, 128), jnp.uint32),
            pltpu.VMEM((gs, 2, 8, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, gs, kb)),
            pltpu.SemaphoreType.DMA((gs, 2)),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(sc(off_local), sc(out_chunk), sc(in_chunk), sc(send_local),
      sc(mnum), sc(gtot), sc(njmax), sc(sseg), sc(jj),
      sc(is_last.astype(jnp.int32)), sc(validi), 
      seg_words.reshape(n_seg, f, 8, 128))
    return out.reshape(gs, capf * 1024), gtot, img_off, total
