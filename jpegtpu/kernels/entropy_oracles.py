"""Oracle-tier merge kernels: the v1/v2 generations kept as TEST ORACLES.

Production uses the fused block_pack_mcu + seg_merge_mcu (v3) +
compact(+stuff) pipeline in jpegtpu.kernels.entropy_pack; the kernels
here are earlier generations whose simpler structure makes them the
bit-exactness ladder the test suite climbs (sequential Python oracle ->
v1 -> v2 -> v3 -> fused), per SURVEY §4's oracle-tier strategy:

* seg_merge (v1): fori loop per segment over blocks with a VMEM
  accumulator; one funnel shift + dynamic 2-row read-modify-write per
  block.
* mcu_merge: vectorized MCU pre-merge (G block streams -> one MCU
  stream via per-row lane gathers, no serial work).
* seg_merge_v2: mcu_merge + a register-window serial phase.

They are exported from entropy_pack for compatibility; new code should
not build on them.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpegtpu.kernels.entropy_pack import BLOCK_WORDS, _interpret


def _mcu_merge_kernel(words_ref, lens_ref, mwords_ref, mlens_ref,
                      *, g: int, chunks: int):
    """Vectorized pre-merge: G consecutive block streams -> one MCU stream.

    words [G, T, BLOCK_WORDS], lens [G, T, 1] -> mwords [T, chunks*128],
    mlens [T, 1]. G leads so every slice is a natively-tiled [T, W] array
    (a [T, G, W] layout tiles on the degenerate (G, W) pair and forces a
    relayout per slice — measured ~6x slower). Placement at the MCU scale
    is a per-row lane gather: for output chunk c, word lane l takes
    shifted_g[l + 128c - q_g] — no scatter, no serial work.
    """
    t = words_ref.shape[1]
    lens = jnp.concatenate([lens_ref[gi] for gi in range(g)],
                           axis=1)                       # [T, G]
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, 128), 1)

    out_chunks = [jnp.zeros((t, 128), jnp.uint32) for _ in range(chunks)]
    off = jnp.zeros((t, 1), jnp.int32)                   # exclusive bits
    for gi in range(g):
        w_pad = words_ref[gi]                            # [T, 128] padded
        r = (off & 31).astype(jnp.uint32)
        q = off >> 5                                     # [T, 1]
        rolled1 = pltpu.roll(w_pad, 1, axis=1)
        sh = jnp.right_shift(w_pad, r)
        # branch-free funnel carry: (x<<1)<<((31-r)&31) == x<<(32-r)
        # for r>=1 and 0 for r==0 (where(r>0,...) lowers ~10x slower)
        sh = sh | jnp.left_shift(jnp.left_shift(rolled1, 1),
                                 (31 - r) & 31)
        for c in range(chunks):
            idx = lane + (128 * c) - q                   # [T, 128]
            valid = (idx >= 0) & (idx < 128)
            gat = jnp.take_along_axis(sh, jnp.clip(idx, 0, 127), axis=1)
            out_chunks[c] = out_chunks[c] | jnp.where(valid, gat, 0)
        off = off + lens[:, gi:gi + 1]
    mwords_ref[...] = jnp.concatenate(out_chunks, axis=1)
    mlens_ref[...] = off


def mcu_merge(words: jax.Array, lens: jax.Array, g: int,
              chunks: int | None = None):
    """[N, BLOCK_WORDS] + [N] -> ([N/g, chunks*128], [N/g]) MCU streams.

    chunks defaults to the worst-case capacity (g*52+2 words). Callers on
    a bit-budget pass mcu_capacity(...)[0] — 1 chunk instead of 3 for the
    default 420 budget — and must check max(mlens) against cap_bits
    host-side (an over-budget MCU is silently truncated here)."""
    n = words.shape[0]
    assert n % g == 0
    nm = n // g
    if chunks is None:
        chunks = -(-(g * 52 + 2) // 128)
    tile = 256
    pad = (-nm) % tile
    if pad:
        words = jnp.concatenate(
            [words, jnp.zeros((pad * g, BLOCK_WORDS), words.dtype)])
        lens = jnp.concatenate([lens, jnp.zeros(pad * g, lens.dtype)])
        mw, ml = mcu_merge(words, lens, g, chunks)
        return mw[:nm], ml[:nm]
    kernel = functools.partial(_mcu_merge_kernel, g=g, chunks=chunks)
    # g-leading layout so kernel slices are natively tiled (see kernel
    # doc); lane-pad to 128 in XLA so the kernel never concatenates
    # (a [T,56] -> [T,128] in-kernel pad relayouts every iteration)
    words_t = words.reshape(nm, g, BLOCK_WORDS).transpose(1, 0, 2)
    words_t = jnp.pad(words_t, ((0, 0), (0, 0), (0, 128 - BLOCK_WORDS)))
    lens_t = lens.reshape(nm, g, 1).transpose(1, 0, 2)
    mw, ml = pl.pallas_call(
        kernel,
        grid=(nm // tile,),
        in_specs=[
            pl.BlockSpec((g, tile, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, tile, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, chunks * 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nm, chunks * 128), jnp.uint32),
            jax.ShapeDtypeStruct((nm, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(words_t, lens_t)
    return mw, ml.reshape(nm)




def _seg_merge_window_kernel(mwords_ref, mlens_ref, out_ref, bits_ref,
                             *, mps: int, chunks: int, frames: int):
    """Serial phase over pre-merged MCU streams with a register window.

    The bitstream cursor lives in a [16, 128] vreg window (2048 words = 2
    frames); contributions land via one dynamic lane-roll per chunk plus
    sublane selects, and a frame flushes to HBM only when the cursor crosses
    a 1024-word boundary. mwords [1, mps, chunks*128], mlens [1, mps, 1] ->
    out [1, frames, 8, 128], bits [1,1,1].
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    su = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    frame_bits = 1024 * 32

    def place(win, local_bits, stream_chunks):
        """OR a funnel-shifted stream (list of [1,128] chunks) into win at
        local word offset; returns new window."""
        m = (local_bits >> 5) & 127
        p0 = (local_bits >> 5) >> 7
        rolled = [pltpu.roll(c, m, axis=1) for c in stream_chunks]
        rows = []
        for k in range(len(rolled) + 1):
            cur = rolled[k] if k < len(rolled) else None
            prv = rolled[k - 1] if k >= 1 else None
            hi = jnp.where(lane >= m, cur, 0) if cur is not None else 0
            lo = jnp.where(lane < m, prv, 0) if prv is not None else 0
            rows.append(hi | lo)
        contrib = jnp.zeros((16, 128), jnp.uint32)
        for k, rk in enumerate(rows):
            contrib = contrib | jnp.where(su == p0 + k, rk, 0)
        return win | contrib

    def body(j, state):
        local_bits, f, win = state
        l = mlens_ref[0, j, 0]
        r = (local_bits & 31).astype(jnp.uint32)
        s = mwords_ref[0, pl.ds(j, 1), :]                # [1, chunks*128]
        s_chunks = [s[:, c * 128:(c + 1) * 128] for c in range(chunks)]
        # funnel shift right by r bits across the whole stream
        shifted = []
        prev_last = jnp.zeros((1, 1), jnp.uint32)
        for c in range(chunks):
            ch = s_chunks[c]
            rolled1 = pltpu.roll(ch, 1, axis=1)
            carry_in = jnp.where(
                lane == 0,
                prev_last if c > 0 else jnp.zeros((1, 1), jnp.uint32),
                rolled1)
            sh = jnp.right_shift(ch, r)
            # branch-free funnel carry: (x<<1)<<((31-r)&31) == x<<(32-r)
            # for r>=1 and 0 for r==0 (where(r>0,...) lowers ~10x slower)
            sh = sh | jnp.left_shift(jnp.left_shift(carry_in, 1),
                                     (31 - r) & 31)
            shifted.append(sh)
            prev_last = ch[:, 127:128]
        win = place(win, local_bits, shifted)

        new_bits = local_bits + l
        crossed = new_bits >= frame_bits

        @pl.when(crossed)
        def _():
            # clamp so a budget-overflow run still completes (the host
            # detects overflow from seg_bits and re-runs with a larger
            # budget; an unclamped OOB store aborts the TPU)
            f_safe = jnp.minimum(f, frames - 1)
            out_ref[0, pl.ds(f_safe, 1), :, :] = \
                win[0:8, :].reshape(1, 8, 128)

        win = jnp.where(crossed,
                        jnp.concatenate(
                            [win[8:16, :], jnp.zeros((8, 128), jnp.uint32)]),
                        win)
        local_bits = jnp.where(crossed, new_bits - frame_bits, new_bits)
        f = f + crossed.astype(jnp.int32)
        return local_bits, f, win

    zero_win = jnp.zeros((16, 128), jnp.uint32)
    local_bits, f, win = jax.lax.fori_loop(
        0, mps, body, (jnp.int32(0), jnp.int32(0), zero_win))

    total = f * frame_bits + local_bits
    # 1-pad the final partial byte (T.81 F.1.2.3).
    pad = (8 - (total & 7)) & 7
    b = total & 31
    padmask = jnp.where(
        pad > 0,
        jnp.left_shift(
            jnp.left_shift(jnp.uint32(1), pad.astype(jnp.uint32)) - 1,
            (32 - b - pad).astype(jnp.uint32)),
        jnp.uint32(0))
    padvec = jnp.where(lane == 0, padmask, jnp.uint32(0))
    win = place(win, (local_bits >> 5) << 5, [padvec])

    f_safe = jnp.minimum(f, frames - 1)
    out_ref[0, pl.ds(f_safe, 1), :, :] = win[0:8, :].reshape(1, 8, 128)

    @pl.when(f + 1 < frames)
    def _():
        out_ref[0, pl.ds(f + 1, 1), :, :] = win[8:16, :].reshape(1, 8, 128)

    bits_ref[0, 0, 0] = total


def seg_merge_v2(words: jax.Array, lens: jax.Array, n_seg: int, bps: int,
                 w_cap: int, blocks_per_mcu: int):
    """Two-phase segment merge: vectorized MCU pre-merge + register-window
    serial append (blocks_per_mcu x fewer serial iterations than v1)."""
    g = blocks_per_mcu
    chunks = -(-(g * 52 + 2) // 128)
    mwords, mlens = mcu_merge(words, lens, g)
    mps = bps // g                                       # MCUs per segment
    frames = -(-w_cap // 1024) + 1
    kernel = functools.partial(_seg_merge_window_kernel, mps=mps,
                               chunks=chunks, frames=frames)
    out, bits = pl.pallas_call(
        kernel,
        grid=(n_seg,),
        in_specs=[
            pl.BlockSpec((1, mps, chunks * 128), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mps, 1), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, frames, 8, 128), lambda s: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda s: (s, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_seg, frames, 8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((n_seg, 1, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(mwords.reshape(n_seg, mps, chunks * 128),
      mlens.reshape(n_seg, mps, 1))
    return out.reshape(n_seg, frames * 1024), bits.reshape(n_seg)



def _seg_merge_kernel(words_ref, lens_ref, out_ref, bits_ref, acc_ref,
                      *, bps: int, rows: int):
    """Append bps block streams into one segment stream.

    acc layout: [rows+2, 1, 128] u32 — 128 words per row so Mosaic's
    lane-alignment rules never see a dynamic lane index; placement uses a
    dynamic lane rotate + two-row masked OR at a dynamic *leading*-dim
    offset, which is unrestricted.
    """
    acc_ref[...] = jnp.zeros_like(acc_ref)
    zpad = jnp.zeros((1, 128 - BLOCK_WORDS), jnp.uint32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def place(carry_bits, w_pad, nbits):
        """OR a (<=57-word, bit-shiftable) contribution at carry_bits."""
        r = (carry_bits & 31).astype(jnp.uint32)
        q = carry_bits >> 5
        rolled1 = pltpu.roll(w_pad, 1, axis=1)
        sh = jnp.right_shift(w_pad, r)
        # branch-free funnel carry: (x<<1)<<((31-r)&31) == x<<(32-r)
        # for r>=1 and 0 for r==0 (where(r>0,...) lowers ~10x slower)
        sh = sh | jnp.left_shift(jnp.left_shift(rolled1, 1),
                                 (31 - r) & 31)
        row = q >> 7
        m = q & 127
        rot = pltpu.roll(sh, m, axis=1)                 # dynamic lane rotate
        row0 = jnp.where(lane >= m, rot, 0)
        row1 = jnp.where(lane < m, rot, 0)
        contrib = jnp.concatenate([row0, row1], axis=0)[:, None, :]
        cur = acc_ref[pl.ds(row, 2), :, :]              # [2, 1, 128]
        acc_ref[pl.ds(row, 2), :, :] = cur | contrib
        return carry_bits + nbits

    def body(j, carry_bits):
        w = words_ref[0, pl.ds(j, 1), :]                # [1, BLOCK_WORDS]
        w_pad = jnp.concatenate([w, zpad], axis=1)      # [1, 128]
        return place(carry_bits, w_pad, lens_ref[0, j, 0])

    total = jax.lax.fori_loop(0, bps, body, jnp.int32(0))

    # 1-pad the final partial byte (T.81 F.1.2.3).
    pad = (8 - (total & 7)) & 7
    b = total & 31
    padmask = jnp.where(
        pad > 0,
        jnp.left_shift(
            jnp.left_shift(jnp.uint32(1), pad.astype(jnp.uint32)) - 1,
            (32 - b - pad).astype(jnp.uint32)),
        jnp.uint32(0))
    padvec = jnp.where(lane == 0, padmask, jnp.uint32(0))
    # place() shifts within the word by (offset & 31); feed the already
    # word-aligned mask at the word boundary bit offset.
    place((total >> 5) << 5, padvec, 0)

    bits_ref[0, 0, 0] = total
    out_ref[...] = acc_ref[pl.ds(0, rows), :, :].reshape(1, rows, 1, 128)


def seg_merge(words: jax.Array, lens: jax.Array, n_seg: int, bps: int,
              w_cap: int) -> Tuple[jax.Array, jax.Array]:
    """Per-block streams -> per-segment streams.

    words [n_seg*bps, BLOCK_WORDS] u32, lens [n_seg*bps] i32 ->
    (seg_words [n_seg, rows*128] u32, seg_bits [n_seg] i32) with
    rows = ceil(w_cap/128); capacity must cover the worst segment (caller
    checks the returned seg_bits against it).
    """
    rows = -(-w_cap // 128)
    kernel = functools.partial(_seg_merge_kernel, bps=bps, rows=rows)
    out, bits = pl.pallas_call(
        kernel,
        grid=(n_seg,),
        in_specs=[
            pl.BlockSpec((1, bps, BLOCK_WORDS), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            # per-step scalar reads; SMEM would be ideal but SMEM windows
            # pad each element to a full word-line (1440 scalars -> 1.4MB),
            # so VMEM it is
            pl.BlockSpec((1, bps, 1), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, rows, 1, 128), lambda s: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda s: (s, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_seg, rows, 1, 128), jnp.uint32),
            jax.ShapeDtypeStruct((n_seg, 1, 1), jnp.int32),
        ),
        scratch_shapes=[
            # +2 slack rows so the 2-row RMW window never overruns.
            pltpu.VMEM((rows + 2, 1, 128), jnp.uint32),
        ],
        interpret=_interpret(),
    )(words.reshape(n_seg, bps, BLOCK_WORDS),
      lens.reshape(n_seg, bps, 1))
    return out.reshape(n_seg, rows * 128), bits.reshape(n_seg)
