"""Fully-fused pixel path: raw RGB MCU -> quantized zigzag coefficients in
ONE matmul.

Every stage of the reference's pixel pipeline is linear in the input pixels:

    CSC (utils.cpp:92-110)            y = W_csc rgb (+128 on chroma)
    2x2 chroma averaging (":113-141)  A_avg (linear)
    level shift -128 (":190-196)      subtract const (the +128 chroma offset
                                      cancels it exactly on Cb/Cr)
    8x8 DCT (":262-348)               C X C^T (linear)
    quantize + zigzag (":454-467,539) diag(1/q), permutation (linear)

so their composition is a single affine map per MCU geometry. For 4:2:0 a
16x16x3 MCU flattens to 768 inputs and produces 6 blocks x 64 zigzag
coefficients = 384 outputs: coeffs = round(X[nM,768] @ M[768,384] + b).
For 4:4:4, 192 -> 192. One f32 matmul saturates the MXU and replaces five
reference kernel launches plus all their host round-trips (SURVEY §3.1);
the only other work is the byte-level MCU tiling transpose.

This is the production path; jpegtpu.core.ops is the stage-by-stage oracle
(tests assert both agree within f32-vs-f64 rounding).
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

from jpegtpu.core import ops, tables


def _interpret() -> bool:
    """Pallas interpreter mode off-TPU (tests on the CPU backend)."""
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=32)
def mcu_operator(quality: int, subsampling: str) -> Tuple[np.ndarray, np.ndarray]:
    """(M [in_dim, out_dim] f32, bias [out_dim] f32).

    Input layout: MCU pixels row-major (y, x, c) flattened. Output layout:
    scan-order blocks x 64 zigzag coefficients (420: Y00,Y01,Y10,Y11,Cb,Cr;
    444: Y,Cb,Cr).
    """
    if subsampling == "420":
        (mh, mw), n_luma = (16, 16), 4
    elif subsampling == "422":
        (mh, mw), n_luma = (8, 16), 2
    elif subsampling in ("444", "444s"):
        # 444s here = in-OPERATOR 2x2 chroma smoothing (round 5): the
        # smoothed sample S[q] is the average of q's 2x2 block, so each
        # input pixel p feeds the chroma DCT rows of ALL FOUR positions
        # of its block at weight 0.25 — exactly the 420 trick with
        # full-resolution output. VALID ONLY when the image needs no
        # padding and has no odd edges (H % 8 == 0 and W % 8 == 0 —
        # every production video size): with padding or odd dims the
        # reference smooths BEFORE mirror-padding and passes odd edges
        # through, which a uniform per-MCU operator cannot express
        # (callers fall back to ops there; see encode_blocks).
        (mh, mw), n_luma = (8, 8), 1
    else:
        raise ValueError(f"unsupported fused subsampling {subsampling!r}")
    in_dim = mh * mw * 3
    out_dim = (n_luma + 2) * 64

    m_l, b_l = tables.fused_block_operator(quality, chroma=False)
    m_c, _ = tables.fused_block_operator(quality, chroma=True)
    m_l = m_l.astype(np.float64)
    m_c = m_c.astype(np.float64)
    w = tables.CSC_MATRIX.astype(np.float64)      # [rgb_c, ycc_c]

    big = np.zeros((in_dim, out_dim), np.float64)
    bias = np.zeros(out_dim, np.float64)

    ys, xs = np.mgrid[0:mh, 0:mw]
    for c in range(3):
        pix = (ys * mw + xs) * 3 + c              # input index per (y, x)
        # Luma blocks: passthrough samples, raster order within the MCU.
        for blk in range(n_luma):
            by, bx = divmod(blk, mw // 8)
            sel = (slice(by * 8, by * 8 + 8), slice(bx * 8, bx * 8 + 8))
            samp = (ys[sel] % 8) * 8 + (xs[sel] % 8)
            big[pix[sel].ravel(), blk * 64:(blk + 1) * 64] += \
                w[c, 0] * m_l[samp.ravel(), :]
        # Chroma blocks: (possibly averaged) samples. The +128 chroma offset
        # cancels the -128 level shift exactly, so no bias term.
        if subsampling == "420":
            m_sel = m_c[((ys // 2) * 8 + (xs // 2)).ravel(), :]
            scale = 0.25
        elif subsampling == "422":
            m_sel = m_c[(ys * 8 + (xs // 2)).ravel(), :]
            scale = 0.5
        elif subsampling == "444s":
            # pixel p contributes to its block's 4 sample rows (see the
            # dispatch comment): sum the 4 DCT rows, weight 0.25
            by, bx = (ys // 2) * 2, (xs // 2) * 2
            m_sel = sum(
                m_c[((by + dy) * 8 + (bx + dx)).ravel(), :]
                for dy in (0, 1) for dx in (0, 1))
            scale = 0.25
        else:
            m_sel = m_c[(ys * 8 + xs).ravel(), :]
            scale = 1.0
        for comp, col in ((1, n_luma), (2, n_luma + 1)):
            big[pix.ravel(), col * 64:(col + 1) * 64] += \
                scale * w[c, comp] * m_sel

    for blk in range(n_luma):
        bias[blk * 64:(blk + 1) * 64] = b_l
    return big.astype(np.float32), bias.astype(np.float32)


def mcu_tiles(img: jax.Array, mh: int, mw: int) -> jax.Array:
    """[..., H, W, C] (padded) -> [..., nMCU, mh*mw*C]."""
    *b, h, w, ch = img.shape
    x = img.reshape(*b, h // mh, mh, w // mw, mw, ch)
    x = jnp.swapaxes(x, -4, -3)
    return x.reshape(*b, (h // mh) * (w // mw), mh * mw * ch)


def _pixel_kernel(x_ref, m_ref, b_ref, o_ref, scr, *, r_blk, nrx, mh,
                  row_bytes):
    """One MCU-geometry matmul straight from the natural image layout.

    x_ref [r_blk, mh, nrx, row_bytes] i8 is a FREE reshape of the padded
    image XOR 0x80 (x - 128 in i8; Mosaic cannot cast u8 -> f32, so the
    exact u8 values are restored as f + 128.0 — exact in f32). Each MCU
    row assembles its [nrx, in_dim] tile matrix in VMEM scratch (static
    unaligned lane writes) and runs ONE K=in_dim MXU matmul — the
    [nMCU, in_dim] tile tensor never exists in HBM, killing the byte
    tiling transpose that dominated the XLA formulation (~1.1 of 1.5 ms;
    scripts/tpu_probe_pixel*, tpu_probe_pixel_pallas).
    """
    for b in range(r_blk):
        for y in range(mh):
            scr[:, y * row_bytes:(y + 1) * row_bytes] = \
                x_ref[b, y].astype(jnp.float32) + 128.0
        acc = jnp.dot(scr[...], m_ref[...],
                      preferred_element_type=jnp.float32) + b_ref[...]
        r = jnp.sign(acc) * jnp.floor(jnp.abs(acc) + 0.5)
        o_ref[b * nrx:(b + 1) * nrx, :] = r.astype(jnp.int32)


def encode_blocks_pallas(img: jax.Array, quality: int,
                         subsampling: str) -> jax.Array:
    """Production pixel path: bit-identical to encode_blocks (the XLA
    twin, asserted in tests/test_kernels.py and on hardware by
    scripts/tpu_bisect.py), computed by a Pallas kernel that never
    materializes the MCU tile matrix. Falls back to the XLA path for
    geometries the kernel does not cover."""
    y = encode_blocks_pallas_pairs(img, quality, subsampling)
    *b, n_mcu, out_dim = y.shape
    return y.reshape(*b, n_mcu, out_dim // 64, 64)


def encode_blocks_pairs(img: jax.Array, quality: int,
                        subsampling: str) -> jax.Array:
    """Production pixel path in the pairs/native layout: [..., nMCU,
    B*64] with block-major columns (block i's zigzag slots at columns
    [64i, 64i+64)) — exactly the pair-major device input of
    entropy_pack.block_pack_mcu ([T, G2*128]: pair p's 128 lanes hold
    blocks 2p/2p+1), so downstream consumes it with zero relayout.

    Computed by the XLA fused path — since round 3 this is the ORACLE /
    fallback tier; production is encode_blocks_pallas_nat_pairs (the
    natural-layout kernel, selected by EncoderConfig.pixel_path). An
    in-context device-trace A/B (scripts/tpu_trace_ab.py, tpu_ab_pixel.
    py) showed XLA fuses the MCU tiling into neighbors down to ~0.25
    ms/4K frame, while the 4D-input Pallas pixel kernel — 8x faster
    STANDALONE (0.21 vs 1.75 ms) — carries ~0.45 ms of un-fusable input
    prep in the full program: 6.7 vs 7.1 ms/frame whole-pipeline.
    encode_blocks_pallas_pairs keeps that variant as the
    negative-result record."""
    c = encode_blocks(img, quality, subsampling)
    *b, n_mcu, nb, _ = c.shape
    return c.reshape(*b, n_mcu, nb * 64)


def _pixel_geometry(img: jax.Array, quality: int, subsampling: str):
    """Shared setup for the Pallas pixel kernels: (padded image, batch
    dims, operator m/bias, and the MCU-row grid numbers). r_blk keeps
    ~1k MCUs per grid step, bounded by VMEM."""
    mh, mw = ops.mcu_shape(subsampling)
    row_bytes = mw * 3
    m, bias = mcu_operator(quality, subsampling)
    padded = ops.pad_to_multiple(jnp.asarray(img), (mh, mw))
    *b, h, w, _ = padded.shape
    nry, nrx = h // mh, w // mw
    bsz = int(np.prod(b)) if b else 1
    rows = bsz * nry
    r_blk = max(1, min(8, -(-960 // nrx)))
    pad_rows = (-rows) % r_blk
    return (padded, b, m, bias, mh, row_bytes, mh * row_bytes,
            m.shape[1], nry * nrx, nrx, rows, r_blk, pad_rows)


def encode_blocks_pallas_pairs(img: jax.Array, quality: int,
                               subsampling: str) -> jax.Array:
    """encode_blocks_pallas in the kernel's NATIVE pairs layout (see
    encode_blocks_pairs). Bit-identical to the XLA twin on hardware
    (scripts/tpu_probe_pixel_pallas.py: exact u8 operand restore); falls
    back to the XLA path for geometries the kernel does not cover."""
    if subsampling != "420":
        c = encode_blocks(img, quality, subsampling)
        *b, n_mcu, nb, _ = c.shape
        return c.reshape(*b, n_mcu, nb * 64)
    (padded, b, m, bias, mh, row_bytes, in_dim, out_dim, n_mcu, nrx,
     rows, r_blk, pad_rows) = _pixel_geometry(img, quality, subsampling)
    x = (padded ^ jnp.uint8(0x80)).view(jnp.int8)
    x = x.reshape(rows, mh, nrx, row_bytes)
    if pad_rows:
        x = jnp.concatenate(
            [x, jnp.zeros((pad_rows, mh, nrx, row_bytes), jnp.int8)])
    grid_rows = rows + pad_rows
    kernel = functools.partial(_pixel_kernel, r_blk=r_blk, nrx=nrx,
                               mh=mh, row_bytes=row_bytes)
    y = pl.pallas_call(
        kernel,
        grid=(grid_rows // r_blk,),
        in_specs=[
            pl.BlockSpec((r_blk, mh, nrx, row_bytes), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_dim, out_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_blk * nrx, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid_rows * nrx, out_dim),
                                       jnp.int32),
        scratch_shapes=[pltpu.VMEM((nrx, in_dim), jnp.float32)],
        interpret=_interpret(),
    )(x, jnp.asarray(m), jnp.asarray(bias.reshape(1, out_dim)))
    y = y[:rows * nrx]
    return y.reshape(*b, n_mcu, out_dim)


def _pixel_kernel_dma(x_ref, m_ref, b_ref, o_ref, xbuf, scr, sem,
                      *, r_blk, nrx, mh, row_bytes, n_steps):
    """_pixel_kernel with the tile relayout moved into the INPUT DMA.

    x_ref is the raw padded u8 image left in HBM (memory_space=ANY),
    logically [rows, mh, nrx, row_bytes] — a free metadata reshape of
    [H, W*3]; each grid step DMAs one [r_blk, ...] slab into VMEM
    (double-buffered), and the DMA engine performs the HBM-row-major ->
    VMEM-tile scatter. This kills the HBM materialization of the tiled
    operand layout that XLA inserts for a blocked VMEM in_spec (the
    ~1.29 ms/4K 'pixel tiling' cost, docs/PERF.md): the only HBM traffic
    is one read of the image. The u8 -> centered-i8 xor also moves
    in-kernel (bitcast + XOR), removing the XLA byte pass."""
    i = pl.program_id(0)

    def in_copy(step, slot):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(step * r_blk, r_blk)], xbuf.at[slot],
            sem.at[slot])

    @pl.when(i == 0)
    def _():
        in_copy(0, 0).start()
    in_copy(i, i & 1).wait()

    @pl.when(i + 1 < n_steps)
    def _():
        in_copy(i + 1, (i + 1) & 1).start()

    for b in range(r_blk):
        for y in range(mh):
            v = pltpu.bitcast(xbuf[i & 1, b, y], jnp.int8) ^ jnp.int8(-128)
            scr[:, y * row_bytes:(y + 1) * row_bytes] = \
                v.astype(jnp.float32) + 128.0
        acc = jnp.dot(scr[...], m_ref[...],
                      preferred_element_type=jnp.float32) + b_ref[...]
        r = jnp.sign(acc) * jnp.floor(jnp.abs(acc) + 0.5)
        o_ref[b * nrx:(b + 1) * nrx, :] = r.astype(jnp.int32)


def encode_blocks_pallas_dma_pairs(img: jax.Array, quality: int,
                                   subsampling: str) -> jax.Array:
    """encode_blocks_pallas_pairs with kernel-managed input DMAs (see
    _pixel_kernel_dma) — the VERDICT-r2 'transpose inside the kernel
    input path' candidate. Bit-identical to the XLA twin in interpret
    mode.

    HARDWARE NEGATIVE RESULT (2026-08-19): Mosaic rejects the input DMA
    on a real chip — "Slice shape along dimension 3 must be aligned to
    tiling (128), but is 48". The ANY-space HBM operand gets an (8,128)-
    tiled layout, and every dim of a memref slice must align to it. No
    4D view of the 4:2:0 image can satisfy that: grouping g MCUs per
    lane block needs 48*g % 128 == 0 (=> g % 8 == 0, since
    48g = 128k => 3g = 8k) AND a sublane dim 240/g % 8 == 0 (=> g <= 30
    and g | 30) — contradictory, so the DMA-engine-scatter formulation
    is impossible for this geometry, not merely unimplemented. The
    remaining route to killing the ~1.29 ms XLA tiling materialization
    is an IN-KERNEL relayout from the natural [rows, W*3] layout (row
    slabs are trivially aligned), which costs a lanes->sublanes
    transpose in VMEM instead."""
    if subsampling != "420":
        c = encode_blocks(img, quality, subsampling)
        *b, n_mcu, nb, _ = c.shape
        return c.reshape(*b, n_mcu, nb * 64)
    (padded, b, m, bias, mh, row_bytes, in_dim, out_dim, n_mcu, nrx,
     rows, r_blk, pad_rows) = _pixel_geometry(img, quality, subsampling)
    x = padded.reshape(rows, mh, nrx, row_bytes)       # free metadata view
    if pad_rows:
        x = jnp.concatenate(
            [x, jnp.zeros((pad_rows, mh, nrx, row_bytes), jnp.uint8)])
    grid_rows = rows + pad_rows
    n_steps = grid_rows // r_blk
    kernel = functools.partial(_pixel_kernel_dma, r_blk=r_blk, nrx=nrx,
                               mh=mh, row_bytes=row_bytes, n_steps=n_steps)
    y = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # image stays in HBM
            pl.BlockSpec((in_dim, out_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_blk * nrx, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid_rows * nrx, out_dim),
                                       jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, r_blk, mh, nrx, row_bytes), jnp.uint8),
            pltpu.VMEM((nrx, in_dim), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(x, jnp.asarray(m), jnp.asarray(bias.reshape(1, out_dim)))
    y = y[:rows * nrx]
    return y.reshape(*b, n_mcu, out_dim)


# Round-5 candidate (VERDICT r4 #3): emit the per-block DC plane as a
# second pixel-kernel output so the encoder's dc_diffs_from_dc consumes
# a [nMCU, 8] tensor instead of strided-slicing coeffs[:, ::64].
# TESTED NEGATIVE RESULT on HW (2026-08-20, scripts/ab_pixel_dc.log,
# byte-identical at 420/444/422): the in-kernel extraction (B width-1
# lane slices + concat per MCU row — Mosaic register relayouts) costs
# FAR more than the strided read it replaces: 420 3.00-3.54 ->
# 3.83-4.05 ms/frame, 444 7.21 -> 8.41, 422 5.11 -> 5.42. Default OFF;
# kept selectable as the negative-result record.
_PIXEL_DC = os.environ.get("JPEGTPU_PIXEL_DC", "0") != "0"
_DC_LANES = 8                                    # padded DC-plane lanes


def _pixel_kernel_nat_dc(x_ref, m_ref, b_ref, o_ref, dc_ref, scr, *,
                         r_blk, nrx, mh, row_bytes, grp, nb):
    """_pixel_kernel_nat emitting (coeffs, DC plane). The DC of block k
    is the coefficient at lane 64k; static width-1 lane slices gather
    them into dc_ref [*, _DC_LANES] (lanes >= nb zero)."""
    ng = nrx // grp
    gb = grp * row_bytes
    for b in range(r_blk):
        v = pltpu.bitcast(x_ref[b * mh:(b + 1) * mh, :], jnp.int8) ^ \
            jnp.int8(-128)
        z = v.astype(jnp.float32) + 128.0
        r2 = jnp.swapaxes(z.reshape(mh, ng, gb), 0,
                          1).reshape(ng, mh * gb)
        cols = []
        for i in range(grp):
            sl = [r2[:, y * gb + i * row_bytes:
                     y * gb + (i + 1) * row_bytes]
                  for y in range(mh)]
            cols.append(jnp.concatenate(sl, axis=1))
        scr[...] = jnp.stack(cols, axis=1).reshape(nrx, mh * row_bytes)
        acc = jnp.dot(scr[...], m_ref[...],
                      preferred_element_type=jnp.float32) + b_ref[...]
        r = jnp.sign(acc) * jnp.floor(jnp.abs(acc) + 0.5)
        ri = r.astype(jnp.int32)
        o_ref[b * nrx:(b + 1) * nrx, :] = ri
        dcs = [ri[:, 64 * k:64 * k + 1] for k in range(nb)]
        dcs.append(jnp.zeros((nrx, _DC_LANES - nb), jnp.int32))
        dc_ref[b * nrx:(b + 1) * nrx, :] = jnp.concatenate(dcs, axis=1)


def _pixel_kernel_nat(x_ref, m_ref, b_ref, o_ref, scr, *, r_blk, nrx, mh,
                      row_bytes, grp):
    """Pixel kernel consuming the image in its NATURAL row-major layout.

    x_ref [r_blk*mh, nrx*row_bytes] u8 is a plain row-slab of the padded
    image — every block dim is (8,128)-aligned, so XLA hands the pallas
    operand over WITHOUT materializing a relayout (the ~1.29 ms/4K cost
    of the XLA tiling chain, docs/PERF.md; the DMA-scatter route is
    provably impossible, see encode_blocks_pallas_dma_pairs). The
    lanes->sublanes MCU tiling transpose happens INSIDE the kernel as a
    Mosaic register relayout, in the one formulation Mosaic accepts on
    hardware (scripts/tpu_probe_pixel_nat.py, probe P3 — the direct
    [mh, nrx, row_bytes] lane split is an unaligned shape cast and is
    REJECTED): 128-aligned `grp`-MCU group split + swapaxes, then static
    row_bytes-lane slices re-stacked per in-group MCU index; finally one
    MXU matmul. grp = 128 / gcd(128, row_bytes) MCUs per lane group
    (8 for 420/422's 48 B rows, 16 for 444's 24 B rows)."""
    ng = nrx // grp                                  # grp-MCU lane groups
    gb = grp * row_bytes                             # 128-aligned
    for b in range(r_blk):
        v = pltpu.bitcast(x_ref[b * mh:(b + 1) * mh, :], jnp.int8) ^ \
            jnp.int8(-128)
        z = v.astype(jnp.float32) + 128.0            # exact u8 restore
        # [mh, ng, gb] -> [ng, mh*gb]: aligned (gb is a 128 multiple)
        r2 = jnp.swapaxes(z.reshape(mh, ng, gb), 0,
                          1).reshape(ng, mh * gb)
        # r2[g, y*gb + i*rb + c] = z[y, g*grp+i, c]; gather each in-group
        # MCU i's rows via static rb-lane slices, stack -> tile matrix.
        cols = []
        for i in range(grp):
            sl = [r2[:, y * gb + i * row_bytes:
                     y * gb + (i + 1) * row_bytes]
                  for y in range(mh)]
            cols.append(jnp.concatenate(sl, axis=1))  # [ng, mh*rb]
        scr[...] = jnp.stack(cols, axis=1).reshape(nrx, mh * row_bytes)
        acc = jnp.dot(scr[...], m_ref[...],
                      preferred_element_type=jnp.float32) + b_ref[...]
        r = jnp.sign(acc) * jnp.floor(jnp.abs(acc) + 0.5)
        o_ref[b * nrx:(b + 1) * nrx, :] = r.astype(jnp.int32)


def encode_blocks_pallas_nat_pairs(img: jax.Array, quality: int,
                                   subsampling: str,
                                   with_dc: bool = False):
    """encode_blocks_pairs computed by the natural-layout Pallas kernel
    (_pixel_kernel_nat). Bit-identical to the XLA twin; falls back to
    the XLA path for geometries the kernel does not cover.

    with_dc: also return the [nMCU, 8] DC plane (lanes >= B zero) from
    the same kernel pass (_pixel_kernel_nat_dc) so dc_diffs never
    strided-reads the full coefficient tensor; returns (coeffs, dc) —
    dc is None on the fallback paths (callers slice instead).

    NOTE: the fused operator expects MCU pixels flattened (y, x, c); the
    in-kernel swapaxes yields (x-major within row_bytes) == the same
    (y, x, c) order per MCU row, since row_bytes = mw*3 spans one MCU's
    row exactly: scr[j, y*row_bytes + (x*3+c)] = img[.., y, j*mw+x, c]."""
    nat_ok = subsampling in ("420", "422", "444") or (
        subsampling == "444s" and
        not (img.shape[-3] % 8 or img.shape[-2] % 8))
    if not nat_ok:
        c = encode_blocks(img, quality, subsampling)
        *b, n_mcu, nb, _ = c.shape
        y = c.reshape(*b, n_mcu, nb * 64)
        return (y, None) if with_dc else y
    (padded, b, m, bias, mh, row_bytes, in_dim, out_dim, n_mcu, nrx,
     rows, r_blk, pad_rows) = _pixel_geometry(img, quality, subsampling)
    grp = 128 // np.gcd(128, row_bytes)  # MCUs per 128-aligned lane group
    if nrx % grp:                        # P3 needs whole lane groups
        y = encode_blocks_pairs(img, quality, subsampling)
        return (y, None) if with_dc else y
    *_, h, w, _c3 = padded.shape
    x = padded.reshape(rows * mh, nrx * row_bytes)     # free row-major view
    if pad_rows:
        x = jnp.concatenate(
            [x, jnp.zeros((pad_rows * mh, nrx * row_bytes), jnp.uint8)])
    grid_rows = rows + pad_rows
    in_specs = [
        pl.BlockSpec((r_blk * mh, nrx * row_bytes), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((in_dim, out_dim), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, out_dim), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = (x, jnp.asarray(m), jnp.asarray(bias.reshape(1, out_dim)))
    if with_dc:
        kernel = functools.partial(_pixel_kernel_nat_dc, r_blk=r_blk,
                                   nrx=nrx, mh=mh, row_bytes=row_bytes,
                                   grp=grp, nb=out_dim // 64)
        y, dc = pl.pallas_call(
            kernel,
            grid=(grid_rows // r_blk,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((r_blk * nrx, out_dim), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r_blk * nrx, _DC_LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)),
            out_shape=(
                jax.ShapeDtypeStruct((grid_rows * nrx, out_dim),
                                     jnp.int32),
                jax.ShapeDtypeStruct((grid_rows * nrx, _DC_LANES),
                                     jnp.int32)),
            scratch_shapes=[pltpu.VMEM((nrx, in_dim), jnp.float32)],
            interpret=_interpret(),
        )(*args)
        return (y[:rows * nrx].reshape(*b, n_mcu, out_dim),
                dc[:rows * nrx].reshape(*b, n_mcu, _DC_LANES))
    kernel = functools.partial(_pixel_kernel_nat, r_blk=r_blk, nrx=nrx,
                               mh=mh, row_bytes=row_bytes, grp=grp)
    y = pl.pallas_call(
        kernel,
        grid=(grid_rows // r_blk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((r_blk * nrx, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid_rows * nrx, out_dim),
                                       jnp.int32),
        scratch_shapes=[pltpu.VMEM((nrx, in_dim), jnp.float32)],
        interpret=_interpret(),
    )(*args)
    y = y[:rows * nrx]
    return y.reshape(*b, n_mcu, out_dim)


def encode_blocks(img: jax.Array, quality: int, subsampling: str) -> jax.Array:
    """uint8 RGB [..., H, W, 3] -> int32 [..., nMCU, B, 64] scan-order
    quantized zigzag coefficients — identical to ops.encode_blocks, computed
    as one fused matmul."""
    if subsampling == "gray" or (
            subsampling == "444s" and
            (img.shape[-3] % 8 or img.shape[-2] % 8)):
        # gray is already a single matmul in ops. 444s takes the fused
        # in-operator-smoothing path ONLY for 8-aligned images (no
        # padding, no odd edges — see the mcu_operator "444s" branch);
        # otherwise the staged oracle reproduces the reference's
        # smooth-before-pad + odd-edge-passthrough semantics exactly.
        # (Round-5 note: a general fused form feeding an explicitly
        # smoothed f32 image was HW-measured in three formulations and
        # every one lost ~28 ms/4K to the MCU-tiles transpose of f32
        # operands — ab_444s{,2,3}.log; u8 input + in-operator
        # averaging is the only fast formulation.)
        return ops.encode_blocks(img, quality, subsampling)
    mh, mw = ops.mcu_shape(subsampling)
    n_luma = {"420": 4, "422": 2}.get(subsampling, 1)
    m, bias = mcu_operator(quality, subsampling)
    padded = ops.pad_to_multiple(jnp.asarray(img), (mh, mw))
    x = mcu_tiles(padded, mh, mw).astype(jnp.float32)
    y = x @ jnp.asarray(m) + jnp.asarray(bias)
    y = ops.round_half_away(y).astype(jnp.int32)
    *b, n, _ = y.shape
    return y.reshape(*b, n, n_luma + 2, 64)
