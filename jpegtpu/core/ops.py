"""Pure-JAX pixel-path ops — the oracle tier of the framework.

Covers the reference's CPU pipeline stages (SURVEY §2.2-2.8, call stack §3.2)
as vectorized, jit-able array ops over whole images:

    RGB->YCbCr (performCSC, src/utils.cpp:92-110)
    chroma smoothing / true 4:2:0 (performCDS, src/utils.cpp:113-141; true
        4:2:0 structure is a capability the reference lacks, SURVEY §2.3)
    mirror padding (copyToLargerImage/addReversedPadding, src/utils.cpp:199-233)
    level shift + 8x8 DCT + quantize + zigzag (src/utils.cpp:190-196,262-348,
        454-467,539-558) — fused into one [N,64]x[64,64] MXU matmul, see
        jpegtpu.core.tables.fused_block_operator.

The Pallas kernel tier (jpegtpu.kernels) computes identical coefficients; the
tests compare both against scipy.fft oracles.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jpegtpu.core import tables


def rgb_to_ycbcr(img: jax.Array) -> jax.Array:
    """[..., H, W, 3] RGB (any float/int dtype) -> float32 YCbCr, full range.

    BT.601 coefficients identical to the reference CPU path
    (src/utils.cpp:92-110). No truncation to u8 here: the reference's
    intermediate u8 cast (:106-108) only loses precision; keeping float is
    both faster on TPU (stays in registers, fuses into the DCT matmul) and
    strictly more accurate.
    """
    rgb = img.astype(jnp.float32)
    return rgb @ jnp.asarray(tables.CSC_MATRIX) + jnp.asarray(tables.CSC_OFFSET)


def smooth_chroma_2x2(ycc: jax.Array) -> jax.Array:
    """Reference-parity chroma smoothing ('444s' mode).

    performCDS (src/utils.cpp:113-141) averages Cb/Cr over each 2x2 quad and
    writes the average back to all four pixels — smoothing at full stored
    resolution, NOT structural 4:2:0 (SURVEY §2.3). Odd right/bottom edges
    pass through untouched, matching the reference's `y < height-1` bound.
    """
    ycc = jnp.asarray(ycc)
    h, w = ycc.shape[-3], ycc.shape[-2]
    he, we = h - h % 2, w - w % 2
    c = ycc[..., :he, :we, 1:]
    c4 = c.reshape(*c.shape[:-3], he // 2, 2, we // 2, 2, 2)
    avg = jnp.mean(c4, axis=(-4, -2), keepdims=True)
    c_s = jnp.broadcast_to(avg, c4.shape).reshape(c.shape)
    out = ycc.at[..., :he, :we, 1:].set(c_s)
    return out


def mcu_shape(subsampling: str):
    """(mcu_height, mcu_width) in pixels for a subsampling mode."""
    return {"420": (16, 16), "422": (8, 16)}.get(subsampling, (8, 8))


def pad_to_multiple(img: jax.Array, multiple) -> jax.Array:
    """Mirror-pad H and W (axes -3, -2 of [..., H, W, C]) up to `multiple`
    (an int, or an (mh, mw) pair for non-square MCUs like 4:2:2).

    Symmetric (edge-inclusive) reflection — the same family of mirror padding
    as addReversedPadding (src/utils.cpp:211-233). Shape-static under jit.
    """
    mh, mw = (multiple, multiple) if isinstance(multiple, int) else multiple
    h, w = img.shape[-3], img.shape[-2]
    ph = (-h) % mh
    pw = (-w) % mw
    if ph == 0 and pw == 0:
        return img
    if ph >= h or pw >= w:  # degenerate tiny images: fall back to edge pad
        mode = "edge"
    else:
        mode = "symmetric"
    pad = [(0, 0)] * (img.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return jnp.pad(img, pad, mode=mode)


def downsample_chroma_422(ycc: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """[..., H, W, 3] (W even) -> (Y, Cb, Cr) with half-WIDTH chroma (2x1
    horizontal averaging — 4:2:2, a mode the reference lacks entirely)."""
    y = ycc[..., 0]
    c = ycc[..., 1:]
    w = c.shape[-2]
    c2 = c.reshape(*c.shape[:-2], w // 2, 2, 2)
    cd = jnp.mean(c2, axis=-2)
    return y, cd[..., 0], cd[..., 1]


def downsample_chroma_420(ycc: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """[..., H, W, 3] (H, W even) -> (Y [...,H,W], Cb, Cr at [...,H/2,W/2]).

    True 4:2:0: 2x2 mean producing half-resolution chroma planes — the
    structural subsampling the reference never implements (SURVEY §2.3).
    """
    y = ycc[..., 0]
    c = ycc[..., 1:]
    h, w = c.shape[-3], c.shape[-2]
    c4 = c.reshape(*c.shape[:-3], h // 2, 2, w // 2, 2, 2)
    cd = jnp.mean(c4, axis=(-4, -2))
    return y, cd[..., 0], cd[..., 1]


def blockify(plane: jax.Array) -> jax.Array:
    """[..., H, W] -> [..., H/8, W/8, 64] raster-order 8x8 blocks, row-major
    within each block (the reference's everyMCUisnow2DArray layout,
    src/utils.cpp:482-498, without the materialized copy)."""
    *b, h, w = plane.shape
    x = plane.reshape(*b, h // 8, 8, w // 8, 8)
    x = jnp.swapaxes(x, -3, -2)
    return x.reshape(*b, h // 8, w // 8, 64)


def round_half_away(x: jax.Array) -> jax.Array:
    """std::round semantics (half away from zero) — matches the reference's
    performQuantization rounding (src/utils.cpp:460-462), unlike jnp.round
    (banker's rounding)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def fused_dct_quant_zigzag(blocks: jax.Array, quality: int, chroma: bool) -> jax.Array:
    """[..., 64] raw samples -> [..., 64] int32 quantized zigzag coefficients.

    One MXU matmul per call: level shift + DCT + quantization + zigzag as the
    affine map from tables.fused_block_operator. Replaces the reference's
    performDCT/performQuantization/performZigZag chain (src/utils.cpp:262-348,
    454-467, 554-558) and its DCTKernel (.cl:103-147) in a single op.
    """
    m, bias = tables.fused_block_operator(quality, chroma)
    y = blocks.astype(jnp.float32) @ jnp.asarray(m) + jnp.asarray(bias)
    return round_half_away(y).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Scan-order block assembly.
# ---------------------------------------------------------------------------

def scan_blocks_444(y: jax.Array, cb: jax.Array, cr: jax.Array) -> jax.Array:
    """Full-res planes [..., H, W] -> [..., nMCU, 3, 64] in scan order.

    Block interleave Y_i, Cb_i, Cr_i per 8x8 MCU — the reference's scan
    structure (HuffmanEncoder, src/utils.cpp:656-698; SURVEY §2.10)."""
    yb = blockify(y)
    cbb = blockify(cb)
    crb = blockify(cr)
    stk = jnp.stack([yb, cbb, crb], axis=-2)          # [..., By, Bx, 3, 64]
    *b, by, bx, s, _ = stk.shape
    return stk.reshape(*b, by * bx, s, 64)


def scan_blocks_422(y: jax.Array, cb: jax.Array, cr: jax.Array) -> jax.Array:
    """Y [..., H, W], Cb/Cr [..., H, W/2] -> [..., nMCU, 4, 64] in scan
    order Y0, Y1, Cb, Cr per 16x8 MCU (T.81 A.2.3 interleave for 2x1)."""
    yb = blockify(y)                                   # [..., By, 2Mx, 64]
    *b, by, bx, _ = yb.shape
    mx = bx // 2
    y2 = yb.reshape(*b, by, mx, 2, 64)
    cbb = blockify(cb)[..., :, :, None, :]             # [..., by, mx, 1, 64]
    crb = blockify(cr)[..., :, :, None, :]
    stk = jnp.concatenate([y2, cbb, crb], axis=-2)     # [..., by, mx, 4, 64]
    return stk.reshape(*b, by * mx, 4, 64)


def scan_blocks_420(y: jax.Array, cb: jax.Array, cr: jax.Array) -> jax.Array:
    """Y [..., H, W], Cb/Cr [..., H/2, W/2] -> [..., nMCU, 6, 64] in scan
    order Y00, Y01, Y10, Y11, Cb, Cr per 16x16 MCU (JPEG interleaved scan,
    ITU-T T.81 A.2.3)."""
    yb = blockify(y)                                   # [..., 2My, 2Mx, 64]
    *b, by, bx, _ = yb.shape
    my, mx = by // 2, bx // 2
    y4 = yb.reshape(*b, my, 2, mx, 2, 64)
    y4 = jnp.moveaxis(y4, -4, -3)                      # [..., my, mx, 2, 2, 64]
    y4 = y4.reshape(*b, my, mx, 4, 64)
    cbb = blockify(cb)[..., :, :, None, :]             # [..., my, mx, 1, 64]
    crb = blockify(cr)[..., :, :, None, :]
    stk = jnp.concatenate([y4, cbb, crb], axis=-2)     # [..., my, mx, 6, 64]
    return stk.reshape(*b, my * mx, 6, 64)


def encode_blocks(img: jax.Array, quality: int, subsampling: str) -> jax.Array:
    """uint8 RGB [..., H, W, 3] (or [..., H, W] for 'gray') -> int32
    [..., nMCU, B, 64] quantized zigzag coefficients in scan order. The
    full pixel path, jit-able end to end."""
    if subsampling == "gray":
        y = jnp.asarray(img).astype(jnp.float32)
        if y.ndim >= 3 and y.shape[-1] == 1:
            y = y[..., 0]
        ypad = pad_to_multiple(y[..., None], 8)[..., 0]
        yb = blockify(ypad)
        *b, by, bx, _ = yb.shape
        coeffs = fused_dct_quant_zigzag(
            yb.reshape(*b, by * bx, 64), quality, chroma=False)
        return coeffs[..., None, :]
    ycc = rgb_to_ycbcr(img)
    if subsampling == "444s":
        ycc = smooth_chroma_2x2(ycc)
    ycc = pad_to_multiple(ycc, mcu_shape(subsampling))
    if subsampling == "420":
        y, cb, cr = downsample_chroma_420(ycc)
        blocks = scan_blocks_420(y, cb, cr)
        n_luma = 4
    elif subsampling == "422":
        y, cb, cr = downsample_chroma_422(ycc)
        blocks = scan_blocks_422(y, cb, cr)
        n_luma = 2
    else:
        blocks = scan_blocks_444(ycc[..., 0], ycc[..., 1], ycc[..., 2])
        n_luma = 1
    lq = fused_dct_quant_zigzag(blocks[..., :n_luma, :], quality, chroma=False)
    cq = fused_dct_quant_zigzag(blocks[..., n_luma:, :], quality, chroma=True)
    return jnp.concatenate([lq, cq], axis=-2)


def mcu_grid(h: int, w: int, subsampling: str) -> Tuple[int, int]:
    """MCU grid (rows, cols) for an image of size h x w."""
    mh, mw = mcu_shape(subsampling)
    return -(-h // mh), -(-w // mw)
