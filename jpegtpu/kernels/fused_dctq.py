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
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jpegtpu.core import ops, tables


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
    elif subsampling == "444":
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
            samp = (ys // 2) * 8 + (xs // 2)
            scale = 0.25
        elif subsampling == "422":
            samp = ys * 8 + (xs // 2)
            scale = 0.5
        else:
            samp = ys * 8 + xs
            scale = 1.0
        for comp, col in ((1, n_luma), (2, n_luma + 1)):
            big[pix.ravel(), col * 64:(col + 1) * 64] += \
                scale * w[c, comp] * m_c[samp.ravel(), :]

    for blk in range(n_luma):
        bias[blk * 64:(blk + 1) * 64] = b_l
    return big.astype(np.float32), bias.astype(np.float32)


def mcu_tiles(img: jax.Array, mh: int, mw: int) -> jax.Array:
    """uint8 [..., H, W, 3] (padded) -> [..., nMCU, mh*mw*3]."""
    *b, h, w, _ = img.shape
    x = img.reshape(*b, h // mh, mh, w // mw, mw, 3)
    x = jnp.swapaxes(x, -4, -3)
    return x.reshape(*b, (h // mh) * (w // mw), mh * mw * 3)


def encode_blocks(img: jax.Array, quality: int, subsampling: str) -> jax.Array:
    """uint8 RGB [..., H, W, 3] -> int32 [..., nMCU, B, 64] scan-order
    quantized zigzag coefficients — identical to ops.encode_blocks, computed
    as one fused matmul."""
    if subsampling in ("444s", "gray"):
        # 444s smoothing has image-global edge semantics that don't fold
        # into a per-MCU operator; gray is already a single matmul in ops.
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
