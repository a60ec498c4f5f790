"""Pallas fused pixel-path kernel (placeholder delegating to the XLA path).

Will hold the Pallas CSC+subsample+DCT+quant+zigzag kernel over MCU-row
tiles; until it lands, the pure-XLA fused path (jpegtpu.core.ops) is used —
both must always produce identical coefficients (tests enforce this).
"""

from __future__ import annotations

import jax

from jpegtpu.core import ops


def encode_blocks(img: jax.Array, quality: int, subsampling: str) -> jax.Array:
    return ops.encode_blocks(img, quality, subsampling)
