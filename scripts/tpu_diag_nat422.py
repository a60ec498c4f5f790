#!/usr/bin/env python
"""Diagnose the 422 nat-vs-xla in-context scan mismatch: compare the
pixel-path outputs STANDALONE at 4K on hardware (coeffs, not scans).
If standalone already differs -> kernel logic/geometry bug; if it
matches -> in-context miscompile (the int32-placement failure class)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tpu_stages_common import log  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"backend {jax.default_backend()}")

    from jpegtpu.kernels import fused_dctq

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    img = np.clip(base[..., None] + rng.normal(0, 12, (h, w, 3)),
                  0, 255).astype(np.uint8)
    imgd = jax.device_put(jnp.asarray(img))

    for sub in ("422", "444", "420"):
        a = np.asarray(jax.jit(
            lambda x: fused_dctq.encode_blocks_pairs(x, 90, sub))(imgd))
        b = np.asarray(jax.jit(
            lambda x: fused_dctq.encode_blocks_pallas_nat_pairs(
                x, 90, sub))(imgd))
        eq = np.array_equal(a, b)
        log(f"{sub} standalone 4K: equal={eq}")
        if not eq:
            d = np.nonzero(a != b)
            log(f"  {len(d[0])} mismatches; first rows {d[0][:5]}, "
                f"cols {d[1][:5]}")
            log(f"  a={a[d][:8].tolist()} b={b[d][:8].tolist()}")
            nm = a.shape[0]
            rows = np.unique(d[0] // (w // 16))
            log(f"  mcu-row ids hit: {rows[:10].tolist()} of "
                f"{nm // (w // 16)}")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
