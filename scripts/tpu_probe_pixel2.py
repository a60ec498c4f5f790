#!/usr/bin/env python
"""Probe: pixel path as a sum of 16 per-MCU-row-line matmuls — every lhs
slice is a pure reshape of the raster image (no transpose at all)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tpu_stages_common import log, sync_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"backend {jax.default_backend()}")

    from jpegtpu.core import ops
    from jpegtpu.kernels import fused_dctq

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    imgd = jax.device_put(jnp.asarray(img))
    quality, subsampling = 90, "420"
    mh, mw = 16, 16
    nry, nmx = h // mh, w // mw

    m, bias = fused_dctq.mcu_operator(quality, subsampling)
    out_dim = m.shape[1]
    biasd = jax.device_put(jnp.asarray(bias))
    # m rows are (y*mw + x)*3 + c -> [mh, mw*3, out]
    m3 = jax.device_put(jnp.asarray(m.reshape(mh, mw * 3, out_dim)))

    f_ref = jax.jit(lambda x: fused_dctq.encode_blocks(x, quality,
                                                       subsampling))
    ref = np.asarray(jax.block_until_ready(f_ref(imgd)))

    def f_sum16(x):
        # [nry, mh, nmx, mw*3]: pure reshape of the raster image
        x4 = x.reshape(nry, mh, nmx, mw * 3).astype(jnp.float32)
        y = jnp.zeros((nry, nmx, out_dim), jnp.float32)
        for r in range(mh):
            y = y + jax.lax.dot_general(
                x4[:, r], m3[r], (((2,), (0,)), ((), ())))
        y = y.reshape(-1, out_dim) + biasd
        y = ops.round_half_away(y).astype(jnp.int32)
        return y.reshape(y.shape[0], 6, 64)

    fs = jax.jit(f_sum16)
    t = sync_time(fs, imgd)
    out = np.asarray(fs(imgd))
    d = np.abs(out.astype(np.int64) - ref.astype(np.int64))
    log(f"pixel path as sum-of-16 row dots: {t * 1e3:.2f} ms  "
        f"max|d|={d.max()} frac={(d > 0).mean():.2e}")

    def f_batched(x):
        # batch dim = r: [mh, nry, nmx, mw*3] needs a transpose of axes
        # (1,0) on the reshape -- test whether XLA handles it better than
        # the big MCU transpose
        x4 = x.reshape(nry, mh, nmx, mw * 3).astype(jnp.float32)
        x4 = jnp.swapaxes(x4, 0, 1)
        y = jax.lax.dot_general(
            x4, m3, (((3,), (1,)), ((0,), (0,))))     # [mh, nry, nmx, out]
        y = jnp.sum(y, axis=0).reshape(-1, out_dim) + biasd
        y = ops.round_half_away(y).astype(jnp.int32)
        return y.reshape(y.shape[0], 6, 64)

    fb = jax.jit(f_batched)
    t = sync_time(fb, imgd)
    out = np.asarray(fb(imgd))
    d = np.abs(out.astype(np.int64) - ref.astype(np.int64))
    log(f"pixel path as batched-16 dot + sum: {t * 1e3:.2f} ms  "
        f"max|d|={d.max()} frac={(d > 0).mean():.2e}")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
