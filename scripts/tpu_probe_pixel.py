#!/usr/bin/env python
"""Probe: where does the fused pixel path's 1.5 ms go (layout vs MXU
passes), and what would a bf16 hi+lo 2-pass operator split buy?"""

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

    f_full = jax.jit(lambda x: fused_dctq.encode_blocks(x, quality,
                                                        subsampling))
    t = sync_time(f_full, imgd)
    log(f"full fused pixel path (current): {t * 1e3:.2f} ms")

    # layout only: pad + tiles + cast f32
    def f_tiles(x):
        padded = ops.pad_to_multiple(x, (mh, mw))
        return fused_dctq.mcu_tiles(padded, mh, mw).astype(jnp.float32)
    f_tiles_j = jax.jit(f_tiles)
    t = sync_time(f_tiles_j, imgd)
    log(f"tiles+cast f32 only: {t * 1e3:.2f} ms")
    x32 = jax.block_until_ready(f_tiles_j(imgd))

    m, bias = fused_dctq.mcu_operator(quality, subsampling)
    md = jax.device_put(jnp.asarray(m))
    biasd = jax.device_put(jnp.asarray(bias))

    def round_i32(y):
        return ops.round_half_away(y).astype(jnp.int32)

    for prec in ("default", "highest", "bf16x2", "bf16"):
        if prec == "default":
            f = jax.jit(lambda x: round_i32(x @ md + biasd))
        elif prec == "highest":
            f = jax.jit(lambda x: round_i32(
                jax.lax.dot_general(
                    x, md, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST) + biasd))
        elif prec == "bf16x2":
            m_hi = md.astype(jnp.bfloat16)
            m_lo = (md - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)

            def f2(x):
                xb = x.astype(jnp.bfloat16)
                y = jax.lax.dot_general(
                    xb, m_hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                y = y + jax.lax.dot_general(
                    xb, m_lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return round_i32(y + biasd)
            f = jax.jit(f2)
        else:
            mb = md.astype(jnp.bfloat16)
            f = jax.jit(lambda x: round_i32(
                jax.lax.dot_general(
                    x.astype(jnp.bfloat16), mb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) + biasd))
        t = sync_time(f, x32)
        out = np.asarray(f(x32))
        log(f"matmul[{prec}] on pre-tiled x: {t * 1e3:.2f} ms")
        if prec == "default":
            ref = out
        else:
            d = np.abs(out.astype(np.int64) - ref.astype(np.int64))
            log(f"  vs default: max|d|={d.max()} frac>0={(d > 0).mean():.2e}")

    # fused u8-tiles + bf16x2 end to end (XLA-fused, no f32 x materialized)
    m_hi = md.astype(jnp.bfloat16)
    m_lo = (md - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def f_e2e(x):
        padded = ops.pad_to_multiple(x, (mh, mw))
        xb = fused_dctq.mcu_tiles(padded, mh, mw).astype(jnp.bfloat16)
        y = jax.lax.dot_general(xb, m_hi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = y + jax.lax.dot_general(xb, m_lo, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        return round_i32(y + biasd)
    t = sync_time(jax.jit(f_e2e), imgd)
    log(f"e2e tiles->bf16x2 matmul: {t * 1e3:.2f} ms")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
