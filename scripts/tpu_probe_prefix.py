#!/usr/bin/env python
"""Probe: how much of block_pack_mcu is the HIGHEST-precision prefix
matmuls? Times the kernel as-is vs with DEFAULT-precision prefix
(wrong bytes, same op structure) to bound the available win."""

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

    from jpegtpu.entropy import scan
    from jpegtpu.kernels import entropy_pack as ep
    from jpegtpu.kernels import fused_dctq

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    img = np.clip(base[..., None] + rng.normal(0, 12, (h, w, 3)),
                  0, 255).astype(np.uint8)
    imgd = jax.device_put(jnp.asarray(img))

    quality, subsampling, n_luma, b = 90, "420", 4, 6
    restart = 240

    f_px = jax.jit(lambda x: fused_dctq.encode_blocks(x, quality,
                                                      subsampling))
    coeffs = jax.block_until_ready(f_px(imgd))
    n_mcu = coeffs.shape[0]
    chunks, _ = ep.mcu_capacity(b, 384)

    def f_sym(c):
        dcd = scan.dc_diffs(c, n_luma, restart).reshape(-1)
        cls = (jnp.arange(n_mcu * b, dtype=jnp.int32) % b >= n_luma)
        return ep.block_pack_mcu(c.reshape(-1, 64), cls.astype(jnp.int32),
                                 dcd, b, chunks)

    t = sync_time(jax.jit(f_sym), coeffs)
    log(f"block_pack_mcu HIGHEST prefix: {t * 1e3:.2f} ms")

    # Variant: DEFAULT-precision prefix matmuls (results wrong; structure
    # identical) -- bounds the MXU-pass share of the runtime.
    orig = ep._prefix64_mm

    def default_mm(x_f32, bd):
        return jax.lax.dot_general(x_f32, bd, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    ep._prefix64_mm = default_mm
    try:
        t = sync_time(jax.jit(lambda c: f_sym(c)), coeffs)
        log(f"block_pack_mcu DEFAULT prefix (invalid bytes): "
            f"{t * 1e3:.2f} ms")
    finally:
        ep._prefix64_mm = orig
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
