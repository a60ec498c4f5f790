#!/usr/bin/env python
"""Follow-up stage timings: new block_pack (tile 256 + exp size category),
and compact_stuffed split into XLA precompute vs Pallas kernel."""

import os
import sys
import time

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
    restart, n_seg = 240, 135

    f_px = jax.jit(lambda x: fused_dctq.encode_blocks(x, quality,
                                                      subsampling))
    coeffs = f_px(imgd)
    n_mcu = coeffs.shape[0]

    def f_sym(c):
        dcd = scan.dc_diffs(c, n_luma, restart).reshape(-1)
        cls = (jnp.arange(n_mcu * b, dtype=jnp.int32) % b >= n_luma)
        return ep.block_pack(c.reshape(-1, 64), cls.astype(jnp.int32), dcd)

    f_sym_j = jax.jit(f_sym)
    t = sync_time(f_sym_j, coeffs)
    log(f"block_pack NEW (tile {ep._TILE}, exp size): {t * 1e3:.2f} ms")
    words, blens = f_sym_j(coeffs)
    words = jnp.asarray(np.asarray(words))
    blens = jnp.asarray(np.asarray(blens))

    chunks, _ = ep.mcu_capacity(b, 384)
    bps = restart * b
    w_cap = -(-bps * 384 // 32)
    f_v3 = jax.jit(lambda w_, l_: ep.seg_merge_v3(
        w_, l_, n_seg, bps, w_cap, blocks_per_mcu=b, mcu_chunks=chunks))
    sw, sb, mx = f_v3(words, blens)
    sw = jnp.asarray(np.asarray(sw))
    sb = jnp.asarray(np.asarray(sb))
    fps = sw.shape[1] // 1024

    mnum = np.where(np.arange(n_seg) != n_seg - 1,
                    0xD0 + (np.arange(n_seg) % 8), 0).astype(np.int32)
    f_pre = jax.jit(lambda a, bb: ep._stuff_precompute(a, bb, fps, mnum))
    t = sync_time(f_pre, sw, sb)
    log(f"stuff XLA precompute alone: {t * 1e3:.2f} ms")

    f_cs = jax.jit(lambda a, bb: ep.compact_segments_stuffed(
        a, bb, fps, restart))
    t = sync_time(f_cs, sw, sb)
    log(f"compact_stuffed total: {t * 1e3:.2f} ms")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
