#!/usr/bin/env python
"""Round-2 final stage timings on the fused path: pixel matmul,
block_pack_mcu (fused B+C), seg_merge_mcu serial phase, compaction with
double-buffered stuffing DMAs."""

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
    restart, n_seg = 240, 135

    f_px = jax.jit(lambda x: fused_dctq.encode_blocks(x, quality,
                                                      subsampling))
    t = sync_time(f_px, imgd)
    log(f"pixel path (fused matmul): {t * 1e3:.2f} ms")
    coeffs = f_px(imgd)
    n_mcu = coeffs.shape[0]

    chunks, _ = ep.mcu_capacity(b, 384)

    def f_sym(c):
        dcd = scan.dc_diffs(c, n_luma, restart).reshape(-1)
        cls = (jnp.arange(n_mcu * b, dtype=jnp.int32) % b >= n_luma)
        return ep.block_pack_mcu(c.reshape(-1, 64), cls.astype(jnp.int32),
                                 dcd, b, chunks)

    f_sym_j = jax.jit(f_sym)
    t = sync_time(f_sym_j, coeffs)
    log(f"block_pack_mcu (fused B+C): {t * 1e3:.2f} ms")
    mwords, mlens = f_sym_j(coeffs)
    mwords = jnp.asarray(np.asarray(mwords))
    mlens = jnp.asarray(np.asarray(mlens))

    bps = restart * b
    w_cap = -(-bps * 384 // 32)
    f_mg = jax.jit(lambda w_, l_: ep.seg_merge_mcu(
        w_, l_, n_seg, restart, w_cap))
    t = sync_time(f_mg, mwords, mlens)
    log(f"seg_merge_mcu (serial window + XLA offsets): {t * 1e3:.2f} ms")
    sw, sb, mx = f_mg(mwords, mlens)
    sw = jnp.asarray(np.asarray(sw))
    sb = jnp.asarray(np.asarray(sb))
    fps = sw.shape[1] // 1024

    f_cs = jax.jit(lambda a, bb: ep.compact_segments_stuffed(
        a, bb, fps, restart))
    t = sync_time(f_cs, sw, sb)
    log(f"compact_stuffed (double-buffered out): {t * 1e3:.2f} ms")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
