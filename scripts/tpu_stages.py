#!/usr/bin/env python
"""Per-stage device timing of the production 4K pipeline (amortized
chains), to locate the gap between the stage-sum estimate and the
measured end-to-end frame time.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def sync_time(fn, *args, iters=10):
    import jax
    import jax.numpy as jnp
    probe = jax.jit(lambda o: sum(jnp.sum(x.reshape(-1)[::4099]
                                          .astype(jnp.int32))
                                  for x in jax.tree.leaves(o)))
    float(probe(fn(*args)))

    def chain(k):
        t0 = time.perf_counter()
        for _ in range(k):
            o = fn(*args)
        float(probe(o))
        return time.perf_counter() - t0

    d1 = min(chain(1) for _ in range(3))
    dk = min(chain(iters + 1) for _ in range(2))
    return max((dk - d1) / iters, 1e-9)


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
    restart = 240                        # rows
    n_seg, mps = 135, 240

    f_px = jax.jit(lambda x: fused_dctq.encode_blocks(x, quality,
                                                      subsampling))
    t = sync_time(f_px, imgd)
    log(f"pixel_path: {t * 1e3:.2f} ms")
    coeffs = f_px(imgd)
    n_mcu = coeffs.shape[0]

    def f_sym(c):
        dcd = scan.dc_diffs(c, n_luma, restart).reshape(-1)
        cls = (jnp.arange(n_mcu * b, dtype=jnp.int32) % b >= n_luma)
        return ep.block_pack(c.reshape(-1, 64), cls.astype(jnp.int32), dcd)

    f_sym_j = jax.jit(f_sym)
    t = sync_time(f_sym_j, coeffs)
    log(f"block_pack(+dc_diffs): {t * 1e3:.2f} ms")
    words, blens = f_sym_j(coeffs)
    words = jnp.asarray(np.asarray(words))
    blens = jnp.asarray(np.asarray(blens))

    chunks, _ = ep.mcu_capacity(b, 384)
    f_mm = jax.jit(lambda w_, l_: ep.mcu_merge(w_, l_, b, chunks))
    t = sync_time(f_mm, words, blens)
    log(f"mcu_merge(chunks={chunks}): {t * 1e3:.2f} ms")

    bps = restart * b
    w_cap = -(-bps * 384 // 32)
    f_v3 = jax.jit(lambda w_, l_: ep.seg_merge_v3(
        w_, l_, n_seg, bps, w_cap, blocks_per_mcu=b, mcu_chunks=chunks))
    t = sync_time(f_v3, words, blens)
    log(f"seg_merge_v3 total (incl mcu_merge + XLA pre): {t * 1e3:.2f} ms")
    sw, sb, mx = f_v3(words, blens)
    sw = jnp.asarray(np.asarray(sw))
    sb = jnp.asarray(np.asarray(sb))
    fps = sw.shape[1] // 1024

    f_cp = jax.jit(lambda a, bb: ep.compact_segments(a, bb, fps))
    t = sync_time(f_cp, sw, sb)
    log(f"compact (unstuffed): {t * 1e3:.2f} ms")

    f_cs = jax.jit(lambda a, bb: ep.compact_segments_stuffed(
        a, bb, fps, restart))
    t = sync_time(f_cs, sw, sb)
    log(f"compact_stuffed (incl XLA ff-precompute): {t * 1e3:.2f} ms")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
