#!/usr/bin/env python
"""Diff seg_merge_v3 on real TPU vs interpret mode on identical inputs.

Prints per-segment first-mismatch positions to localize Mosaic-specific
corruption. Run: timeout 580 python -u scripts/tpu_debug_v3.py [n_seg mps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    n_seg = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"backend {jax.default_backend()}  n_seg={n_seg} mps={mps}")

    from jpegtpu.kernels import entropy_pack as ep

    g = 6
    rng = np.random.default_rng(0)
    n_mcu = n_seg * mps
    c = np.zeros((n_mcu * g, 64), np.int32)
    mask = rng.random(c.shape) < 0.15
    c[mask] = rng.integers(-255, 256, mask.sum())
    cls = np.tile(np.array([0, 0, 0, 0, 1, 1], np.int32), n_mcu)
    dcd = rng.integers(-64, 64, n_mcu * g).astype(np.int32)

    words, blens = ep.block_pack(jnp.asarray(c), jnp.asarray(cls),
                                 jnp.asarray(dcd))
    words = jnp.asarray(np.asarray(words))   # materialize
    blens = jnp.asarray(np.asarray(blens))
    log("block_pack done")

    bps = mps * g
    w_cap = 4096  # 5 frames: exercises several flushes per segment
    t0 = time.time()
    fn = jax.jit(lambda w, l: ep.seg_merge_v3(
        w, l, n_seg, bps, w_cap, blocks_per_mcu=g, mcu_chunks=1))
    sw_t, sb_t, mx_t = fn(words, blens)
    sw_t = np.asarray(sw_t)
    sb_t = np.asarray(sb_t)
    log(f"TPU v3 done in {time.time() - t0:.1f}s")

    orig = ep._interpret
    ep._interpret = lambda: True
    try:
        sw_i, sb_i, mx_i = ep.seg_merge_v3(
            words, blens, n_seg, bps, w_cap, blocks_per_mcu=g, mcu_chunks=1)
        sw_i = np.asarray(sw_i)
        sb_i = np.asarray(sb_i)
    finally:
        ep._interpret = orig
    log("interpret v3 done")

    ok = True
    if not np.array_equal(sb_t, sb_i):
        log(f"seg_bits differ: tpu {sb_t} vs int {sb_i}")
        ok = False
    for s in range(n_seg):
        n = (int(sb_i[s]) + 31) // 32
        d = np.flatnonzero(sw_t[s, :n] != sw_i[s, :n])
        if d.size:
            ok = False
            log(f"seg {s}: {d.size}/{n} words differ, first at word "
                f"{d[0]} (frame {d[0] // 1024}), "
                f"tpu={sw_t[s, d[0]]:08x} int={sw_i[s, d[0]]:08x}")
    log("MATCH" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
