#!/usr/bin/env python
"""Minimal TPU probes to bisect tunnel-wedge vs kernel-compile issues.

Usage: python -u scripts/tpu_probe.py {basic|block|merge|v3}
  basic - device_put + trivial jit (tunnel health)
  block - block_pack (round-1 known-good Pallas kernel)
  merge - mcu_merge with budget chunks (1 chunk)
  v3    - seg_merge_v3 alone, tiny shapes
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
    which = sys.argv[1] if len(sys.argv) > 1 else "basic"
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"backend {jax.default_backend()}")

    x = jax.device_put(jnp.arange(1024, dtype=jnp.int32))
    log("device_put done")
    v = float(jax.jit(lambda a: jnp.sum(a))(x))
    log(f"trivial jit done: {v}")
    if which == "basic":
        return 0

    from jpegtpu.kernels import entropy_pack as ep

    rng = np.random.default_rng(0)
    n_mcu, g = 64, 6
    c = np.zeros((n_mcu * g, 64), np.int32)
    mask = rng.random(c.shape) < 0.15
    c[mask] = rng.integers(-255, 256, mask.sum())
    cls = np.tile(np.array([0, 0, 0, 0, 1, 1], np.int32), n_mcu)
    dcd = rng.integers(-64, 64, n_mcu * g).astype(np.int32)

    t0 = time.time()
    words, blens = ep.block_pack(jnp.asarray(c), jnp.asarray(cls),
                                 jnp.asarray(dcd))
    s = int(jnp.sum(blens))
    log(f"block_pack done in {time.time() - t0:.1f}s (sum bits {s})")
    if which == "block":
        return 0

    t0 = time.time()
    mw, ml = jax.jit(lambda w, l: ep.mcu_merge(w, l, g, 1))(words, blens)
    s = int(jnp.sum(ml))
    log(f"mcu_merge done in {time.time() - t0:.1f}s (sum {s})")
    if which == "merge":
        return 0

    t0 = time.time()
    n_seg, bps, w_cap = 8, 8 * g, 2048
    fn = jax.jit(lambda w, l: ep.seg_merge_v3(
        w, l, n_seg, bps, w_cap, blocks_per_mcu=g, mcu_chunks=1))
    sw, sb, mx = fn(words, blens)
    s = int(jnp.sum(sb))
    log(f"seg_merge_v3 done in {time.time() - t0:.1f}s (sum bits {s})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
