#!/usr/bin/env python
"""Explain the oracle:subsample outlier (docs/PERF.md: 17.6 ms vs 1.4 ms
for the whole fused pixel path) by timing formulation variants on TPU.

Amortized chained timing per the repo methodology (bench.py).
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
    probe = jax.jit(lambda o: sum(jnp.sum(x.astype(jnp.int32))
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
    from jpegtpu.core import ops

    log(f"backend {jax.default_backend()}")
    h, w = 2176, 3840                       # padded 4K
    rng = np.random.default_rng(0)
    ycc = jax.device_put(jnp.asarray(
        rng.normal(128, 40, (h, w, 3)).astype(np.float32)))

    f_cur = jax.jit(ops.downsample_chroma_420)
    t = sync_time(f_cur, ycc)
    log(f"current (reshape-mean, [H,W,3] in): {t * 1e3:.2f} ms")

    def via_slices(x):
        y = x[..., 0]
        c = x[..., 1:]
        cd = (c[0::2, 0::2] + c[0::2, 1::2] +
              c[1::2, 0::2] + c[1::2, 1::2]) * 0.25
        return y, cd[..., 0], cd[..., 1]

    t = sync_time(jax.jit(via_slices), ycc)
    log(f"strided slices, [H,W,3] in: {t * 1e3:.2f} ms")

    # channel-split inputs (planes first): is the minor channel dim the
    # problem?
    planes = jax.device_put(jnp.asarray(
        rng.normal(128, 40, (3, h, w)).astype(np.float32)))

    def planes_mean(p):
        y = p[0]
        c = p[1:]
        c4 = c.reshape(2, h // 2, 2, w // 2, 2)
        cd = jnp.mean(c4, axis=(2, 4))
        return y, cd[0], cd[1]

    t = sync_time(jax.jit(planes_mean), planes)
    log(f"reshape-mean, [3,H,W] planes in: {t * 1e3:.2f} ms")

    def planes_slices(p):
        y = p[0]
        c = p[1:]
        cd = (c[:, 0::2, 0::2] + c[:, 0::2, 1::2] +
              c[:, 1::2, 0::2] + c[:, 1::2, 1::2]) * 0.25
        return y, cd[0], cd[1]

    t = sync_time(jax.jit(planes_slices), planes)
    log(f"strided slices, [3,H,W] planes in: {t * 1e3:.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
