#!/usr/bin/env python
"""Diff block_pack and mcu_merge on real TPU vs interpret mode."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"backend {jax.default_backend()}")

    from jpegtpu.kernels import entropy_pack as ep

    g, n_mcu = 6, 256
    rng = np.random.default_rng(0)
    c = np.zeros((n_mcu * g, 64), np.int32)
    mask = rng.random(c.shape) < 0.15
    c[mask] = rng.integers(-255, 256, mask.sum())
    cls = np.tile(np.array([0, 0, 0, 0, 1, 1], np.int32), n_mcu)
    dcd = rng.integers(-64, 64, n_mcu * g).astype(np.int32)
    cj, clsj, dcdj = jnp.asarray(c), jnp.asarray(cls), jnp.asarray(dcd)

    t0 = time.time()
    w_t, l_t = ep.block_pack(cj, clsj, dcdj)
    w_t, l_t = np.asarray(w_t), np.asarray(l_t)
    log(f"TPU block_pack done in {time.time() - t0:.1f}s")

    orig = ep._interpret
    ep._interpret = lambda: True
    try:
        w_i, l_i = ep.block_pack(cj, clsj, dcdj)
        w_i, l_i = np.asarray(w_i), np.asarray(l_i)
    finally:
        ep._interpret = orig
    log("interpret block_pack done")

    ok = True
    if not np.array_equal(l_t, l_i):
        d = np.flatnonzero(l_t != l_i)
        log(f"lens differ at {d.size} blocks, first {d[:5]} "
            f"tpu={l_t[d[0]]} int={l_i[d[0]]}")
        ok = False
    if not np.array_equal(w_t, w_i):
        bad = np.flatnonzero((w_t != w_i).any(axis=1))
        r = bad[0]
        col = np.flatnonzero(w_t[r] != w_i[r])[0]
        log(f"words differ in {bad.size}/{w_t.shape[0]} blocks; block {r} "
            f"word {col}: tpu={w_t[r, col]:08x} int={w_i[r, col]:08x}")
        ok = False
    log("block_pack " + ("MATCH" if ok else "MISMATCH"))

    # mcu_merge with budget chunks
    wj, lj = jnp.asarray(w_i), jnp.asarray(l_i)   # use CORRECT inputs
    t0 = time.time()
    mw_t, ml_t = jax.jit(lambda w, l: ep.mcu_merge(w, l, g, 1))(wj, lj)
    mw_t, ml_t = np.asarray(mw_t), np.asarray(ml_t)
    log(f"TPU mcu_merge done in {time.time() - t0:.1f}s")
    ep._interpret = lambda: True
    try:
        mw_i, ml_i = ep.mcu_merge(wj, lj, g, 1)
        mw_i, ml_i = np.asarray(mw_i), np.asarray(ml_i)
    finally:
        ep._interpret = orig
    ok2 = np.array_equal(ml_t, ml_i) and np.array_equal(mw_t, mw_i)
    if not ok2:
        bad = np.flatnonzero((mw_t != mw_i).any(axis=1))
        log(f"mcu_merge words differ in {bad.size} MCUs, first {bad[:5]}")
    log("mcu_merge " + ("MATCH" if ok2 else "MISMATCH"))
    return 0 if (ok and ok2) else 1


if __name__ == "__main__":
    sys.exit(main())
