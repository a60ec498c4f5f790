#!/usr/bin/env python
"""Probe: cost of seg_merge_mcu's _to_kernel transpose ([n_seg, mps, CW]
-> [G, mps, S, CW]) on the 4K rows-restart geometry, plus the candidate
replacement (block_pack emitting MCU-major [mps, n_seg, CW] directly, so
the merge input prep is a free reshape)."""

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

    n_seg, mps, cw = 135, 240, 384
    g, s = 17, 8
    n_seg_p = g * s
    rng = np.random.default_rng(0)
    mw = jnp.asarray(rng.integers(0, 2**32, (n_seg * mps, cw),
                                  dtype=np.uint64).astype(np.uint32))

    def to_kernel(mwf):
        mwp = jnp.pad(mwf.reshape(n_seg, mps, cw),
                      ((0, n_seg_p - n_seg), (0, 0), (0, 0)))
        return mwp.reshape(g, s, mps, cw).transpose(0, 2, 1, 3)

    f1 = jax.jit(to_kernel)
    t = sync_time(f1, mw)
    log(f"_to_kernel transpose (pad+reshape+transpose): {t * 1e3:.2f} ms")

    def to_kernel5(mwf):
        mwp = jnp.pad(mwf.reshape(n_seg, mps, cw),
                      ((0, n_seg_p - n_seg), (0, 0), (0, 0)))
        return (mwp.reshape(g, s, mps, cw // 128, 128)
                .transpose(0, 2, 1, 3, 4).reshape(g, mps, s, cw))

    f2 = jax.jit(to_kernel5)
    t = sync_time(f2, mw)
    log(f"row-granular 5D transpose variant: {t * 1e3:.2f} ms")

    mwm = jnp.asarray(rng.integers(0, 2**32, (mps, n_seg, cw),
                                   dtype=np.uint64).astype(np.uint32))

    def mcu_major_prep(x):
        xp = jnp.pad(x, ((0, 0), (0, n_seg_p - n_seg), (0, 0)))
        return xp.reshape(mps, g, s, cw)

    f3 = jax.jit(mcu_major_prep)
    t = sync_time(f3, mwm)
    log(f"mcu-major prep (pad+reshape only): {t * 1e3:.2f} ms")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
