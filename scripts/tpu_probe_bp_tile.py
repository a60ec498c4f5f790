#!/usr/bin/env python
"""Tile-size sweep for block_pack_mcu: the scratch-merge ablations showed
measurable per-grid-step overhead; block_pack_mcu runs 127 steps at
_TILE=256 on a 4K frame. Sweep 128/256/512 MCUs per step."""

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
    from jpegtpu.kernels import entropy_pack as ep
    log(f"backend {jax.default_backend()}")

    g = 6
    nm = 32400                            # 4K rows-restart MCU count
    rng = np.random.default_rng(0)
    c = np.zeros((nm * g, 64), np.int32)
    mask = rng.random((nm * g, 64)) < 0.12
    c[mask] = rng.integers(-63, 64, mask.sum())
    cls = (np.arange(nm * g, dtype=np.int32) % g >= 4).astype(np.int32)
    dcd = rng.integers(-40, 41, nm * g).astype(np.int32)
    cj, clsj, dcdj = jnp.asarray(c), jnp.asarray(cls), jnp.asarray(dcd)
    chunks, _ = ep.mcu_capacity(g, 384)

    for tile in (128, 256, 512, 1024):
        ep._TILE = tile
        f = jax.jit(lambda a, b, d: ep.block_pack_mcu(a, b, d, g, chunks))
        t = sync_time(f, cj, clsj, dcdj)
        log(f"tile={tile}: {t * 1e3:.2f} ms")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
