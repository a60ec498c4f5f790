#!/usr/bin/env python
"""mcu_merge ablations: where does 1.94 ms go (est ~0.35 ms)?

A  - production mcu_merge (g-leading, 56-lane blocks, in-kernel concat pad)
B  - input pre-padded to [g, T, 128] by XLA; no in-kernel concat
B0 - B minus the funnel shift (timing only, wrong bits)
B1 - B minus the gather: static roll placeholder (timing only, wrong bits)
"""

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"backend {jax.default_backend()}")

    from jpegtpu.kernels import entropy_pack as ep

    g, chunks = 6, 1
    nm = 32512                   # ~4K 420 MCU count, tile-512-aligned
    rng = np.random.default_rng(0)
    lens_np = rng.integers(10, 300, nm * g).astype(np.int32)
    words_np = rng.integers(0, 2**32, (nm * g, ep.BLOCK_WORDS),
                            dtype=np.uint32)
    words = jax.device_put(jnp.asarray(words_np))
    lens = jax.device_put(jnp.asarray(lens_np))

    f_a = jax.jit(lambda w_, l_: ep.mcu_merge(w_, l_, g, chunks))
    t = sync_time(f_a, words, lens)
    log(f"A  production mcu_merge: {t * 1e3:.2f} ms")

    def padded_kernel(words_ref, lens_ref, mwords_ref, mlens_ref, *,
                      mode):
        t_ = words_ref.shape[1]
        lens_k = jnp.concatenate([lens_ref[gi] for gi in range(g)],
                                 axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (t_, 128), 1)
        out_chunks = [jnp.zeros((t_, 128), jnp.uint32)
                      for _ in range(chunks)]
        off = jnp.zeros((t_, 1), jnp.int32)
        for gi in range(g):
            w_pad = words_ref[gi]                    # [T, 128] pre-padded
            r = (off & 31).astype(jnp.uint32)
            q = off >> 5
            if mode == "noshift":
                sh = w_pad
            else:
                rolled1 = pltpu.roll(w_pad, 1, axis=1)
                sh = jnp.right_shift(w_pad, r)
                sh = sh | jnp.left_shift(jnp.left_shift(rolled1, 1),
                                         (31 - r) & 31)
            for c in range(chunks):
                if mode == "nogather":
                    gat = pltpu.roll(sh, 7, axis=1)
                    valid = lane >= 0
                else:
                    idx = lane + (128 * c) - q
                    valid = (idx >= 0) & (idx < 128)
                    gat = jnp.take_along_axis(sh, jnp.clip(idx, 0, 127),
                                              axis=1)
                out_chunks[c] = out_chunks[c] | jnp.where(valid, gat, 0)
            off = off + lens_k[:, gi:gi + 1]
        mwords_ref[...] = jnp.concatenate(out_chunks, axis=1)
        mlens_ref[...] = off

    def run_padded(mode):
        tile = 256
        kern = functools.partial(padded_kernel, mode=mode)

        def f(w_, l_):
            w_t = w_.reshape(nm, g, ep.BLOCK_WORDS).transpose(1, 0, 2)
            w_t = jnp.pad(w_t, ((0, 0), (0, 0),
                                (0, 128 - ep.BLOCK_WORDS)))
            l_t = l_.reshape(nm, g, 1).transpose(1, 0, 2)
            return pl.pallas_call(
                kern,
                grid=(nm // tile,),
                in_specs=[
                    pl.BlockSpec((g, tile, 128), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((g, tile, 1), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((tile, chunks * 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((nm, chunks * 128), jnp.uint32),
                    jax.ShapeDtypeStruct((nm, 1), jnp.int32),
                ),
            )(w_t, l_t)
        return jax.jit(f)

    for mode, name in (("full", "B  pre-padded input"),
                       ("noshift", "B0 pre-padded, no funnel shift"),
                       ("nogather", "B1 pre-padded, static roll")):
        f = run_padded(mode)
        t = sync_time(f, words, lens)
        log(f"{name}: {t * 1e3:.2f} ms")
        if mode == "full":
            got = np.asarray(f(words, lens)[0])
            ref = np.asarray(f_a(words, lens)[0])
            log(f"B bits match A: {np.array_equal(got, ref)}")

    # tile sweep on the pre-padded variant: is the floor per-grid-step?
    def run_tile(tile):
        kern = functools.partial(padded_kernel, mode="full")

        def f(w_, l_):
            w_t = w_.reshape(nm, g, ep.BLOCK_WORDS).transpose(1, 0, 2)
            w_t = jnp.pad(w_t, ((0, 0), (0, 0),
                                (0, 128 - ep.BLOCK_WORDS)))
            l_t = l_.reshape(nm, g, 1).transpose(1, 0, 2)
            return pl.pallas_call(
                kern,
                grid=(nm // tile,),
                in_specs=[
                    pl.BlockSpec((g, tile, 128), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((g, tile, 1), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((tile, chunks * 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((nm, chunks * 128), jnp.uint32),
                    jax.ShapeDtypeStruct((nm, 1), jnp.int32),
                ),
            )(w_t, l_t)
        return jax.jit(f)

    for tile in (512, 1024, 2048):
        f = run_tile(tile)
        t = sync_time(f, words, lens)
        log(f"B tile={tile}: {t * 1e3:.2f} ms")

    # pure-copy floor: load the 6 g-slices, OR them, store
    def copy_kernel(words_ref, lens_ref, mwords_ref, mlens_ref):
        acc = words_ref[0]
        for gi in range(1, g):
            acc = acc | words_ref[gi]
        mwords_ref[...] = acc
        mlens_ref[...] = lens_ref[0]

    def run_copy(tile):
        def f(w_, l_):
            w_t = w_.reshape(nm, g, ep.BLOCK_WORDS).transpose(1, 0, 2)
            w_t = jnp.pad(w_t, ((0, 0), (0, 0),
                                (0, 128 - ep.BLOCK_WORDS)))
            l_t = l_.reshape(nm, g, 1).transpose(1, 0, 2)
            return pl.pallas_call(
                copy_kernel,
                grid=(nm // tile,),
                in_specs=[
                    pl.BlockSpec((g, tile, 128), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((g, tile, 1), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((nm, 128), jnp.uint32),
                    jax.ShapeDtypeStruct((nm, 1), jnp.int32),
                ),
            )(w_t, l_t)
        return jax.jit(f)

    for tile in (256, 1024):
        f = run_copy(tile)
        t = sync_time(f, words, lens)
        log(f"pure-copy floor tile={tile}: {t * 1e3:.2f} ms")

    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
