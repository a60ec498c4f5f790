#!/usr/bin/env python
"""Micro-probe: cost per dynamic-row VMEM read-modify-write append (the
primitive for a scratch-based segment merge). Times a kernel that does N
2-row RMWs at data-dependent rows, plus a batched-8 variant with shared
vector prep, to calibrate cycles/append before committing to the design."""

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

    nm = 16384          # scaled subset (whole-array VMEM, ~16MB limit)
    cap_rows = 160
    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.integers(0, 2**32, (nm, 128), np.uint64)
                        .astype(np.uint32))
    offs = jnp.asarray(np.sort(rng.integers(
        0, cap_rows * 4096 - 8192, nm)).astype(np.int32).reshape(nm, 1))

    # --- variant 1: per-MCU loop, funnel+rotate+2-row RMW each ---
    def kern1(mw_ref, off_ref, out_ref, scr_ref, *, n):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(j, _):
            o = off_ref[j, 0]
            w = mw_ref[pl.ds(j, 1), :]
            r = (o & 31).astype(jnp.uint32)
            prev = jnp.where(lane == 0, jnp.uint32(0),
                             pltpu.roll(w, 1, axis=1))
            sh = jnp.right_shift(w, r) | \
                jnp.left_shift(jnp.left_shift(prev, 1), (31 - r) & 31)
            m = (o >> 5) & 127
            rot = pltpu.roll(sh, m, axis=1)
            hi = jnp.where(lane >= m, rot, 0)
            lo = jnp.where(lane < m, rot, 0)
            row = jnp.minimum(o >> 12, cap_rows - 2)
            contrib = jnp.concatenate([hi, lo], axis=0)[:, None, :]
            cur = scr_ref[pl.ds(row, 2), :, :]
            scr_ref[pl.ds(row, 2), :, :] = cur | contrib
            return 0

        jax.lax.fori_loop(0, n, body, 0)
        out_ref[...] = scr_ref[pl.ds(0, 8), 0, :]

    f1 = jax.jit(lambda w, o: pl.pallas_call(
        functools.partial(kern1, n=nm),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((cap_rows, 1, 128), jnp.uint32)],
    )(w, o))
    t = sync_time(f1, words, offs)
    log(f"v1-style per-MCU RMW append: {t * 1e3:.2f} ms "
        f"({t / nm * 1e9:.0f} ns/append)")

    # --- variant 2: batch-8 vector prep (funnel+rotate on [8,128]),
    # then 8x 2-row RMW ---
    w8 = jnp.asarray(np.asarray(words).reshape(nm // 8, 8, 128))
    o8 = jnp.asarray(np.asarray(offs).reshape(nm // 8, 8, 1))

    def kern2(mw_ref, off_ref, out_ref, scr_ref, *, n_units):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        def body(j, _):
            s8 = mw_ref[j]
            off8 = off_ref[j]
            r = (off8 & 31).astype(jnp.uint32)
            prev = jnp.where(lane == 0, jnp.uint32(0),
                             pltpu.roll(s8, 1, axis=1))
            sh = jnp.right_shift(s8, r) | \
                jnp.left_shift(jnp.left_shift(prev, 1), (31 - r) & 31)
            m8 = jnp.right_shift(off8, 5) & 127
            idx = (lane - m8) & 127
            rot = pltpu.bitcast(
                jnp.take_along_axis(pltpu.bitcast(sh, jnp.int32), idx,
                                    axis=1), jnp.uint32)
            hi = jnp.where(lane >= m8, rot, 0)
            lo = jnp.where(lane < m8, rot, 0)
            for k in range(8):
                o = off_ref[j, k, 0]
                row = jnp.minimum(o >> 12, cap_rows - 2)
                contrib = jnp.concatenate(
                    [hi[k:k + 1, :], lo[k:k + 1, :]], axis=0)[:, None, :]
                cur = scr_ref[pl.ds(row, 2), :, :]
                scr_ref[pl.ds(row, 2), :, :] = cur | contrib
            return 0

        jax.lax.fori_loop(0, n_units, body, 0)
        out_ref[...] = scr_ref[pl.ds(0, 8), 0, :]

    f2 = jax.jit(lambda w, o: pl.pallas_call(
        functools.partial(kern2, n_units=nm // 8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((cap_rows, 1, 128), jnp.uint32)],
    )(w, o))
    t = sync_time(f2, w8, o8)
    log(f"batch-8 prep + 8 RMW appends: {t * 1e3:.2f} ms "
        f"({t / nm * 1e9:.0f} ns/append)")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
