#!/usr/bin/env python
"""Probe Mosaic support + cost for in-kernel MCU-tiling transposes on
the natural image layout (the 1.29 ms/4K XLA tiling chain is the
target; the DMA-scatter route is provably impossible).

Candidate formulations, each a standalone pallas kernel on one 4K-sized
operand [2176, 11520] u8 (u8 content = xored pixels; correctness checked
against numpy):

  P1  aligned lane split:      [16,11520] -> [16,90,128]      (compile?)
  P2  leading swap:            [16,30,384] -> [30,16,384]     (compile?)
  P3  full tiling transpose:   [16,11520] -> [16,30,384] -> swap ->
      [30,6144] -> 16x8 static 48-lane slices -> stack -> [240,768]
      then the fused matmul: the complete natural-layout pixel kernel.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tpu_stages_common import log  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"backend {jax.default_backend()}")

    rows, mh, nrx, rb = 136, 16, 240, 48
    lanes = nrx * rb                                    # 11520
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (rows * mh, lanes), dtype=np.uint8)
    imgd = jax.device_put(jnp.asarray(img))

    def bench(fn, arg, reps=30):
        out = fn(arg)
        jax.block_until_ready(out)
        probe = jax.jit(lambda o: jnp.sum(o[::7, ::131].astype(jnp.int32)))
        float(probe(out))
        t0 = time.perf_counter()
        outs = [fn(arg) for _ in range(reps)]
        float(probe(outs[-1]))
        dt = (time.perf_counter() - t0) / reps
        return out, dt

    # ---- P1: aligned lane split + is swapaxes supported at all ----
    def k_p1(x_ref, o_ref):
        v = x_ref[...].reshape(mh, lanes // 128, 128)
        o_ref[...] = jnp.swapaxes(v, 0, 1).reshape(lanes // 128 * mh, 128)

    try:
        f = pl.pallas_call(
            k_p1, grid=(rows,),
            in_specs=[pl.BlockSpec((mh, lanes), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((lanes // 128 * mh, 128),
                                   lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows * lanes // 128 * mh, 128),
                                           jnp.uint8),
        )
        out, dt = bench(jax.jit(f), imgd)
        ref = img.reshape(rows, mh, lanes // 128, 128).swapaxes(1, 2) \
            .reshape(-1, 128)
        log(f"P1 [16,90,128] swap: {dt*1e3:.2f} ms "
            f"ok={np.array_equal(np.asarray(out), ref)}")
    except Exception as e:
        log(f"P1 FAILED: {type(e).__name__}: {str(e)[:200]}")

    # ---- P2: 384-lane split + swap ----
    def k_p2(x_ref, o_ref):
        v = x_ref[...].reshape(mh, nrx // 8, 8 * rb)
        o_ref[...] = jnp.swapaxes(v, 0, 1).reshape(nrx // 8 * mh, 8 * rb)

    try:
        f = pl.pallas_call(
            k_p2, grid=(rows,),
            in_specs=[pl.BlockSpec((mh, lanes), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((nrx // 8 * mh, 8 * rb),
                                   lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows * nrx // 8 * mh, 8 * rb),
                                           jnp.uint8),
        )
        out, dt = bench(jax.jit(f), imgd)
        ref = img.reshape(rows, mh, nrx // 8, 8 * rb).swapaxes(1, 2) \
            .reshape(-1, 8 * rb)
        log(f"P2 [16,30,384] swap: {dt*1e3:.2f} ms "
            f"ok={np.array_equal(np.asarray(out), ref)}")
    except Exception as e:
        log(f"P2 FAILED: {type(e).__name__}: {str(e)[:200]}")

    # ---- P2f: the 384-split swap on f32 (8,128) tiles: 16 rows = two
    # full sublane tiles, unlike u8's (32,128) sub-tile ops ----
    def k_p2f(x_ref, o_ref):
        v = pltpu.bitcast(x_ref[...], jnp.int8).astype(jnp.float32)
        v = v.reshape(mh, nrx // 8, 8 * rb)
        o_ref[...] = jnp.swapaxes(v, 0, 1).reshape(nrx // 8 * mh, 8 * rb)

    try:
        f = pl.pallas_call(
            k_p2f, grid=(rows,),
            in_specs=[pl.BlockSpec((mh, lanes), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((nrx // 8 * mh, 8 * rb),
                                   lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows * nrx // 8 * mh, 8 * rb),
                                           jnp.float32),
        )
        out, dt = bench(jax.jit(f), imgd)
        ref = img.view(np.int8).reshape(rows, mh, nrx // 8, 8 * rb) \
            .swapaxes(1, 2).reshape(-1, 8 * rb).astype(np.float32)
        log(f"P2f f32 [16,30,384] swap: {dt*1e3:.2f} ms "
            f"ok={np.array_equal(np.asarray(out), ref)}")
    except Exception as e:
        log(f"P2f FAILED: {type(e).__name__}: {str(e)[:200]}")

    # ---- P3: full in-kernel tiling transpose -> [240, 768] f32 ----
    def k_p3(x_ref, o_ref):
        v = pltpu.bitcast(x_ref[...], jnp.int8).astype(jnp.float32)
        r2 = jnp.swapaxes(v.reshape(mh, nrx // 8, 8 * rb), 0, 1) \
            .reshape(nrx // 8, mh * 8 * rb)             # [30, 6144]
        cols = []                                       # j0-major stack
        for j0 in range(8):
            sl = [r2[:, y * 384 + j0 * rb: y * 384 + (j0 + 1) * rb]
                  for y in range(mh)]
            cols.append(jnp.concatenate(sl, axis=1))    # [30, 768]
        scr = jnp.stack(cols, axis=1).reshape(nrx, mh * rb)
        o_ref[...] = scr

    try:
        f = pl.pallas_call(
            k_p3, grid=(rows,),
            in_specs=[pl.BlockSpec((mh, lanes), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((nrx, mh * rb), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows * nrx, mh * rb),
                                           jnp.float32),
        )
        out, dt = bench(jax.jit(f), imgd)
        ref = img.view(np.int8).reshape(rows, mh, nrx, rb).swapaxes(1, 2) \
            .reshape(-1, mh * rb).astype(np.float32)
        ok = np.array_equal(np.asarray(out), ref)
        log(f"P3 full transpose -> [240,768]: {dt*1e3:.2f} ms ok={ok}")
    except Exception as e:
        log(f"P3 FAILED: {type(e).__name__}: {str(e)[:200]}")

    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
