#!/usr/bin/env python
"""Decide the 16-bit-coefficient-packing question (VERDICT r4 #2b) with
machine rates BEFORE rewriting the symbolize kernel: if Mosaic runs i16
elementwise/roll/select ops at ~2x the i32 rate (half the vregs per
[512,128] logical tile), demoting block_pack's symbol-structure section
(values <= 2047) is worth a real implementation; if i16 lowers at the
i32 rate (internal promotion), the whole direction is a negative result.

Benches (amortized chained timing, grid-sized >= ~2 ms per call):
  i32 / i16 elementwise (add/xor, independent chains)
  i32 / i16 pltpu.roll + max (the cummax primitive)
  i32 / i16 compare+select (the emit-mask primitive)
  i16 gather feasibility (take_along_axis on i16 values, i32 indices)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tpu_stages_common import log, sync_time  # noqa: E402

T = 512
REPS = 48


def _bench(kern_body, dtype, n_in=1, reps=REPS, label="", grid=512):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(*refs):
        xs = [r[...] for r in refs[:-1]]
        refs[-1][...] = kern_body(*xs)

    try:
        f = jax.jit(pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec((T, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec((T, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid * T, 128), dtype),
            grid=(grid,),
        ))
        rng = np.random.default_rng(0)
        args = [jnp.asarray(rng.integers(0, 2000, (grid * T, 128),
                                         np.int32).astype(dtype))
                for _ in range(n_in)]
        dt = sync_time(f, *args)
    except Exception as e:
        log(f"{label}: FAILED ({type(e).__name__}: {str(e)[:200]})")
        return None
    per = dt / (grid * reps)
    log(f"{label}: {dt * 1e3:.3f} ms total, {per * 1e9:.1f} ns per "
        f"[{T},128] pass")
    return per


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"backend {jax.default_backend()}")

    def ew_body(x):
        a = x
        b = x ^ 1
        for r in range(REPS // 2):
            a = a + x
            b = b ^ x
        return a + b

    def roll_body(x):
        a = x
        for r in range(REPS):
            a = jnp.maximum(a, pltpu.roll(x, (r % 63) + 1, axis=1))
        return a

    def sel_body(x):
        a = x
        for r in range(REPS // 2):
            m = a > x
            a = jnp.where(m, a + 1, x)
        return a

    for dt, name in ((jnp.int32, "i32"), (jnp.int16, "i16")):
        _bench(ew_body, dt, label=f"ew {name} ({REPS} ops)", grid=1024)
        _bench(roll_body, dt, label=f"roll+max {name} ({REPS})", grid=256)
        _bench(sel_body, dt, label=f"cmp+sel {name} ({REPS})", grid=512)

    # i16 gather feasibility: i16 values, i16 indices (and the i32-index
    # fallback) — the Huffman LUT / rank-search primitive.
    def g16_body(x, idx):
        a = jnp.zeros_like(x)
        for r in range(REPS):
            a = a + jnp.take_along_axis(x, ((idx + r) & 127), axis=1)
        return a
    _bench(g16_body, jnp.int16, n_in=2, label=f"gather i16/i16 ({REPS})",
           grid=256)

    def g16b_body(x, idx):
        a = jnp.zeros_like(x)
        ii = idx.astype(jnp.int32)
        for r in range(REPS):
            a = a + jnp.take_along_axis(x, ((ii + r) & 127), axis=1)
        return a
    _bench(g16b_body, jnp.int16, n_in=2,
           label=f"gather i16 vals/i32 idx ({REPS})", grid=256)
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
