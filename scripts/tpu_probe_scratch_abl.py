#!/usr/bin/env python
"""Ablation probe: why does _seg_scratch_kernel run ~55 ns/append in
context when the rmw micro-probe (tpu_probe_rmw.py) measured 12?

Variants add the real kernel's structure one piece at a time to the
batch-8 RMW core:
  grid   - same math, but gridded [u_blk,...] BlockSpecs (64 steps)
  cond   - + su scalar reads and pl.when(valid) around the append body
  full   - + start/end blocks (zero_rows on start, pad + out-DMA on end)
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

    # mirror the 4K rows-restart geometry: 135 segments x 240 MCUs
    n_seg, mps = 135, 240
    nm = n_seg * mps
    cap_rows = 144
    u_blk = 64
    ups = mps // 8                       # 30 units per segment
    n_units = nm // 8
    n_steps = -(-n_units // u_blk)
    n_units_p = n_steps * u_blk

    rng = np.random.default_rng(0)
    w8 = rng.integers(0, 2**32, (n_units_p, 8, 128), np.uint64) \
        .astype(np.uint32)
    # per-segment sorted offsets, ~1000 bits/MCU
    offs = np.cumsum(rng.integers(400, 1600, (n_seg, mps)), axis=1)
    offs = np.concatenate([np.zeros((n_seg, 1), np.int64),
                           offs[:, :-1]], axis=1)
    o8 = offs.reshape(-1, 8, 1).astype(np.int32)
    o8 = np.concatenate(
        [o8, np.zeros((n_units_p - n_units, 8, 1), np.int32)])
    uidx = np.arange(n_units, dtype=np.int32)
    su = np.zeros((n_units_p, 1, 8), np.int32)
    su[:n_units, 0, 0] = uidx // ups
    su[:n_units, 0, 1] = (uidx % ups == 0)
    su[:n_units, 0, 2] = (uidx % ups == ups - 1)
    su[:n_units, 0, 3] = 123456
    su[:n_units, 0, 4] = 1

    w8j, o8j, suj = jnp.asarray(w8), jnp.asarray(o8), jnp.asarray(su)

    def append_core(mw_ref, off_ref, scr_ref, j, base, lane):
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
            row = jnp.minimum(o >> 12, cap_rows - 2) + base
            contrib = jnp.concatenate(
                [hi[k:k + 1, :], lo[k:k + 1, :]], axis=0)[:, None, :]
            cur = scr_ref[pl.ds(row, 2), :, :]
            scr_ref[pl.ds(row, 2), :, :] = cur | contrib

    def run(kernel, name, extra_scratch=(), sus=False):
        specs = [
            pl.BlockSpec((u_blk, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((u_blk, 8, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [w8j, o8j]
        if sus:
            specs.append(pl.BlockSpec((u_blk, 1, 8), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
            args.append(suj)
        f = jax.jit(lambda *a: pl.pallas_call(
            kernel,
            grid=(n_steps,),
            in_specs=specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((n_seg, cap_rows, 1, 128),
                                           jnp.uint32),
            scratch_shapes=[pltpu.VMEM((2 * cap_rows, 1, 128), jnp.uint32),
                            pltpu.SemaphoreType.DMA((2,))] +
            list(extra_scratch),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(*a))
        t = sync_time(f, *args)
        log(f"{name}: {t * 1e3:.2f} ms ({t / nm * 1e9:.0f} ns/append)")

    lane8 = None

    # --- grid: gridded, no conditionals ---
    def kern_grid(mw_ref, off_ref, out_ref, scr_ref, sem):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            scr_ref[...] = jnp.zeros_like(scr_ref)

        def body(j, _):
            append_core(mw_ref, off_ref, scr_ref, j, 0, lane)
            return 0
        jax.lax.fori_loop(0, u_blk, body, 0)

    run(kern_grid, "grid (no conds)")

    # --- cond: + su reads and pl.when(valid) ---
    def kern_cond(mw_ref, off_ref, su_ref, out_ref, scr_ref, sem):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            scr_ref[...] = jnp.zeros_like(scr_ref)

        def body(j, _):
            seg = su_ref[j, 0, 0]
            valid = su_ref[j, 0, 4]
            base = (seg & 1) * 0      # keep base static-0: isolate cond cost

            @pl.when(valid != 0)
            def _():
                append_core(mw_ref, off_ref, scr_ref, j, base, lane)
            return 0
        jax.lax.fori_loop(0, u_blk, body, 0)

    run(kern_cond, "cond (+su reads, pl.when)", sus=True)

    # --- full: the production kernel via the real dispatcher ---
    from jpegtpu.kernels import entropy_pack as ep
    ml = rng.integers(400, 1600, nm).astype(np.int32)
    mw = jnp.asarray(w8.reshape(-1, 128)[:nm])
    mlj = jnp.asarray(ml)
    w_cap = 17280
    f3 = jax.jit(lambda w, l: ep.seg_merge_mcu(w, l, n_seg, mps, w_cap))
    t = sync_time(f3, mw, mlj)
    log(f"full production seg_merge_mcu: {t * 1e3:.2f} ms "
        f"({t / nm * 1e9:.0f} ns/append)")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
