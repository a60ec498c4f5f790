#!/usr/bin/env python
"""block_pack section ablations (timing only; ablated variants emit wrong
bits by construction). Sections: run-structure scans, Huffman gathers,
bit assembly, placement (_place_pair: rank search + 4 MXU prefix sums).
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

    import jpegtpu.kernels.entropy_pack as ep

    n = 194560                    # ~4K 420 block count, aligned
    rng = np.random.default_rng(0)
    coeffs_np = np.zeros((n, 64), np.int32)
    nz = rng.random((n, 64)) < 0.2
    coeffs_np[nz] = rng.integers(-255, 256, nz.sum())
    cls_np = (rng.random(n) < 1 / 3).astype(np.int32)
    dcd_np = rng.integers(-200, 200, n).astype(np.int32)
    coeffs = jax.device_put(jnp.asarray(coeffs_np))
    cls = jax.device_put(jnp.asarray(cls_np))
    dcd = jax.device_put(jnp.asarray(dcd_np))

    f_full = jax.jit(lambda c, k, d: ep.block_pack(c, k, d))
    t = sync_time(f_full, coeffs, cls, dcd)
    log(f"full block_pack: {t * 1e3:.2f} ms")

    real_pp = ep._place_pair
    real_cl = ep._cumlog64

    def run_variant(name, place_pair=None, cumlog=None):
        ep._place_pair = place_pair or real_pp
        ep._cumlog64 = cumlog or real_cl
        try:
            inner = getattr(ep.block_pack, "__wrapped__", ep.block_pack)
            f = jax.jit(lambda c, k, d: inner(c, k, d))
            t = sync_time(f, coeffs, cls, dcd)
            log(f"{name}: {t * 1e3:.2f} ms")
        finally:
            ep._place_pair = real_pp
            ep._cumlog64 = real_cl

    # placement stubbed: costs of everything upstream of _place_pair
    run_variant("no placement (stub)",
                place_pair=lambda hi, lo, wt, k, half: hi | lo)

    # placement without the rank binary search (reuse wt as pos: wrong)
    def pp_nosearch(v_hi, v_lo, wt, k, half):
        pos = wt & 63
        pos_lo = jnp.where(k == 0, 0, pltpu.roll(pos, 1, axis=1))
        t_ = v_hi.shape[0]
        base = half * 64

        def place(v, pos_v):
            vh = pltpu.bitcast(jnp.right_shift(v, 16),
                               jnp.int32).astype(jnp.float32)
            vl = pltpu.bitcast(v & 0xFFFF, jnp.int32).astype(jnp.float32)

            def ps_at(ps):
                g = jnp.take_along_axis(pltpu.bitcast(ps, jnp.int32),
                                        jnp.maximum(pos_v - 1, 0) + base,
                                        axis=1)
                g = pltpu.bitcast(g, jnp.float32)
                g = jnp.where(pos_v > 0, g, 0.0)
                prev = pltpu.roll(g, 1, axis=1)
                cum = g - jnp.where(k == 0, 0.0, prev)
                return pltpu.bitcast(cum.astype(jnp.int32), jnp.uint32)

            bd = ep._halfprefix_tril()
            psh = ep._prefix64_mm(vh, bd)
            psl = ep._prefix64_mm(vl, bd)
            return jnp.left_shift(ps_at(psh), 16) | ps_at(psl)

        return place(v_hi, pos) + place(v_lo, pos_lo)

    run_variant("placement, no rank search", place_pair=pp_nosearch)

    # placement with search but prefix sums/gathers stubbed
    def pp_nops(v_hi, v_lo, wt, k, half):
        t_ = v_hi.shape[0]
        base = half * 64
        pos = jnp.zeros((t_, 128), jnp.int32)
        for step in (64, 32, 16, 8, 4, 2, 1):
            cand = pos + step
            probe = jnp.take_along_axis(
                wt, jnp.minimum(cand, 64) - 1 + base, axis=1)
            pos = jnp.where((cand <= 64) & (probe <= k), cand, pos)
        return v_hi + v_lo + pos.astype(jnp.uint32)

    run_variant("placement = search only", place_pair=pp_nops)

    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
