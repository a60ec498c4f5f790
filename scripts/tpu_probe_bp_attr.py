#!/usr/bin/env python
"""Attribution probe for block_pack_mcu (the largest op: 1.75 ms of the
~5.05 ms 4K frame, docs/PERF.md): time the REAL kernel against variants
with one stage stubbed (timing-only, output garbage — entropy_pack.
_BP_ATTR_MODE). The real kernel minus each variant bounds that stage's
share. Two hypothesis modes answer the round-3 open question directly:

  staticchain   _merge_pairs' serial off-chain broken (static offsets):
                a large drop => the merge loop is LATENCY-bound like the
                compact kernel was (batching would win);
  nomergegather per-chunk placement gathers removed (keeps the chain):
                a large drop => the merge is gather-THROUGHPUT-bound.

Plus a calibration microbench: K chained (dependent) vs K independent
take_along_axis passes at [512, 128] in a standalone Pallas kernel —
ns/gather-pass and the latency/throughput ratio for the roofline
(docs/ROOFLINE.md).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tpu_stages_common import log, sync_time  # noqa: E402


def gather_microbench():
    """ns per [512,128] lane-gather pass, dependent vs independent."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, reps = 512, 48

    def mk(dep: bool):
        def kern(x_ref, i_ref, o_ref):
            x = x_ref[...]
            idx = i_ref[...]
            acc = jnp.zeros_like(x)
            for r in range(reps):
                if dep:
                    # each gather's index depends on the previous result
                    g = jnp.take_along_axis(x, idx, axis=1)
                    idx = (g >> 3) & 127
                    acc = acc + g
                else:
                    g = jnp.take_along_axis(x, (idx + r) & 127, axis=1)
                    acc = acc + g
            o_ref[...] = acc

        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec((t, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((t, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((t, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((64 * t, 128), jnp.int32),
            grid=(64,),
        )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 20, (64 * t, 128), np.int32))
    idx = jnp.asarray(rng.integers(0, 128, (64 * t, 128), np.int32))
    for dep in (False, True):
        f = jax.jit(mk(dep))
        dt = sync_time(f, x, idx)
        per = dt / (64 * reps)
        log(f"gather microbench dep={dep}: {dt * 1e3:.3f} ms total, "
            f"{per * 1e9:.0f} ns per [512,128] gather pass "
            f"({per * 1e9 / (t // 8):.2f} ns/vreg-row)")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from jpegtpu.entropy import scan
    from jpegtpu.kernels import entropy_pack as ep
    from jpegtpu.kernels import fused_dctq
    log(f"backend {jax.default_backend()}")

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    img = np.clip(base[..., None] + rng.normal(0, 12, (h, w, 3)),
                  0, 255).astype(np.uint8)
    quality, subsampling, n_luma, b = 90, "420", 4, 6
    restart = 240
    c2 = jax.jit(lambda x: fused_dctq.encode_blocks_pairs(
        x, quality, subsampling))(jnp.asarray(img))
    n_mcu = c2.shape[0]
    chunks, _ = ep.mcu_capacity(b, 384)
    dcd = scan.dc_diffs_from_dc(c2[:, ::64], n_luma, restart).reshape(-1)
    cls = (jnp.arange(n_mcu * b, dtype=jnp.int32) % b >= n_luma) \
        .astype(jnp.int32)
    c2 = jnp.asarray(np.asarray(c2))
    dcd = jnp.asarray(np.asarray(dcd))
    cls = jnp.asarray(np.asarray(cls))
    n_steps = -(-n_mcu // ep._TILE)
    log(f"n_mcu={n_mcu} tile={ep._TILE} grid_steps={n_steps} "
        f"chunks={chunks}")

    def build():
        return jax.jit(lambda c, cl, d: ep.block_pack_mcu_pairs(
            c, cl, d, b, chunks, n_luma=n_luma))

    f_real = build()
    t0 = sync_time(f_real, c2, cls, dcd)
    log(f"real: {t0 * 1e3:.3f} ms ({t0 * 1e6 / n_steps:.1f} us/grid-step)")

    for mode in ("staticchain", "nomergegather", "nosym", "nocummax",
                 "nolut", "nomm", "norank", "nopsat"):
        ep._BP_ATTR_MODE = mode
        try:
            f = build()
            t = sync_time(f, c2, cls, dcd)
            log(f"{mode}: {t * 1e3:.3f} ms "
                f"(stage share ~{(t0 - t) * 1e3:.3f} ms)")
        except Exception as e:
            log(f"{mode}: FAILED {type(e).__name__}: {str(e)[:150]}")
        finally:
            ep._BP_ATTR_MODE = None

    log("gather calibration:")
    try:
        gather_microbench()
    except Exception as e:
        log(f"microbench FAILED {type(e).__name__}: {str(e)[:200]}")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
