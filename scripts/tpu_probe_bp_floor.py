#!/usr/bin/env python
"""Floor + tile-sweep probe for block_pack_mcu.

The round-4 attribution probe (scripts/tpu_probe_bp_attr.py,
scripts/probe_bp_attr.log) showed NON-ADDITIVE stage shares: stubbing
the whole symbolize+place path (nosym) saves only ~0.46 ms of 1.89,
while its inner stages alone claim ~1.4 ms — so ~1.4 ms/frame
(~22 us/grid-step) is an unattributed floor. This probe decomposes the
floor additively and tests the one lever that attacks a fixed per-step
cost directly:

  floor    load + store only (merge loop and symbolize both stubbed)
  nomerge  full symbolize, merge loop stubbed      -> merge cost
  nosym    symbolize stubbed, full merge           -> symbolize cost
  real     production kernel

  tile sweep: _TILE in {256, 512, 1024, 2048} on the real kernel —
  if us/grid-step is ~constant in tile, the cost is per-ROW vector
  work (VPU-throughput floor, roofline-relevant); if ms/frame drops
  with bigger tiles, it was per-STEP overhead and the default moves.
"""

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

    def build():
        return jax.jit(lambda c, cl, d: ep.block_pack_mcu_pairs(
            c, cl, d, b, chunks, n_luma=n_luma))

    f_real = build()
    t0 = sync_time(f_real, c2, cls, dcd)
    n_steps = -(-n_mcu // ep._TILE)
    log(f"real(tile={ep._TILE}): {t0 * 1e3:.3f} ms "
        f"({t0 * 1e6 / n_steps:.1f} us/grid-step)")

    shares = {}
    for mode in ("floor", "nomerge", "nosym"):
        ep._BP_ATTR_MODE = mode
        try:
            f = build()
            t = sync_time(f, c2, cls, dcd)
            shares[mode] = t
            log(f"{mode}: {t * 1e3:.3f} ms "
                f"({t * 1e6 / n_steps:.1f} us/grid-step, "
                f"share vs real ~{(t0 - t) * 1e3:.3f} ms)")
        except Exception as e:
            log(f"{mode}: FAILED {type(e).__name__}: {str(e)[:150]}")
        finally:
            ep._BP_ATTR_MODE = None
    if "floor" in shares and "nomerge" in shares and "nosym" in shares:
        sym = t0 - shares["nosym"]
        merge = t0 - shares["nomerge"]
        log(f"additivity check: floor {shares['floor'] * 1e3:.3f} + "
            f"sym {sym * 1e3:.3f} + merge {merge * 1e3:.3f} = "
            f"{(shares['floor'] + sym + merge) * 1e3:.3f} vs real "
            f"{t0 * 1e3:.3f} ms")

    # round-2 sweep note (entropy_pack.py:56): 512 beat 256, 1024 blew
    # VMEM with the then-current kernel — re-check with today's kernel.
    tile0 = ep._TILE
    try:
        for tile in (256, 512, 1024):
            ep._TILE = tile
            try:
                f = build()
                t = sync_time(f, c2, cls, dcd)
            except Exception as e:
                log(f"tile={tile}: FAILED {type(e).__name__}: "
                    f"{str(e)[:120]}")
                continue
            ns = -(-n_mcu // tile)
            log(f"tile={tile}: {t * 1e3:.3f} ms "
                f"({t * 1e6 / ns:.1f} us/grid-step, {ns} steps)")
    finally:
        ep._TILE = tile0
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
