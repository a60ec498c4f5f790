#!/usr/bin/env python
"""Attribution probe for _compact_stuff_kernel's 2.4 us/chunk: time the
REAL kernel against variants with one stage stubbed (timing-only, output
garbage):

  noexp    expansion math (bytes/flags/prefix/w0w1w2) replaced by
           passthrough planes
  norank   rank searches + val_at gathers skipped (planes = w0 shifted)
  noplace  place_rows skipped (planes ORed at a fixed window row)

The real kernel minus each variant bounds that stage's share."""

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
    from jpegtpu.entropy import scan
    from jpegtpu.kernels import compact as cp
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
    restart, n_seg = 240, 135
    coeffs = jax.jit(lambda x: fused_dctq.encode_blocks(
        x, quality, subsampling))(jnp.asarray(img))
    n_mcu = coeffs.shape[0]
    chunks, _ = ep.mcu_capacity(b, 384)
    dcd = scan.dc_diffs(coeffs, n_luma, restart).reshape(-1)
    cls = (jnp.arange(n_mcu * b, dtype=jnp.int32) % b >= n_luma)
    mw, ml = ep.block_pack_mcu(coeffs.reshape(-1, 64),
                               cls.astype(jnp.int32), dcd, b, chunks)
    w_cap = -(-restart * b * 384 // 32)
    sw, sb, _ = ep.seg_merge_mcu(mw, ml, n_seg, restart, w_cap)
    sw = jnp.asarray(np.asarray(sw))
    sb = jnp.asarray(np.asarray(sb))
    fps = sw.shape[1] // 1024
    nch = int(np.asarray((sb + 7) // 8 + 4095).sum() // 4096)

    f_real = jax.jit(lambda a, bb: ep.compact_segments_stuffed(
        a, bb, fps, restart))
    t0 = sync_time(f_real, sw, sb)
    log(f"real: {t0 * 1e3:.2f} ms ({t0 * 1e9 / nch:.0f} ns/chunk)")

    def run_variant(mode):
        cp._COMPACT_ATTR_MODE = mode
        try:
            f = jax.jit(lambda a, bb: ep.compact_segments_stuffed(
                a, bb, fps, restart))
            t = sync_time(f, sw, sb)     # traces with the mode active
            log(f"{mode}: {t * 1e3:.2f} ms ({t * 1e9 / nch:.0f} ns/chunk, "
                f"stage share ~{(t0 - t) * 1e3:.2f} ms)")
        except Exception as e:
            log(f"{mode}: FAILED {type(e).__name__}: {str(e)[:150]}")
        finally:
            cp._COMPACT_ATTR_MODE = None

    for mode in ("norank", "noplace", "noexp"):
        run_variant(mode)
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
