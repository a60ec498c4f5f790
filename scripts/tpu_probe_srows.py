#!/usr/bin/env python
"""seg_merge_mcu s_rows sweep: more segments per sublane group means
fewer serial append iterations (G*mps) at constant vector work — if the
~284 ns/iteration has a large fixed share, 16/32 rows win. Checks
bit-equality across variants on real 4K q90 data, then times each."""

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
    restart, n_seg = 240, 135
    coeffs = jax.jit(lambda x: fused_dctq.encode_blocks(
        x, quality, subsampling))(jnp.asarray(img))
    n_mcu = coeffs.shape[0]
    chunks, _ = ep.mcu_capacity(b, 384)
    dcd = scan.dc_diffs(coeffs, n_luma, restart).reshape(-1)
    cls = (jnp.arange(n_mcu * b, dtype=jnp.int32) % b >= n_luma)
    mw, ml = ep.block_pack_mcu(coeffs.reshape(-1, 64),
                               cls.astype(jnp.int32), dcd, b, chunks)
    mw = jnp.asarray(np.asarray(mw))
    ml = jnp.asarray(np.asarray(ml))
    w_cap = -(-restart * b * 384 // 32)

    ref_sw = ref_sb = None
    for s_rows in (8, 16, 32, 64):
        f = jax.jit(lambda a, bb, s=s_rows: ep.seg_merge_mcu(
            a, bb, n_seg, restart, w_cap, s_rows=s))
        try:
            t = sync_time(f, mw, ml)
        except Exception as e:
            log(f"s_rows={s_rows}: FAILED {type(e).__name__}: "
                f"{str(e)[:160]}")
            continue
        sw, sb, _ = f(mw, ml)
        sw, sb = np.asarray(sw), np.asarray(sb)
        if ref_sw is None:
            ref_sw, ref_sb = sw, sb
            bad = 0
        else:
            bad = 0
            for s in range(n_seg):
                n = (int(ref_sb[s]) + 31) // 32
                bad += int((sw[s, :n] != ref_sw[s, :n]).sum())
            bad += int((sb != ref_sb).sum())
        log(f"s_rows={s_rows}: {t * 1e3:.2f} ms (#diff vs s_rows=8: {bad})")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
