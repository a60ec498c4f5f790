#!/usr/bin/env python
"""Probe 2: (a) pixel path as strided conv (implicit im2col, no transpose);
(b) decompose block_pack placement cost: rank search vs prefix-place."""

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
    log(f"backend {jax.default_backend()}")

    from jpegtpu.core import ops
    from jpegtpu.entropy import scan
    from jpegtpu.kernels import entropy_pack as ep
    from jpegtpu.kernels import fused_dctq

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    imgd = jax.device_put(jnp.asarray(img))
    quality, subsampling = 90, "420"
    mh, mw = 16, 16

    m, bias = fused_dctq.mcu_operator(quality, subsampling)
    md = jax.device_put(jnp.asarray(m))
    biasd = jax.device_put(jnp.asarray(bias))
    # conv kernel [kh, kw, cin, cout]: M rows are (y*mw + x)*3 + c
    kconv = jax.device_put(jnp.asarray(
        m.reshape(mh, mw, 3, m.shape[1])))

    f_ref = jax.jit(lambda x: fused_dctq.encode_blocks(x, quality,
                                                       subsampling))
    ref = np.asarray(jax.block_until_ready(f_ref(imgd)))

    def f_conv(x):
        xf = x.astype(jnp.float32)[None]
        y = jax.lax.conv_general_dilated(
            xf, kconv, window_strides=(mh, mw), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y[0].reshape(-1, m.shape[1]) + biasd
        y = ops.round_half_away(y).astype(jnp.int32)
        return y.reshape(y.shape[0], 6, 64)
    fc = jax.jit(f_conv)
    t = sync_time(fc, imgd)
    out = np.asarray(fc(imgd))
    d = np.abs(out.astype(np.int64) - ref.astype(np.int64))
    log(f"pixel path as strided conv: {t * 1e3:.2f} ms  "
        f"max|d|={d.max()} frac={(d > 0).mean():.2e}")

    def f_dot(x):
        xf = x.reshape(h // mh, mh, w // mw, mw, 3).astype(jnp.float32)
        y = jax.lax.dot_general(
            xf, md.reshape(mh, mw, 3, m.shape[1]),
            (((1, 3, 4), (0, 1, 2)), ((), ())))
        y = y.reshape(-1, m.shape[1]) + biasd
        y = ops.round_half_away(y).astype(jnp.int32)
        return y.reshape(y.shape[0], 6, 64)
    fd = jax.jit(f_dot)
    t = sync_time(fd, imgd)
    out = np.asarray(fd(imgd))
    d = np.abs(out.astype(np.int64) - ref.astype(np.int64))
    log(f"pixel path as 3-dim dot_general: {t * 1e3:.2f} ms  "
        f"max|d|={d.max()} frac={(d > 0).mean():.2e}")

    # ---- (b) placement decomposition ----
    quality_b, b, n_luma, restart = 90, 6, 4, 240
    coeffs = jax.block_until_ready(f_ref(imgd))
    n_mcu = coeffs.shape[0]
    chunks, _ = ep.mcu_capacity(b, 384)
    dcd = jnp.asarray(np.asarray(
        scan.dc_diffs(coeffs, n_luma, restart)).reshape(-1))
    cls = jnp.asarray((np.arange(n_mcu * b, dtype=np.int32) % b
                       >= n_luma).astype(np.int32))
    c_all = jnp.asarray(np.asarray(coeffs).reshape(-1, 64))

    def run_variant(name):
        f = jax.jit(lambda c, cl, dd: ep.block_pack_mcu(c, cl, dd, b,
                                                        chunks))
        t = sync_time(f, c_all, cls, dcd)
        log(f"block_pack_mcu [{name}]: {t * 1e3:.2f} ms")

    run_variant("baseline")

    orig_place = ep._place_pair

    def place_no_search(v_hi, v_lo, wt, k, half):
        """Skip the 7-step binary search: fake pos (wrong bytes)."""
        t = v_hi.shape[0]
        pos = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (t, 128), 1) & 63,
            (t, 128))

        def place(v, pos_v):
            vh = ep.pltpu.bitcast(jnp.right_shift(v, 16),
                                  jnp.int32).astype(jnp.float32)
            vl = ep.pltpu.bitcast(v & 0xFFFF, jnp.int32).astype(jnp.float32)
            base = half * 64

            def ps_at(ps):
                g = jnp.take_along_axis(
                    ep.pltpu.bitcast(ps, jnp.int32),
                    jnp.maximum(pos_v - 1, 0) + base, axis=1)
                g = ep.pltpu.bitcast(g, jnp.float32)
                g = jnp.where(pos_v > 0, g, 0.0)
                prev = ep.pltpu.roll(g, 1, axis=1)
                cum = g - jnp.where(k == 0, 0.0, prev)
                return ep.pltpu.bitcast(cum.astype(jnp.int32), jnp.uint32)

            bd = ep._halfprefix_tril()
            psh = ep._prefix64_mm(vh, bd)
            psl = ep._prefix64_mm(vl, bd)
            return jnp.left_shift(ps_at(psh), 16) | ps_at(psl)

        return place(v_hi, pos) + place(v_lo, pos)

    def place_no_prefix(v_hi, v_lo, wt, k, half):
        """Keep the search, skip the prefix/gather-place (wrong bytes)."""
        t = v_hi.shape[0]
        base = half * 64
        pos = jnp.zeros((t, 128), jnp.int32)
        for step in (64, 32, 16, 8, 4, 2, 1):
            cand = pos + step
            probe = jnp.take_along_axis(
                wt, jnp.minimum(cand, 64) - 1 + base, axis=1)
            pos = jnp.where((cand <= 64) & (probe <= k), cand, pos)
        pos_lo = jnp.where(k == 0, 0, ep.pltpu.roll(pos, 1, axis=1))
        return (v_hi + v_lo + pos.astype(jnp.uint32)
                + pos_lo.astype(jnp.uint32))

    try:
        ep._place_pair = place_no_search
        run_variant("no-search (invalid)")
        ep._place_pair = place_no_prefix
        run_variant("no-prefix-place (invalid)")
    finally:
        ep._place_pair = orig_place
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
