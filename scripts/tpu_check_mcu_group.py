#!/usr/bin/env python
"""HW byte-parity + A/B timing for the MCU-grouping entropy path
(entropy_pack.mcu_group, round-4: merge gm consecutive MCUs as one
block_pack unit when chunk-count-free — targets the non-420 per-pixel
cliff from VERDICT r3 #2).

Per mode (444 gm=2, 422 gm=2, gray gm=8; 420 sanity gm=1): build the
production program (auto gm) and a forced gm=1 program, assert the
stuffed scan bytes identical in-context, then interleaved amortized
timing of both. Done-criteria targets: 444 >= 1000 MPix/s,
gray >= 1300 MPix/s (4K q90 rows)."""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tpu_stages_common import log  # noqa: E402


def content(h, w, rng):
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    return np.clip(base[..., None] + rng.normal(0, 12, (h, w, 3)),
                   0, 255).astype(np.uint8)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from jpegtpu import encoder as enc_mod
    from jpegtpu.config import EncoderConfig
    log(f"backend {jax.default_backend()}")
    rng = np.random.default_rng(0)

    h, w = 2160, 3840
    img3 = content(h, w, rng)
    probe = jax.jit(lambda o: jnp.sum(o[1]) +
                    jnp.sum(o[0][::4099].astype(jnp.int32)))

    def build(cfg, shape, gm):
        restart, n_seg, mcus_per_seg = enc_mod._geometry(shape, cfg)
        fn = functools.partial(
            enc_mod._device_encode_pallas, quality=cfg.quality,
            subsampling=cfg.subsampling, restart=restart, n_seg=n_seg,
            mcus_per_seg=mcus_per_seg, bits_budget=cfg.first_pass_budget,
            use_fused=cfg.use_pallas, device_stuff=True,
            pixel_path=cfg.pixel_path, compact_kb=cfg.compact_kb,
            mcu_group=gm)
        return jax.jit(fn)

    def chain_time(fn, arg):
        def chain(k):
            t0 = time.perf_counter()
            outs = [fn(arg) for _ in range(k)]
            float(probe(outs[-1]))
            return time.perf_counter() - t0
        d1 = min(chain(1) for _ in range(3))
        d9 = min(chain(9) for _ in range(3))
        return (d9 - d1) / 8

    for sub in ("444", "422", "gray", "420"):
        cfg = EncoderConfig(quality=90, subsampling=sub,
                            restart_interval="rows")
        img = img3[..., 0] if sub == "gray" else img3
        gm_auto = enc_mod._entropy_mcu_group((h, w), cfg)
        log(f"{sub}: auto gm={gm_auto}")
        imgd = jax.device_put(jnp.asarray(img))
        fns = {}
        ref = None
        for label, gm in (("gm1", 1), (f"gm{gm_auto}", gm_auto)):
            fn = build(cfg, (h, w), gm)
            out = fn(imgd)
            float(probe(out))
            total = int(np.asarray(out[3]))
            scan = np.asarray(out[0]).view(np.uint8)[:total]
            if ref is None:
                ref = (total, scan)
            else:
                assert total == ref[0] and np.array_equal(scan, ref[1]), \
                    f"{sub}/{label} IN-CONTEXT MISMATCH — do not ship"
                log(f"{sub}: scan bytes identical ({total} B)")
            fns[label] = fn
            if gm == 1 and gm_auto == 1:
                break
        for label, fn in fns.items():
            dt = chain_time(fn, imgd)
            log(f"{sub} {label}: {dt * 1e3:.2f} ms/frame "
                f"({h * w / dt / 1e6:.0f} MPix/s)")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
