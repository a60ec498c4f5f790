#!/usr/bin/env python
"""Probe: pass the image to the device program as [H, W*3] u8 (host
reshape, free) instead of [H, W, 3].

The round-4 420 trace (scripts/trace_r4_420.log) shows ~0.34 ms/4K of
XLA relayout copies (copy {1,0,2}->{0,2,1} + reshape + copy {0,1}->
{1,0}) between the 3D image parameter and the row-slab view the nat
pixel kernel consumes. A 2D parameter should make the view free.
Byte gate + interleaved timing, 420 + 444."""

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
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from jpegtpu import encoder as enc_mod
    from jpegtpu.config import EncoderConfig
    log(f"backend {jax.default_backend()}")

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    img = np.clip(base[..., None] + rng.normal(0, 12, (h, w, 3)),
                  0, 255).astype(np.uint8)
    probe = jax.jit(lambda o: jnp.sum(o[1]) +
                    jnp.sum(o[0].reshape(-1)[::4099].astype(jnp.int32)))

    def scan_bytes(out):
        if out[0].ndim == 2:
            glens = np.asarray(out[4])
            return b"".join(
                np.asarray(out[0][g]).view(np.uint8)[:glens[g]].tobytes()
                for g in range(out[0].shape[0]))
        total = int(np.asarray(out[3]))
        return np.asarray(out[0]).view(np.uint8)[:total].tobytes()

    def chain(fn, arg, k):
        t0 = time.perf_counter()
        outs = [fn(arg) for _ in range(k)]
        float(probe(outs[-1]))
        return time.perf_counter() - t0

    for sub in ("420", "444"):
        cfg = EncoderConfig(quality=90, subsampling=sub,
                            restart_interval="rows")
        fn3, _, _ = enc_mod._jitted_encode((h, w), cfg)
        restart, n_seg, mps = enc_mod._geometry((h, w), cfg)
        import functools
        fn2 = jax.jit(functools.partial(
            lambda x2, **kw: enc_mod._device_encode_pallas(
                x2.reshape(h, w, 3), **kw),
            quality=cfg.quality, subsampling=cfg.subsampling,
            restart=restart, n_seg=n_seg, mcus_per_seg=mps,
            bits_budget=cfg.first_pass_budget, use_fused=True,
            device_stuff=True, pixel_path=cfg.pixel_path,
            compact_kb=cfg.compact_kb,
            mcu_group=enc_mod._entropy_mcu_group((h, w), cfg),
            compact_groups=cfg.compact_groups))
        img3d = jax.device_put(jnp.asarray(img))
        img2d = jax.device_put(jnp.asarray(img.reshape(h, w * 3)))
        o3 = fn3(img3d)
        float(probe(o3))
        o2 = fn2(img2d)
        float(probe(o2))
        b3, b2 = scan_bytes(o3), scan_bytes(o2)
        ok = b3 == b2
        log(f"{sub}: bytes {'IDENTICAL' if ok else 'MISMATCH'} "
            f"({len(b3)} B)")
        assert ok
        for rep in range(3):
            for name, fn, arg in (("3d", fn3, img3d), ("2d", fn2, img2d)):
                d1 = min(chain(fn, arg, 1) for _ in range(2))
                d9 = min(chain(fn, arg, 9) for _ in range(2))
                dt = (d9 - d1) / 8
                log(f"{sub} rep{rep} {name}: {dt * 1e3:.2f} ms/frame "
                    f"({h * w / dt / 1e6:.0f} MPix/s)")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
