#!/usr/bin/env python
"""HW gate + timing for the fused 444s pixel path (round 5): the
6-channel [orig | smoothed] operator replaces the staged-oracle
fallback (177 MPix/s at 4K). Gate: the full device program must decode
within the PIL-parity PSNR floor and match the ops-oracle Encoder's
bytes (both tiers share the front-end, so bytes must be identical to
the XLA-tier Encoder); then amortized timing."""

import io
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
    cfg = EncoderConfig(quality=90, subsampling="444s",
                        restart_interval="rows")

    # Byte gates: Pallas entropy tier vs XLA entropy tier (shared pixel
    # front-end -> must be identical). Full fruit (253x254) exercises
    # the non-8-aligned ops-fallback front-end; the 248x248 crop the
    # fused in-operator-smoothing front-end + nat Pallas kernel.
    from jpegtpu.io import ppm
    fruit = ppm.read_pnm("/root/reference/data/fruit.ppm")
    for name, src in (("fruit-odd", fruit),
                      ("fruit-248crop", fruit[:248, :248])):
        got = enc_mod.Encoder(cfg).encode(src)
        want = enc_mod.Encoder(EncoderConfig(
            quality=90, subsampling="444s", restart_interval="rows",
            device_bitpack=False)).encode(src)
        ok = got == want
        log(f"{name} 444s tiers: {'BYTES MATCH' if ok else 'MISMATCH'} "
            f"({len(got)} B)")
        assert ok

    # PSNR sanity on the 4K content through the device pipeline.
    jpg = enc_mod.Encoder(cfg).encode(img)
    from PIL import Image
    dec = np.asarray(Image.open(io.BytesIO(jpg)).convert("RGB"),
                     dtype=np.float64)
    mse = float(np.mean((dec - img.astype(np.float64)) ** 2))
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    log(f"4K 444s PSNR {psnr:.2f} dB ({len(jpg)} B)")
    assert psnr > 25

    imgd = jax.device_put(jnp.asarray(img))
    probe = jax.jit(lambda o: jnp.sum(o[1]) +
                    jnp.sum(o[0].reshape(-1)[::4099].astype(jnp.int32)))
    fn, _, _ = enc_mod._jitted_encode((h, w), cfg)
    float(probe(fn(imgd)))

    def chain(k):
        t0 = time.perf_counter()
        outs = [fn(imgd) for _ in range(k)]
        float(probe(outs[-1]))
        return time.perf_counter() - t0

    for rep in range(3):
        d1 = min(chain(1) for _ in range(2))
        d9 = min(chain(9) for _ in range(2))
        dt = (d9 - d1) / 8
        log(f"rep{rep} 444s fused: {dt * 1e3:.2f} ms/frame "
            f"({h * w / dt / 1e6:.0f} MPix/s)")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
