#!/usr/bin/env python
"""Round-2 throughput datapoints on one real chip: 8K single-frame,
batched 1080p (fused batch program), 4K restart=0 (the former 65x XLA
cliff), and quality extremes. bench.py methodology (amortized chains +
dependent scalar probe)."""

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

    def chain_time(fn, arg, probe):
        def chain(k):
            t0 = time.perf_counter()
            outs = [fn(arg) for _ in range(k)]
            float(probe(outs[-1]))
            return time.perf_counter() - t0
        d1 = min(chain(1) for _ in range(3))
        d11 = min(chain(11) for _ in range(3))
        return (d11 - d1) / 10

    probe = jax.jit(lambda o: jnp.sum(o[1]) +
                    jnp.sum(o[0][::4099].astype(jnp.int32)))

    cases = [
        ("4K q90 rows", (2160, 3840), dict(quality=90,
                                           restart_interval="rows")),
        ("8K q90 rows", (4320, 7680), dict(quality=90,
                                           restart_interval="rows")),
        ("4K q90 restart=0", (2160, 3840), dict(quality=90,
                                                restart_interval=0)),
        ("4K q50 rows", (2160, 3840), dict(quality=50,
                                           restart_interval="rows")),
        ("4K q75 rows", (2160, 3840), dict(quality=75,
                                           restart_interval="rows")),
        # every shipped mode gets a measured 4K number (VERDICT r2 #9)
        ("4K q90 444", (2160, 3840), dict(quality=90, subsampling="444",
                                          restart_interval="rows")),
        ("4K q90 422", (2160, 3840), dict(quality=90, subsampling="422",
                                          restart_interval="rows")),
        ("4K q90 gray", (2160, 3840), dict(quality=90, subsampling="gray",
                                           restart_interval="rows")),
    ]
    if "batch-only" in sys.argv:
        cases = []
    for name, (h, w), kw in cases:
        kw = dict(kw)
        kw.setdefault("subsampling", "420")
        img = content(h, w, rng)
        if kw["subsampling"] == "gray":
            img = img[..., 0]
        cfg = EncoderConfig(**kw)
        jpg = enc_mod.Encoder(cfg).encode(img)     # warm + correctness
        assert jpg[:2] == b"\xff\xd8" and jpg[-2:] == b"\xff\xd9"
        fn, _, _ = enc_mod._jitted_encode((h, w), cfg)
        # flat-RGB parameter = the production fast path (encoder._run_device)
        imgd = jax.device_put(jnp.asarray(
            img if kw["subsampling"] == "gray" else img.reshape(h, -1)))
        float(probe(fn(imgd)))
        dt = chain_time(fn, imgd, probe)
        log(f"{name}: {dt * 1e3:.2f} ms/frame "
            f"({h * w / dt / 1e6:.0f} MPix/s) [{len(jpg)} B]")

    # fused batch program: 8 x 1080p
    h, w, bsz = 1080, 1920, 8
    imgs = np.stack([content(h, w, rng) for _ in range(bsz)])
    cfg = EncoderConfig(quality=90, subsampling="420",
                        restart_interval="rows")
    files = enc_mod.encode_batch(list(imgs), quality=90,
                                 subsampling="420",
                                 restart_interval="rows")
    assert all(f[:2] == b"\xff\xd8" for f in files)
    fnb, _, _ = enc_mod._jitted_encode_batch(bsz, (h, w), cfg)
    imgsd = jax.device_put(jnp.asarray(imgs.reshape(bsz, h, -1)))
    float(probe(fnb(imgsd)))
    dt = chain_time(fnb, imgsd, probe)
    log(f"batch {bsz}x1080p q90: {dt * 1e3:.2f} ms/batch "
        f"({bsz * h * w / dt / 1e6:.0f} MPix/s)")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
