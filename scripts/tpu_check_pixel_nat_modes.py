#!/usr/bin/env python
"""HW byte-parity + quick perf of the natural-layout pixel kernel on the
non-420 geometries it now covers (422 grp=8, 444 grp=16), in-context:
full device program, nat vs xla scan bytes asserted equal, then a short
amortized timing per mode. (420 is covered by scripts/tpu_ab_pixel_nat.py.)
"""

import dataclasses
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
    log(f"backend {jax.default_backend()}")

    from jpegtpu import encoder as enc_mod
    from jpegtpu.config import EncoderConfig

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    img = np.clip(base[..., None] + rng.normal(0, 12, (h, w, 3)),
                  0, 255).astype(np.uint8)
    imgd = jax.device_put(jnp.asarray(img))
    probe = jax.jit(lambda o: jnp.sum(o[1]) +
                    jnp.sum(o[0][::4099].astype(jnp.int32)))

    def chain(fn, k):
        t0 = time.perf_counter()
        os_ = [fn(imgd) for _ in range(k)]
        float(probe(os_[-1]))
        return time.perf_counter() - t0

    for sub in ("422", "444"):
        cfg = EncoderConfig(quality=90, subsampling=sub,
                            restart_interval="rows")
        ref = None
        fns = {}
        for name in ("nat", "xla"):
            cfg_v = dataclasses.replace(cfg, pixel_path=name)
            fn, _, _ = enc_mod._jitted_encode((h, w), cfg_v)
            out = fn(imgd)
            float(probe(out))
            total = int(np.asarray(out[3]))
            scan = np.asarray(out[0]).view(np.uint8)[:total]
            if ref is None:
                ref = (total, scan)
            else:
                assert total == ref[0] and np.array_equal(scan, ref[1]), \
                    f"{sub}/{name} IN-CONTEXT MISMATCH — do not ship"
            fns[name] = fn
            log(f"{sub} {name} warm, scan identical ({total} B)")
        for name in ("nat", "xla"):
            fn = fns[name]
            d1 = min(chain(fn, 1) for _ in range(3))
            d9 = min(chain(fn, 9) for _ in range(3))
            dt = (d9 - d1) / 8
            log(f"{sub} {name}: {dt * 1e3:.2f} ms/frame "
                f"({h * w / dt / 1e6:.0f} MPix/s)")
    cfg_v = dataclasses.replace(cfg, pixel_path="nat")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
