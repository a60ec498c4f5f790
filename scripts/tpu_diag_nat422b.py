#!/usr/bin/env python
"""Which 422 in-context program is corrupt, nat or xla? Compare both
full-program device scans against the independent C++ CPU encoder
(byte-identical tier) at 4K, and localize the first differing byte."""

import dataclasses
import os
import sys

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
    from jpegtpu import native
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

    cfg = EncoderConfig(quality=90, subsampling="422",
                        restart_interval="rows")
    restart_n = 0  # rows mode: restart code computed by encoder internals
    log("computing C++ CPU reference scan...")
    # rows restart: one segment per MCU row -> restart interval = MCUs/row
    cpu = native.cpu_encode_scan(img, 90, "422", w // 16)
    log(f"cpu scan: {len(cpu)} B")

    for name in ("nat", "xla"):
        cfg_v = dataclasses.replace(cfg, pixel_path=name)
        fn, _, _ = enc_mod._jitted_encode((h, w), cfg_v)
        out = fn(imgd)
        float(probe(out))
        total = int(np.asarray(out[3]))
        scan = np.asarray(out[0]).view(np.uint8)[:total].tobytes()
        ok = scan == cpu
        log(f"{name}: {total} B vs cpu {len(cpu)} B equal={ok}")
        if not ok and total == len(cpu):
            a = np.frombuffer(scan, np.uint8)
            b = np.frombuffer(cpu, np.uint8)
            d = np.nonzero(a != b)[0]
            log(f"  {len(d)} differing bytes; first at {d[0]} "
                f"(frame {d[0] >> 12}), last at {d[-1]}")
    cfg_v = dataclasses.replace(cfg, pixel_path="nat")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
