#!/usr/bin/env python
"""A/B the full device program with the Pallas pixel kernel vs the XLA
fused pixel path, interleaved in ONE process — the tunnel's run-to-run
variance (0.5-1.8 ms for the same program on different days) makes
cross-process comparisons meaningless."""

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
    cfg = EncoderConfig(quality=90, subsampling="420",
                        restart_interval="rows")

    import jpegtpu.kernels.fused_dctq as fd
    orig = fd.encode_blocks_pairs

    probe = jax.jit(lambda o: jnp.sum(o[1]) +
                    jnp.sum(o[0][::4099].astype(jnp.int32)))

    # jax.jit is lazy: warm each program while its patch is active.
    fd.encode_blocks_pairs = fd.encode_blocks_pallas_pairs
    fn_k, _, _ = enc_mod._jitted_encode((h, w), cfg)
    float(probe(fn_k(imgd)))
    fd.encode_blocks_pairs = orig
    enc_mod._jitted_encode.cache_clear()
    fn_x, _, _ = enc_mod._jitted_encode((h, w), cfg)  # production (XLA)
    float(probe(fn_x(imgd)))
    log("both programs warm")

    def chain(fn, k):
        t0 = time.perf_counter()
        outs = [fn(imgd) for _ in range(k)]
        float(probe(outs[-1]))
        return time.perf_counter() - t0

    for rep in range(3):
        for name, fn in (("kernel", fn_k), ("xla   ", fn_x)):
            d1 = min(chain(fn, 1) for _ in range(3))
            d21 = min(chain(fn, 21) for _ in range(3))
            dt = (d21 - d1) / 20
            log(f"{name} rep{rep}: {dt * 1e3:.2f} ms/frame "
                f"({h * w / dt / 1e6:.0f} MPix/s)")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
