#!/usr/bin/env python
"""A/B the conditional-plane-2 compact kernel (_COMPACT_SKIP_P2) against
the unconditional 3-plane baseline, interleaved in ONE process (tunnel
variance makes cross-process comparisons meaningless). Full 4K device
program, bytes asserted equal between variants first."""

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
    import jpegtpu.kernels.compact as cp
    import jpegtpu.kernels.entropy_pack as ep

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    img = np.clip(base[..., None] + rng.normal(0, 12, (h, w, 3)),
                  0, 255).astype(np.uint8)
    imgd = jax.device_put(jnp.asarray(img))
    cfg = EncoderConfig(quality=90, subsampling="420",
                        restart_interval="rows")
    probe = jax.jit(lambda o: jnp.sum(o[1]) +
                    jnp.sum(o[0][::4099].astype(jnp.int32)))

    fns = {}
    outs = {}
    for name, flag in (("p2-skip", True), ("baseline", False)):
        cp._COMPACT_SKIP_P2 = flag
        enc_mod._jitted_encode.cache_clear()
        fn, _, _ = enc_mod._jitted_encode((h, w), cfg)
        outs[name] = fn(imgd)
        float(probe(outs[name]))
        fns[name] = fn
        log(f"{name} warm")
    cp._COMPACT_SKIP_P2 = True
    enc_mod._jitted_encode.cache_clear()

    # Compare the VALID scan prefix only: bytes past `total` are never
    # DMA'd (slack frames of separately allocated buffers — arbitrary
    # garbage, diagnosed slack-only by scripts/tpu_diag_p2.py on HW).
    ta = int(np.asarray(outs["p2-skip"][3]))
    tb = int(np.asarray(outs["baseline"][3]))
    sa = np.asarray(outs["p2-skip"][0])[:ta]
    sb = np.asarray(outs["baseline"][0])[:tb]
    log(f"totals: {ta} vs {tb}; valid scan identical: "
        f"{np.array_equal(sa, sb)}")
    assert ta == tb and np.array_equal(sa, sb), \
        "IN-CONTEXT MISMATCH — do not ship"

    def chain(fn, k):
        t0 = time.perf_counter()
        os_ = [fn(imgd) for _ in range(k)]
        float(probe(os_[-1]))
        return time.perf_counter() - t0

    for rep in range(3):
        for name in ("p2-skip", "baseline"):
            fn = fns[name]
            d1 = min(chain(fn, 1) for _ in range(3))
            d21 = min(chain(fn, 21) for _ in range(3))
            dt = (d21 - d1) / 20
            log(f"{name} rep{rep}: {dt * 1e3:.2f} ms/frame "
                f"({h * w / dt / 1e6:.0f} MPix/s)")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
