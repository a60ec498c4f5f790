#!/usr/bin/env python
"""HW byte-gate + interleaved A/B for the DC-plane pixel-kernel output
(fused_dctq._PIXEL_DC / _pixel_kernel_nat_dc): dc_diffs consumes the
kernel-emitted [nMCU, 8] plane instead of strided-slicing the 50-100 MB
coefficient tensor. Gate: full device program scan bytes at 420 and 444
(gm=4 grouped path) vs the slice form, then interleaved timing."""

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
    from jpegtpu.kernels import fused_dctq as fdq
    log(f"backend {jax.default_backend()}")

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    img = np.clip(base[..., None] + rng.normal(0, 12, (h, w, 3)),
                  0, 255).astype(np.uint8)
    imgd = jax.device_put(jnp.asarray(img))
    probe = jax.jit(lambda o: jnp.sum(o[1]) +
                    jnp.sum(o[0].reshape(-1)[::4099].astype(jnp.int32)))

    def scan_bytes(out):
        glens = np.asarray(out[4])
        st2 = out[0]
        return b"".join(
            np.asarray(st2[g]).view(np.uint8)[:glens[g]].tobytes()
            for g in range(st2.shape[0]))

    combos = [("slice-420", False, "420"), ("dc-420", True, "420"),
              ("slice-444", False, "444"), ("dc-444", True, "444"),
              ("slice-422", False, "422"), ("dc-422", True, "422")]
    fns = {}
    refs = {}
    saved = fdq._PIXEL_DC
    try:
        for name, dc, sub in combos:
            fdq._PIXEL_DC = dc
            enc_mod._jitted_encode.cache_clear()
            cfg = EncoderConfig(quality=90, subsampling=sub,
                                restart_interval="rows")
            t0 = time.perf_counter()
            fn, _, _ = enc_mod._jitted_encode((h, w), cfg)
            out = fn(imgd)
            float(probe(out))
            log(f"{name}: compiled+ran in {time.perf_counter() - t0:.0f}s")
            sb = scan_bytes(out)
            if sub not in refs:
                refs[sub] = sb
                log(f"{name}: reference scan {len(sb)} B")
            else:
                ok = sb == refs[sub]
                log(f"{name}: bytes {'IDENTICAL' if ok else 'MISMATCH'}")
                assert ok, f"{name} IN-CONTEXT MISMATCH — do not ship"
            fns[name] = fn
    finally:
        fdq._PIXEL_DC = saved
        enc_mod._jitted_encode.cache_clear()

    def chain(fn, k):
        t0 = time.perf_counter()
        outs = [fn(imgd) for _ in range(k)]
        float(probe(outs[-1]))
        return time.perf_counter() - t0

    for rep in range(3):
        for name, _, _ in combos:
            fn = fns[name]
            d1 = min(chain(fn, 1) for _ in range(2))
            d9 = min(chain(fn, 9) for _ in range(2))
            dt = (d9 - d1) / 8
            log(f"rep{rep} {name}: {dt * 1e3:.2f} ms/frame "
                f"({h * w / dt / 1e6:.0f} MPix/s)")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
