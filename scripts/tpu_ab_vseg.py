#!/usr/bin/env python
"""HW byte-gate + A/B for the restart=0 virtual-segment fan-out
(encoder._VSEG). 8 fills one seg_merge sublane-row band, leaving 24 of
s_rows=32 idle at restart=0 (the 4.60 vs 3.43 ms rows gap is mostly
~3.4x the serial append iterations); 16/32 fill more rows at the cost
of proportionally more bit_join stream work. Bytes must be identical
for every VSEG (the virtual split is invisible in the output by
construction — DC prediction is restartless, the join is bit-exact)."""

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
    imgd = jax.device_put(jnp.asarray(img))
    probe = jax.jit(lambda o: jnp.sum(o[1]) +
                    jnp.sum(o[0].reshape(-1)[::4099].astype(jnp.int32)))
    cfg = EncoderConfig(quality=90, subsampling="420", restart_interval=0)

    def scan_bytes(out):
        # restart=0 has n_seg=1 -> single-chain stuffed stream
        total = int(np.asarray(out[3]))
        return np.asarray(out[0]).view(np.uint8)[:total].tobytes()

    vsegs = [8, 16, 32]
    fns = {}
    ref = None
    saved = enc_mod._VSEG
    try:
        for vs in vsegs:
            enc_mod._VSEG = vs
            enc_mod._jitted_encode.cache_clear()
            t0 = time.perf_counter()
            try:
                fn, _, _ = enc_mod._jitted_encode((h, w), cfg)
                out = fn(imgd)
                float(probe(out))
            except Exception as e:
                log(f"vseg={vs}: FAILED ({type(e).__name__}: "
                    f"{str(e)[:160]})")
                continue
            log(f"vseg={vs}: compiled+ran in {time.perf_counter()-t0:.0f}s")
            sb = scan_bytes(out)
            if ref is None:
                ref = sb
                log(f"vseg={vs}: reference scan {len(sb)} B")
            else:
                ok = sb == ref
                log(f"vseg={vs}: bytes {'IDENTICAL' if ok else 'MISMATCH'}")
                assert ok, f"vseg={vs} MISMATCH"
            fns[vs] = fn
    finally:
        enc_mod._VSEG = saved
        enc_mod._jitted_encode.cache_clear()

    def chain(fn, k):
        t0 = time.perf_counter()
        outs = [fn(imgd) for _ in range(k)]
        float(probe(outs[-1]))
        return time.perf_counter() - t0

    for rep in range(3):
        for vs in vsegs:
            if vs not in fns:
                continue
            fn = fns[vs]
            d1 = min(chain(fn, 1) for _ in range(2))
            d9 = min(chain(fn, 9) for _ in range(2))
            dt = (d9 - d1) / 8
            log(f"rep{rep} vseg={vs}: {dt * 1e3:.2f} ms/frame "
                f"({h * w / dt / 1e6:.0f} MPix/s)")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
