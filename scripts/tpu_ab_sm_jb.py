#!/usr/bin/env python
"""HW byte-gate + interleaved A/B for seg_merge jb batching
(entropy_pack._SM_JB): jb MCU columns per serial window iteration —
the same latency-hiding axis as compact's kb batching and the 444 gm=4
grouping. Gate: full 4K device program's stuffed scan bytes; modes 420
(chunks=1, jb up to 8 allowed; test 2/4) and 444 (gm=4, chunks=2,
jb<=4)."""

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
    from jpegtpu.kernels import entropy_pack as ep
    log(f"backend {jax.default_backend()}")

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    img = np.clip(base[..., None] + rng.normal(0, 12, (h, w, 3)),
                  0, 255).astype(np.uint8)
    imgd = jax.device_put(jnp.asarray(img.reshape(h, -1)))
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

    def chain(fn, k):
        t0 = time.perf_counter()
        outs = [fn(imgd) for _ in range(k)]
        float(probe(outs[-1]))
        return time.perf_counter() - t0

    for sub in ("420", "444"):
        cfg = EncoderConfig(quality=90, subsampling=sub,
                            restart_interval="rows")
        fns = {}
        ref = None
        for jbv in (1, 2, 4, 8):
            ep._SM_JB = jbv
            try:
                enc_mod._jitted_encode.cache_clear()
                t0 = time.perf_counter()
                fn, _, _ = enc_mod._jitted_encode((h, w), cfg)
                out = fn(imgd)
                float(probe(out))
                log(f"{sub} jb={jbv}: compiled+ran in "
                    f"{time.perf_counter() - t0:.0f}s")
                sb = scan_bytes(out)
                if ref is None:
                    ref = sb
                    log(f"{sub} jb=1: reference scan {len(sb)} B")
                else:
                    ok = sb == ref
                    log(f"{sub} jb={jbv}: bytes "
                        f"{'IDENTICAL' if ok else 'MISMATCH'}")
                    assert ok, f"{sub}/jb={jbv} MISMATCH — do not ship"
                fns[jbv] = fn
            finally:
                ep._SM_JB = 1
        enc_mod._jitted_encode.cache_clear()
        for rep in range(3):
            for jbv, fn in fns.items():
                d1 = min(chain(fn, 1) for _ in range(2))
                d9 = min(chain(fn, 9) for _ in range(2))
                dt = (d9 - d1) / 8
                log(f"{sub} rep{rep} jb={jbv}: {dt * 1e3:.2f} ms/frame "
                    f"({h * w / dt / 1e6:.0f} MPix/s)")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
