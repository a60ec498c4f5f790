#!/usr/bin/env python
"""HW byte-gate + interleaved A/B for the grouped compaction chains
(EncoderConfig.compact_groups / kernels/compact._compact_stuff_kernel_gkb).

Per gs in {1, 2, 4, 8, 16}: build the full 4K device program, stitch the
grouped spans on the host exactly as Encoder.encode_to_scan does, assert
the scan bytes identical to gs=1, then interleaved amortized timing.
The compact kernel is the latency-bound 1.34 ms of the ~5 ms frame; gs
independent chains with per-group windows are the batching axis that
does NOT grow the window (the kb=4/6 failure mode)."""

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

    sub = sys.argv[1] if len(sys.argv) > 1 else "420"
    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    img = np.clip(base[..., None] + rng.normal(0, 12, (h, w, 3)),
                  0, 255).astype(np.uint8)
    if sub == "gray":
        img = img[..., 0]
    imgd = jax.device_put(jnp.asarray(img))
    probe = jax.jit(lambda o: jnp.sum(o[1]) +
                    jnp.sum(o[0].reshape(-1)[::4099].astype(jnp.int32)))

    def scan_bytes(out, gs):
        if gs == 1:
            total = int(np.asarray(out[3]))
            return np.asarray(out[0]).view(np.uint8)[:total].tobytes()
        glens = np.asarray(out[4])
        st2 = out[0]
        return b"".join(
            np.asarray(st2[g]).view(np.uint8)[:glens[g]].tobytes()
            for g in range(st2.shape[0]))

    gss = [1, 2, 4, 8, 16]
    fns = {}
    ref = None
    for gs in gss:
        cfg = EncoderConfig(quality=90, subsampling=sub,
                            restart_interval="rows", compact_groups=gs)
        t0 = time.perf_counter()
        fn, _, _ = enc_mod._jitted_encode((h, w), cfg)
        out = fn(imgd)
        float(probe(out))
        log(f"gs={gs}: compiled+ran in {time.perf_counter() - t0:.0f}s")
        sb = scan_bytes(out, gs)
        if ref is None:
            ref = sb
            log(f"gs=1: reference scan {len(sb)} B")
        else:
            ok = sb == ref
            log(f"gs={gs}: bytes {'IDENTICAL' if ok else 'MISMATCH'}")
            assert ok, f"gs={gs} IN-CONTEXT MISMATCH — do not ship"
        fns[gs] = fn

    def chain(fn, k):
        t0 = time.perf_counter()
        outs = [fn(imgd) for _ in range(k)]
        float(probe(outs[-1]))
        return time.perf_counter() - t0

    for rep in range(3):
        for gs in gss:
            fn = fns[gs]
            d1 = min(chain(fn, 1) for _ in range(2))
            d9 = min(chain(fn, 9) for _ in range(2))
            dt = (d9 - d1) / 8
            log(f"rep{rep} gs={gs}: {dt * 1e3:.2f} ms/frame "
                f"({h * w / dt / 1e6:.0f} MPix/s)")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
