#!/usr/bin/env python
"""HW A/B: per-mode first-pass bit budget at 444 (round 5).

At the default 384 bits/block a gm=4 unit (12 blocks) needs
ceil(12*384/32)+2 = 146 words -> TWO 128-word stream chunks; at 330 it
fits ONE (126). chunks=1 halves block_pack's merge chunk passes and
seg_merge's per-append vector work at identical append count. gm=8
(g=24) drops from 3 chunks (VMEM-rejected at 384) to 2 at 330 — half
the appends of gm=4 at the same chunks-per-unit — probed via the
FORCE_GM escape hatch. Bytes must be identical in every case (budget is
a buffer-sizing knob; overflow escalates to the worst case, asserted by
the encoder). Timing decides.

Content realism note: the bench content at q90 averages ~100 bits/block;
330 leaves ~3x headroom per UNIT (4032 bits/12 blocks). Denser content
triggers the tested escalation (2x cost on that frame only)."""

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

    def scan_bytes(out):
        glens = np.asarray(out[4])
        st2 = out[0]
        return b"".join(
            np.asarray(st2[g]).view(np.uint8)[:glens[g]].tobytes()
            for g in range(st2.shape[0]))

    # (label, bits_budget, force_gm or None)
    combos = [("b384-gm4", 0, None), ("b330-gm4", 330, None),
              ("b330-gm8", 330, "8"), ("b300-gm8", 300, "8")]
    fns = {}
    ref = None
    try:
        for name, bud, gm in combos:
            if gm is None:
                os.environ.pop("JPEGTPU_FORCE_GM", None)
            else:
                os.environ["JPEGTPU_FORCE_GM"] = gm
            enc_mod._jitted_encode.cache_clear()
            cfg = EncoderConfig(quality=90, subsampling="444",
                                restart_interval="rows", bits_budget=bud)
            t0 = time.perf_counter()
            try:
                fn, _, _ = enc_mod._jitted_encode((h, w), cfg)
                out = fn(imgd)
                float(probe(out))
            except Exception as e:
                log(f"{name}: FAILED ({type(e).__name__}: "
                    f"{str(e)[:160]})")
                continue
            log(f"{name}: compiled+ran in {time.perf_counter() - t0:.0f}s")
            sb = scan_bytes(out)
            if ref is None:
                ref = sb
                log(f"{name}: reference scan {len(sb)} B")
            else:
                ok = sb == ref
                log(f"{name}: bytes {'IDENTICAL' if ok else 'MISMATCH'}")
                assert ok, f"{name} MISMATCH"
            fns[name] = fn
    finally:
        os.environ.pop("JPEGTPU_FORCE_GM", None)
        enc_mod._jitted_encode.cache_clear()

    def chain(fn, k):
        t0 = time.perf_counter()
        outs = [fn(imgd) for _ in range(k)]
        float(probe(outs[-1]))
        return time.perf_counter() - t0

    for rep in range(3):
        for name in fns:
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
