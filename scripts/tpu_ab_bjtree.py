#!/usr/bin/env python
"""HW byte-gate + A/B: tree-structured bit_join (entropy_pack._BJ_TREE)
x restart=0 VSEG fan-out.

ab_vseg.log showed larger fan-outs LOSE because the linear bit_join's
cost grows with the stream count (S x out_words passes); the pairwise
tree join is log2(S) x out_words, so it should (a) shave the join cost
at VSEG=8 and (b) flip the sign of the VSEG=16/32 appends-vs-join
trade. Bytes must be identical in every combo."""

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
    imgd = jax.device_put(jnp.asarray(img))
    probe = jax.jit(lambda o: jnp.sum(o[1]) +
                    jnp.sum(o[0].reshape(-1)[::4099].astype(jnp.int32)))
    cfg = EncoderConfig(quality=90, subsampling="420", restart_interval=0)

    def scan_bytes(out):
        total = int(np.asarray(out[3]))
        return np.asarray(out[0]).view(np.uint8)[:total].tobytes()

    combos = [("lin-v8", False, 8), ("tree-v8", True, 8),
              ("tree-v16", True, 16), ("tree-v32", True, 32)]
    fns = {}
    ref = None
    saved = (ep._BJ_TREE, enc_mod._VSEG)
    try:
        for name, tree, vs in combos:
            ep._BJ_TREE = tree
            enc_mod._VSEG = vs
            enc_mod._jitted_encode.cache_clear()
            t0 = time.perf_counter()
            try:
                fn, _, _ = enc_mod._jitted_encode((h, w), cfg)
                out = fn(imgd)
                float(probe(out))
            except Exception as e:
                log(f"{name}: FAILED ({type(e).__name__}: "
                    f"{str(e)[:160]})")
                continue
            log(f"{name}: compiled+ran in {time.perf_counter()-t0:.0f}s")
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
        ep._BJ_TREE, enc_mod._VSEG = saved
        enc_mod._jitted_encode.cache_clear()

    def chain(fn, k):
        t0 = time.perf_counter()
        outs = [fn(imgd) for _ in range(k)]
        float(probe(outs[-1]))
        return time.perf_counter() - t0

    for rep in range(3):
        for name, _, _ in combos:
            if name not in fns:
                continue
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
