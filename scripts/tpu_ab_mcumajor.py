#!/usr/bin/env python
"""In-process A/B: mcu-major block_pack->seg_merge handoff vs the
segment-major transpose path, both on the production XLA pixel path."""

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
    probe = jax.jit(lambda o: jnp.sum(o[1]) +
                    jnp.sum(o[0][::4099].astype(jnp.int32)))

    fn_mm, _, _ = enc_mod._jitted_encode((h, w), cfg)
    out_mm = fn_mm(imgd)
    float(probe(out_mm))
    enc_mod._jitted_encode.cache_clear()
    orig = enc_mod._mcu_major_ok
    enc_mod._mcu_major_ok = lambda *a: False
    fn_tr, _, _ = enc_mod._jitted_encode((h, w), cfg)
    out_tr = fn_tr(imgd)
    float(probe(out_tr))
    enc_mod._mcu_major_ok = orig
    # compare the VALID stream prefix only: frames past each segment's
    # bit length are never written by the merge kernels, so the raw
    # buffers differ in uninitialized tails that compaction never reads
    tot_mm = int(out_mm[3])
    tot_tr = int(out_tr[3])
    words = tot_mm // 4
    same = (tot_mm == tot_tr and
            bool(jnp.array_equal(out_mm[0][:words], out_tr[0][:words])) and
            bool(jnp.array_equal(out_mm[1], out_tr[1])))
    log(f"valid stream identical: {same} ({tot_mm} vs {tot_tr} bytes)")

    def chain(fn, k):
        t0 = time.perf_counter()
        outs = [fn(imgd) for _ in range(k)]
        float(probe(outs[-1]))
        return time.perf_counter() - t0

    for rep in range(6):
        for name, fn in (("mcu-major", fn_mm), ("transpose", fn_tr)):
            d1 = min(chain(fn, 1) for _ in range(4))
            d21 = min(chain(fn, 21) for _ in range(3))
            dt = (d21 - d1) / 20
            log(f"{name} rep{rep}: {dt * 1e3:.2f} ms/frame "
                f"({h * w / dt / 1e6:.0f} MPix/s)")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
