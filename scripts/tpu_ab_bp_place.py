#!/usr/bin/env python
"""HW byte-gate + interleaved A/B for the round-4 _place_pair gather
cuts (_BP_PLACE_PACKED: one packed-plane ps_at gather per place call;
_BP_RANK6: 6-probe rank search). Both are bit-identical in interpret
mode (tests/test_kernels.py::test_block_pack_place_variants_bit_identical)
but int32 vector variants of this kernel have MISCOMPILED in-context
before (entropy_pack._place_pair docstring), so the gate here is the
full 4K device program's stuffed scan bytes vs the production form,
then interleaved amortized timing of all four combos."""

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
                    jnp.sum(o[0][::4099].astype(jnp.int32)))
    cfg = EncoderConfig(quality=90, subsampling="420",
                        restart_interval="rows")

    combos = [("base", False, False), ("packed", True, False),
              ("rank6", False, True), ("both", True, True)]
    fns = {}
    ref = None
    for name, pp, r6 in combos:
        ep._BP_PLACE_PACKED, ep._BP_RANK6 = pp, r6
        try:
            # fresh trace per combo (module flags are not cache-keyed:
            # candidates only — promote to EncoderConfig if adopted)
            enc_mod._jitted_encode.cache_clear()
            fn, _, _ = enc_mod._jitted_encode((h, w), cfg)
            out = fn(imgd)
            float(probe(out))
            total = int(np.asarray(out[3]))
            scan = np.asarray(out[0]).view(np.uint8)[:total]
            if ref is None:
                ref = (total, scan)
                log(f"{name}: reference scan {total} B")
            else:
                ok = total == ref[0] and np.array_equal(scan, ref[1])
                log(f"{name}: bytes {'IDENTICAL' if ok else 'MISMATCH'}")
                assert ok, f"{name} IN-CONTEXT MISMATCH — do not ship"
            fns[name] = fn
        finally:
            ep._BP_PLACE_PACKED = ep._BP_RANK6 = False
    enc_mod._jitted_encode.cache_clear()

    def chain(fn, k):
        t0 = time.perf_counter()
        outs = [fn(imgd) for _ in range(k)]
        float(probe(outs[-1]))
        return time.perf_counter() - t0

    for rep in range(3):                       # interleaved reps
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
