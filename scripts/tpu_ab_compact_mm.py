#!/usr/bin/env python
"""HW byte-gate + interleaved A/B for the MXU one-hot window placement
in the stuffing kernels (kernels/compact._mm_place_contrib,
_COMPACT_MM_PLACE).

The placement fold is the serial backbone of the latency-bound compact
kernel (144 chained OR-selects per iteration at kb=3); the matmul form
replaces it with 2 tiny MXU dots + one OR. Gate: full 4K device program
scan bytes (both compact_groups=1 and the production gs=8) vs the
fold form, then interleaved amortized timing. Also re-runs the 444 and
gray geometries' byte checks (different n_seg / frame shapes)."""

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
    from jpegtpu.kernels import compact as cp
    log(f"backend {jax.default_backend()}")

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    img = np.clip(base[..., None] + rng.normal(0, 12, (h, w, 3)),
                  0, 255).astype(np.uint8)
    imgd = jax.device_put(jnp.asarray(img))
    gray = img[..., 0]
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

    # (label, mm_place, zmask, subsampling, gs)
    combos = [
        ("fold-gs8-420", False, False, "420", 8),
        ("mm-gs8-420", True, False, "420", 8),
        ("mmz-gs8-420", True, True, "420", 8),
        ("mmz-gs1-420", True, True, "420", 1),
        ("fold-gs8-444", False, False, "444", 8),
        ("mm-gs8-444", True, False, "444", 8),
        ("mmz-gs8-444", True, True, "444", 8),
        ("fold-gs8-gray", False, False, "gray", 8),
        ("mmz-gs8-gray", True, True, "gray", 8),
        ("mmz-gs8-422", True, True, "422", 8),
        ("fold-gs8-422", False, False, "422", 8),
    ]
    fns = {}
    refs = {}
    saved = (cp._COMPACT_MM_PLACE, cp._COMPACT_ZMASK)
    try:
        for name, mm, zm, sub, gs in combos:
            cp._COMPACT_MM_PLACE = mm
            cp._COMPACT_ZMASK = zm
            enc_mod._jitted_encode.cache_clear()
            cfg = EncoderConfig(quality=90, subsampling=sub,
                                restart_interval="rows", compact_groups=gs)
            src = gray if sub == "gray" else imgd
            t0 = time.perf_counter()
            fn, _, _ = enc_mod._jitted_encode((h, w), cfg)
            out = fn(src)
            float(probe(out))
            log(f"{name}: compiled+ran in {time.perf_counter() - t0:.0f}s")
            sb = scan_bytes(out, gs)
            key = (sub, gs)
            if key not in refs:
                refs[key] = sb
                log(f"{name}: reference scan {len(sb)} B")
            else:
                ok = sb == refs[key]
                log(f"{name}: bytes "
                    f"{'IDENTICAL' if ok else 'MISMATCH'}")
                assert ok, f"{name} IN-CONTEXT MISMATCH — do not ship"
            fns[name] = (fn, src)
    finally:
        cp._COMPACT_MM_PLACE, cp._COMPACT_ZMASK = saved
        enc_mod._jitted_encode.cache_clear()

    def chain(fn, src, k):
        t0 = time.perf_counter()
        outs = [fn(src) for _ in range(k)]
        float(probe(outs[-1]))
        return time.perf_counter() - t0

    for rep in range(3):
        for name, _, _, _, _ in combos:
            fn, src = fns[name]
            d1 = min(chain(fn, src, 1) for _ in range(2))
            d9 = min(chain(fn, src, 9) for _ in range(2))
            dt = (d9 - d1) / 8
            log(f"rep{rep} {name}: {dt * 1e3:.2f} ms/frame "
                f"({h * w / dt / 1e6:.0f} MPix/s)")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
