#!/usr/bin/env python
"""HW A/B: chunk-free MCU-group upgrades via mode-aware first-pass
budgets (round 5, follow-up to ab_budget444.log).

The round-4 per-mode gm rules were derived under the 384-bit budget;
smaller budgets make LARGER groups chunk-free (ceil(g*bb/32)+2 <= 128):
  420 @330: gm=2 (12 blocks, 126 words) — halves seg_merge appends;
            the round-4 'grouping is net zero at 420' result was a
            budget artifact (gm=2 at 384 = 146 words = 2 chunks).
  422 @248: gm=4 (16 blocks, 126) — round-4 gm=4 was chunk-GROWING.
  gray @248: gm=16 (16 blocks, 126) — round-4 gm=16 was 2 chunks.
Unit capacity stays 4032 bits (336/block at 12, 252 at 16); denser
content escalates (tested path). mcu_group's generic rule picks the
upgraded gm automatically at the smaller budget — no kernel changes.
Bytes must be identical; timing decides."""

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
    grayd = jax.device_put(jnp.asarray(img[..., 0]))
    probe = jax.jit(lambda o: jnp.sum(o[1]) +
                    jnp.sum(o[0].reshape(-1)[::4099].astype(jnp.int32)))

    def scan_bytes(out):
        glens = np.asarray(out[4])
        st2 = out[0]
        return b"".join(
            np.asarray(st2[g]).view(np.uint8)[:glens[g]].tobytes()
            for g in range(st2.shape[0]))

    # (label, subsampling, bits_budget (explicit, so the comparison is
    # independent of the mode-aware defaults this A/B justified),
    # expected gm)
    combos = [
        ("420-b384", "420", 384, None), ("420-b330", "420", 330, 2),
        ("422-b384", "422", 384, None), ("422-b248", "422", 248, 4),
        ("gray-b384", "gray", 384, None), ("gray-b248", "gray", 248, 16),
    ]
    fns = {}
    refs = {}
    for name, sub, bud, want_gm in combos:
        enc_mod._jitted_encode.cache_clear()
        cfg = EncoderConfig(quality=90, subsampling=sub,
                            restart_interval="rows", bits_budget=bud)
        gm = enc_mod._entropy_mcu_group((h, w), cfg)
        log(f"{name}: auto gm={gm}"
            + ("" if want_gm is None else f" (expected {want_gm})"))
        src = grayd if sub == "gray" else imgd
        t0 = time.perf_counter()
        try:
            fn, _, _ = enc_mod._jitted_encode((h, w), cfg)
            out = fn(src)
            float(probe(out))
        except Exception as e:
            log(f"{name}: FAILED ({type(e).__name__}: {str(e)[:160]})")
            continue
        log(f"{name}: compiled+ran in {time.perf_counter() - t0:.0f}s")
        sb = scan_bytes(out)
        if sub not in refs:
            refs[sub] = sb
            log(f"{name}: reference scan {len(sb)} B")
        else:
            ok = sb == refs[sub]
            log(f"{name}: bytes {'IDENTICAL' if ok else 'MISMATCH'}")
            assert ok, f"{name} MISMATCH"
        fns[name] = (fn, src)

    def chain(fn, src, k):
        t0 = time.perf_counter()
        outs = [fn(src) for _ in range(k)]
        float(probe(outs[-1]))
        return time.perf_counter() - t0

    for rep in range(3):
        for name, _, _, _ in combos:
            if name not in fns:
                continue
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
