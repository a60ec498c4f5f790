#!/usr/bin/env python
"""HW byte-gate + A/B: chunk-GROWING MCU grouping at 444 (gm=4,
chunks=2) vs the chunk-free default (gm=2, chunks=1).

Hypothesis: like compact's kb batching, seg_merge's serial appends are
the cost — gm=4 halves them (240 -> 120 per segment) at 2x per-append
vector work and 2x merge gathers in block_pack; the 420 "pairs = net
zero" result may not transfer to 444's geometry. Gate: full-program
stuffed scan bytes vs the default."""

import functools
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

    sub = sys.argv[1] if len(sys.argv) > 1 else "444"
    gms = [int(x) for x in (sys.argv[2:] or ["2", "4"])]
    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    img = np.clip(base[..., None] + rng.normal(0, 12, (h, w, 3)),
                  0, 255).astype(np.uint8)
    if sub == "gray":
        img = img[..., 0]
        imgd = jax.device_put(jnp.asarray(img))
    else:
        imgd = jax.device_put(jnp.asarray(img.reshape(h, -1)))
    probe = jax.jit(lambda o: jnp.sum(o[1]) +
                    jnp.sum(o[0].reshape(-1)[::4099].astype(jnp.int32)))
    cfg = EncoderConfig(quality=90, subsampling=sub,
                        restart_interval="rows")
    restart, n_seg, mps = enc_mod._geometry((h, w), cfg)

    def build(gm):
        fn = functools.partial(
            enc_mod._device_encode_pallas, quality=cfg.quality,
            subsampling=cfg.subsampling, restart=restart, n_seg=n_seg,
            mcus_per_seg=mps, bits_budget=cfg.first_pass_budget,
            use_fused=True, device_stuff=True, pixel_path=cfg.pixel_path,
            compact_kb=cfg.compact_kb, mcu_group=gm,
            compact_groups=cfg.compact_groups)
        return jax.jit(fn)

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

    fns = {}
    ref = None
    for gm in gms:
        if mps % gm:
            continue
        fn = build(gm)
        t0 = time.perf_counter()
        out = fn(imgd)
        float(probe(out))
        log(f"gm={gm}: compiled+ran in {time.perf_counter() - t0:.0f}s")
        sb = scan_bytes(out)
        if ref is None:
            ref = sb
            log(f"gm={gm}: reference scan {len(sb)} B")
        else:
            ok = sb == ref
            log(f"gm={gm}: bytes {'IDENTICAL' if ok else 'MISMATCH'}")
            assert ok, f"gm={gm} MISMATCH — do not ship"
        fns[gm] = fn
    for rep in range(3):
        for gm, fn in fns.items():
            d1 = min(chain(fn, 1) for _ in range(2))
            d9 = min(chain(fn, 9) for _ in range(2))
            dt = (d9 - d1) / 8
            log(f"rep{rep} gm={gm}: {dt * 1e3:.2f} ms/frame "
                f"({h * w / dt / 1e6:.0f} MPix/s)")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
