#!/usr/bin/env python
"""HW A/B: compact_groups at LARGER segment counts (round 5).

gs=16 tested negative at 4K's 135 segments (round 4: more chains than
latency to hide). 8K has 270 rows-restart segments and the 8x1080p
fused batch 544 — re-sweep gs there, post-MM-placement (the chains are
cheaper now, which also shifts the optimum). Bytes gated per shape."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tpu_stages_common import log  # noqa: E402


def content(h, w, rng):
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    return np.clip(base[..., None] + rng.normal(0, 12, (h, w, 3)),
                   0, 255).astype(np.uint8)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from jpegtpu import encoder as enc_mod
    from jpegtpu.config import EncoderConfig
    log(f"backend {jax.default_backend()}")

    rng = np.random.default_rng(0)
    img8k = content(4320, 7680, rng)
    img8kd = jax.device_put(jnp.asarray(img8k))
    probe = jax.jit(lambda o: jnp.sum(o[1]) +
                    jnp.sum(o[0].reshape(-1)[::4099].astype(jnp.int32)))

    def scan_bytes(out, gs):
        if gs == 1 or out[0].ndim == 1:
            total = int(np.asarray(out[3]))
            return np.asarray(out[0]).view(np.uint8)[:total].tobytes()
        glens = np.asarray(out[4])
        st2 = out[0]
        return b"".join(
            np.asarray(st2[g]).view(np.uint8)[:glens[g]].tobytes()
            for g in range(st2.shape[0]))

    # --- 8K single frame, gs sweep ---
    fns = {}
    ref = None
    for gs in (8, 16, 32):
        cfg = EncoderConfig(quality=90, subsampling="420",
                            restart_interval="rows", compact_groups=gs)
        t0 = time.perf_counter()
        try:
            fn, _, _ = enc_mod._jitted_encode((4320, 7680), cfg)
            out = fn(img8kd)
            float(probe(out))
        except Exception as e:
            log(f"8k gs={gs}: FAILED ({type(e).__name__}: {str(e)[:140]})")
            continue
        log(f"8k gs={gs}: compiled+ran in {time.perf_counter()-t0:.0f}s")
        sb = scan_bytes(out, gs)
        if ref is None:
            ref = sb
            log(f"8k gs={gs}: reference scan {len(sb)} B")
        else:
            ok = sb == ref
            log(f"8k gs={gs}: bytes {'IDENTICAL' if ok else 'MISMATCH'}")
            assert ok
        fns[gs] = fn

    def chain(fn, src, k):
        t0 = time.perf_counter()
        outs = [fn(src) for _ in range(k)]
        float(probe(outs[-1]))
        return time.perf_counter() - t0

    for rep in range(3):
        for gs, fn in fns.items():
            d1 = min(chain(fn, img8kd, 1) for _ in range(2))
            d5 = min(chain(fn, img8kd, 5) for _ in range(2))
            dt = (d5 - d1) / 4
            log(f"rep{rep} 8k gs={gs}: {dt * 1e3:.2f} ms/frame "
                f"({4320 * 7680 / dt / 1e6:.0f} MPix/s)")

    # --- 8x1080p fused batch, gs sweep (gs | bsz grouping of images) ---
    imgs = np.stack([content(1080, 1920, rng) for _ in range(8)])
    del img8k, img8kd
    bfns = {}
    bref = None
    for gs in (8, 16, 32):
        cfg = EncoderConfig(quality=90, subsampling="420",
                            restart_interval="rows", compact_groups=gs)
        t0 = time.perf_counter()
        try:
            jpgs = enc_mod._encode_batch_fused(imgs, cfg)
        except Exception as e:
            log(f"batch gs={gs}: FAILED ({type(e).__name__}: "
                f"{str(e)[:140]})")
            continue
        log(f"batch gs={gs}: first call in {time.perf_counter()-t0:.0f}s")
        if bref is None:
            bref = jpgs
            log(f"batch gs={gs}: reference ({sum(map(len, jpgs))} B)")
        else:
            ok = jpgs == bref
            log(f"batch gs={gs}: files {'IDENTICAL' if ok else 'MISMATCH'}")
            assert ok
        bfns[gs] = cfg
    for rep in range(3):
        for gs, cfg in bfns.items():
            t0 = time.perf_counter()
            for _ in range(3):
                enc_mod._encode_batch_fused(imgs, cfg)
            dt = (time.perf_counter() - t0) / 3
            mp = 8 * 1920 * 1080 / dt / 1e6
            log(f"rep{rep} batch gs={gs}: {dt * 1e3:.2f} ms/batch "
                f"({mp:.0f} MPix/s incl host)")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
