#!/usr/bin/env python
"""HW validation of the budget-escalation path (round 5): a deliberately
undersized first-pass budget must (a) trigger the worst-case re-run on
the REAL chip (the escalated MAX_BITS_PER_BLOCK program must compile
and execute under Mosaic — previously only interpret-covered) and
(b) produce bytes identical to the default-budget encode. Checks the
single-image path at 420 and 444 and the batch path at 420."""

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
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from jpegtpu import encoder as enc_mod
    from jpegtpu.config import EncoderConfig
    log(f"backend {jax.default_backend()}")

    h, w = 1080, 1920          # smaller frame: the worst-case program
    rng = np.random.default_rng(0)  # is ~4.3x the stream buffers
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    img = np.clip(base[..., None] + rng.normal(0, 12, (h, w, 3)),
                  0, 255).astype(np.uint8)

    for sub in ("420", "444"):
        ref = enc_mod.Encoder(EncoderConfig(
            quality=90, subsampling=sub,
            restart_interval="rows")).encode(img)
        t0 = time.perf_counter()
        tiny = enc_mod.Encoder(EncoderConfig(
            quality=90, subsampling=sub, restart_interval="rows",
            bits_budget=48)).encode(img)
        ok = tiny == ref
        log(f"{sub} escalation (budget=48): "
            f"{'BYTES MATCH' if ok else 'MISMATCH'} "
            f"({time.perf_counter() - t0:.0f}s incl worst-case compile)")
        assert ok, f"{sub} escalation mismatch"

    imgs = np.stack([img, img[::-1].copy()])
    refs = enc_mod._encode_batch_fused(
        imgs, EncoderConfig(quality=90, subsampling="420",
                            restart_interval="rows"))
    tinys = enc_mod._encode_batch_fused(
        imgs, EncoderConfig(quality=90, subsampling="420",
                            restart_interval="rows", bits_budget=48))
    ok = tinys == refs
    log(f"batch escalation: {'BYTES MATCH' if ok else 'MISMATCH'}")
    assert ok
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
