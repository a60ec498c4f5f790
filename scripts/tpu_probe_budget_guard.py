#!/usr/bin/env python
"""Validate the quality>=97 budget-guard threshold (round 5): at q in
{90, 93, 95, 96} x {444@330, 422@248}, run the first device pass on the
bench content and report whether _budget_overflow would trigger the
worst-case re-run. If q95/96 escalate, every encode at those settings
pays 2x and the guard must drop; if not, the threshold stands."""

import os
import sys

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

    for sub in ("444", "422"):
        for q in (90, 93, 95, 96, 97):
            cfg = EncoderConfig(quality=q, subsampling=sub,
                                restart_interval="rows")
            bud = cfg.first_pass_budget
            fn, _, _ = enc_mod._jitted_encode((h, w), cfg)
            out = fn(imgd)
            seg_bits = np.asarray(out[1])
            max_mcu = int(np.asarray(out[2]))
            gm = enc_mod._entropy_mcu_group((h, w), cfg)
            if out[0].ndim == 2:
                spg = -(-seg_bits.shape[0] // out[0].shape[0])
                frames = (out[0].shape[1] // 1024 - 2) // (2 * spg)
            else:
                frames = (out[0].shape[0] // 1024 - 1) // \
                    (2 * seg_bits.shape[0])
            cap_bits = (frames - 1) * 1024 * 32
            ov = enc_mod._budget_overflow(
                seg_bits, max_mcu, cap_bits, cfg.blocks_per_mcu * gm, bud)
            _, unit_cap = ep.mcu_capacity(cfg.blocks_per_mcu * gm, bud)
            log(f"{sub} q={q} budget={bud} gm={gm}: max_unit_bits="
                f"{max_mcu} / cap {unit_cap} "
                f"{'ESCALATES' if ov else 'ok'}")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
