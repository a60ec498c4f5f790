#!/usr/bin/env python
"""422 4K in-context triage with the correct oracle (device_bitpack=False
XLA program, as scripts/tpu_bisect.py): encode with the nat and xla
pixel paths (full Pallas program) and the oracle, 3 repetitions each,
comparing full JPEG bytes — catches intermittent corruption and
identifies which variant is wrong."""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tpu_stages_common import log  # noqa: E402


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"backend {jax.default_backend()}")

    from jpegtpu import encoder as enc_mod
    from jpegtpu.config import EncoderConfig
    from jpegtpu.encoder import Encoder

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    img = np.clip(base[..., None] + rng.normal(0, 12, (h, w, 3)),
                  0, 255).astype(np.uint8)

    kw = dict(quality=90, subsampling="422", restart_interval="rows")
    oracle = Encoder(EncoderConfig(device_bitpack=False, **kw)).encode(img)
    log(f"oracle: {len(oracle)} B")

    for rep in range(3):
        for name in ("nat", "xla"):
            jpg = Encoder(EncoderConfig(pixel_path=name, **kw)).encode(img)
            if jpg == oracle:
                log(f"rep{rep} {name}: MATCH ({len(jpg)} B)")
            else:
                n = min(len(jpg), len(oracle))
                i = next((i for i in range(n) if jpg[i] != oracle[i]), n)
                log(f"rep{rep} {name}: MISMATCH at byte {i}/{len(oracle)} "
                    f"({len(jpg)} B)")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
