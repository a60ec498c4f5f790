#!/usr/bin/env python
"""4K bench-image byte check: production Pallas path vs XLA oracle, plus
a determinism double-encode. The fruit bisect covers small geometry; this
covers the full 4K noise content the benchmark reports on.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from jpegtpu.config import EncoderConfig
    from jpegtpu.encoder import Encoder

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    img = np.clip(base[..., None] + rng.normal(0, 12, (h, w, 3)),
                  0, 255).astype(np.uint8)
    kw = dict(quality=90, subsampling="420", restart_interval="rows")

    log("encoding 4K (pallas)...")
    enc = Encoder(EncoderConfig(**kw))
    a = enc.encode(img)
    b = enc.encode(img)
    log(f"pallas: {len(a)} bytes; deterministic: {a == b}")
    assert a == b, "nondeterministic output!"

    log("encoding 4K (XLA oracle)...")
    o = Encoder(EncoderConfig(device_bitpack=False, **kw)).encode(img)
    log(f"oracle: {len(o)} bytes")
    if a == o:
        log("4K BYTES MATCH")
        return 0
    n = min(len(a), len(o))
    i = next((i for i in range(n) if a[i] != o[i]), n)
    log(f"4K MISMATCH at byte {i} (pallas {len(a)} oracle {len(o)})")
    return 1


if __name__ == "__main__":
    sys.exit(main())
