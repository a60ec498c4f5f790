#!/usr/bin/env python
"""HW conformance sweep (round 5): encode fruit.ppm on the REAL chip
across config-matrix corners and byte-compare each against the XLA
oracle encoder (device_bitpack=False).

Motivation: the escalation-path VMEM bug (check_escalation*.log) lived
in a configuration that only interpret mode (no VMEM limits, no Mosaic)
had ever executed. This sweep runs the corners of the selector matrix
on hardware: every subsampling mode (incl. 444s, never HW-swept),
integer restart intervals with ragged tails, device_stuff off, kb=1/4,
gs=1, tiny + explicit budgets, and the odd-size geometry fruit brings
for free (253x254)."""

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
    from jpegtpu.config import EncoderConfig
    from jpegtpu.encoder import Encoder
    from jpegtpu.io import ppm
    log(f"backend {jax.default_backend()}")

    img = ppm.read_pnm("/root/reference/data/fruit.ppm")
    gray = img.mean(axis=2).astype(np.uint8)

    cases = [
        ("420-rows", dict(subsampling="420", restart_interval="rows")),
        ("444-rows", dict(subsampling="444", restart_interval="rows")),
        ("444s-rows", dict(subsampling="444s", restart_interval="rows")),
        ("422-rows", dict(subsampling="422", restart_interval="rows")),
        ("gray-rows", dict(subsampling="gray", restart_interval="rows")),
        ("420-r7-ragged", dict(subsampling="420", restart_interval=7)),
        ("444-r5-ragged", dict(subsampling="444", restart_interval=5)),
        ("420-r0", dict(subsampling="420", restart_interval=0)),
        ("gray-r0", dict(subsampling="gray", restart_interval=0)),
        ("420-nostuff", dict(subsampling="420", restart_interval="rows",
                             device_stuff=False)),
        ("420-kb1-gs1", dict(subsampling="420", restart_interval="rows",
                             compact_kb=1, compact_groups=1)),
        ("420-kb4-gs1", dict(subsampling="420", restart_interval="rows",
                             compact_kb=4, compact_groups=1)),
        ("422-bb48", dict(subsampling="422", restart_interval="rows",
                          bits_budget=48)),
        ("444s-bb64", dict(subsampling="444s", restart_interval="rows",
                           bits_budget=64)),
        ("420-q100", dict(subsampling="420", restart_interval="rows",
                          quality=100)),
        ("444-q97", dict(subsampling="444", restart_interval="rows",
                         quality=97)),
    ]
    n_fail = 0
    for name, kw in cases:
        q = kw.pop("quality", 90)
        src = gray if kw["subsampling"] == "gray" else img
        t0 = time.perf_counter()
        try:
            got = Encoder(EncoderConfig(quality=q, **kw)).encode(src)
            want = Encoder(EncoderConfig(quality=q, device_bitpack=False,
                                         **kw)).encode(src)
        except Exception as e:
            log(f"{name}: FAILED ({type(e).__name__}: {str(e)[:140]})")
            n_fail += 1
            continue
        ok = got == want
        log(f"{name}: {'BYTES MATCH' if ok else 'MISMATCH'} "
            f"({len(got)} B, {time.perf_counter() - t0:.0f}s)")
        n_fail += 0 if ok else 1
    log(f"DONE ({n_fail} failures)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
