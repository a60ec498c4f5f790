#!/usr/bin/env python
"""In-context bisection of the round-2 kernel changes on real TPU.

Encodes fruit.ppm through the full Pallas path with one change reverted
per variant, and compares bytes against the XLA oracle path:

  v3      - production as-is (all three changes)
  chunks3 - worst-case mcu_merge capacity (reverts budget-sized chunks)
  v2      - seg_merge_v2 instead of v3 (reverts the new merge)

Usage: timeout 580 python -u scripts/tpu_bisect.py <variant>
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
    variant = sys.argv[1]
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jpegtpu.config import EncoderConfig
    from jpegtpu.encoder import Encoder
    from jpegtpu.io import ppm
    from jpegtpu.kernels import entropy_pack as ep

    extra_cfg = {}
    override_kw = {}
    if variant == "nostuff":
        extra_cfg = dict(device_stuff=False)
    elif variant == "r0":
        # restart=0: the 8-way virtual-segment merge + device bit_join
        override_kw = dict(restart_interval=0)
    elif variant == "chunks3":
        real_cap = ep.mcu_capacity
        ep.mcu_capacity = lambda g, bb: (-(-(g * 52 + 2) // 128), 10 ** 9)
    elif variant == "v2":
        def v2_shim(words, lens, n_seg, bps, w_cap, blocks_per_mcu,
                    mcu_chunks=None, block_mcus=None):
            sw, sb = ep.seg_merge_v2(words, lens, n_seg, bps, w_cap,
                                     blocks_per_mcu)
            import jax.numpy as jnp
            return sw, sb, jnp.int32(0)
        ep.seg_merge_v3 = v2_shim
    elif variant != "v3":
        raise SystemExit(f"unknown variant {variant}")
    kw_extra = extra_cfg

    img = ppm.read_pnm("/root/reference/data/fruit.ppm")
    kw = dict(quality=90, subsampling="420", restart_interval="rows")
    kw.update(override_kw)
    log(f"backend {jax.default_backend()} variant={variant}")

    t0 = time.time()
    jpg_p = Encoder(EncoderConfig(**kw, **kw_extra)).encode(img)
    log(f"pallas encode done in {time.time() - t0:.0f}s "
        f"({len(jpg_p)} bytes)")
    jpg_o = Encoder(EncoderConfig(device_bitpack=False, **kw)).encode(img)
    log(f"oracle encode done ({len(jpg_o)} bytes)")
    if jpg_p == jpg_o:
        log(f"{variant}: BYTES MATCH")
        return 0
    # locate first divergence
    n = min(len(jpg_p), len(jpg_o))
    i = next((i for i in range(n) if jpg_p[i] != jpg_o[i]), n)
    log(f"{variant}: MISMATCH at byte {i}/{len(jpg_o)} "
        f"(pallas {len(jpg_p)}B oracle {len(jpg_o)}B)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
