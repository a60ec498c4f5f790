#!/usr/bin/env python
"""Headline benchmark: 4K q=90 4:2:0 encode throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measured quantity: the full device encode pipeline — fused pixel-path matmul
+ Pallas entropy kernels (symbolize, per-block pack, segment merge, stream
compaction) — synchronized per frame via a dependent scalar fetch. Host-side
work (byte-stuffing + marker splice, projected ~5 ms of C++ on the final
bytes — unmeasured pending real-host hardware) and
the host link transfer are excluded: this environment reaches the chip
through a network tunnel whose device->host path runs at a few MB/s with
hundreds of ms latency, so including it would benchmark the tunnel, not the
encoder; on a real v5e host (PCIe, tens of GB/s) the ~1-3 MB/frame of
compressed output is sub-millisecond and overlaps with compute. The
reference's own comparison likewise times kernels via CL event profiling,
not host round-trips (src/OpenCLProject_JpegEncoder.cpp:622-629).

vs_baseline: BASELINE.json's north star is >=10x the reference OpenCL GPU
4K throughput on one chip. The reference publishes no numbers (BASELINE.md);
extrapolating its per-stage GPU times from the one hardcoded 256x256 run to
4K puts it at ~8 MPix/s on period hardware, so the 10x target is 80 MPix/s,
used as the denominator here.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from jpegtpu.config import EncoderConfig
    from jpegtpu.encoder import Encoder, _jitted_encode

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    # Structured (JPEG-like) content, not white noise: gradients + texture.
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    img = np.clip(base[..., None] +
                  rng.normal(0, 12, (h, w, 3)), 0, 255).astype(np.uint8)

    cfg = EncoderConfig(quality=90, subsampling="420",
                        restart_interval="rows")

    # Correctness gate: the full encode must produce a JPEG an independent
    # decoder accepts, at sane fidelity — a corrupted scan body cannot post
    # a headline number.
    enc = Encoder(cfg)
    jpg = enc.encode(img)
    assert jpg[:2] == b"\xff\xd8" and jpg[-2:] == b"\xff\xd9"
    import io as _io

    from PIL import Image
    dec = np.asarray(Image.open(_io.BytesIO(jpg)).convert("RGB"),
                     dtype=np.float64)
    mse = float(np.mean((dec - img.astype(np.float64)) ** 2))
    psnr = 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)
    # PIL's own encoder yields 27.3 dB on this content at q90 4:2:0 (the
    # sigma-12 noise bounds it); gate just below encoder parity.
    assert psnr > 26.0, f"decoded PSNR {psnr:.2f} dB — corrupt output?"

    # Device-pipeline throughput, amortized: frames are queued back-to-back
    # (steady-state pipelining) and one dependent scalar fetch at the end
    # forces completion of the whole chain. Subtracting the 1-frame chain
    # removes the fixed dispatch+fetch round-trip (~30 ms through this
    # tunnel), which would otherwise dominate per-frame numbers.
    fn, _, kind = _jitted_encode((h, w), cfg)
    imgd = jax.device_put(jnp.asarray(img))
    probe = jax.jit(lambda o: jnp.sum(o[1]) +
                    jnp.sum(o[0][::4099].astype(jnp.int32)))
    float(probe(fn(imgd)))  # warm both programs

    def chain(k):
        t0 = time.perf_counter()
        outs = [fn(imgd) for _ in range(k)]
        float(probe(outs[-1]))
        return time.perf_counter() - t0

    d1 = min(chain(1) for _ in range(3))
    d21 = min(chain(21) for _ in range(3))
    dt = (d21 - d1) / 20
    mpix_s = (h * w) / dt / 1e6

    target = 80.0
    print(json.dumps({
        "metric": "encode_throughput_4k_q90_420_device",
        "value": round(mpix_s, 2),
        "unit": "MPix/s/chip",
        "vs_baseline": round(mpix_s / target, 3),
        "psnr_db": round(psnr, 2),
        "bytes": len(jpg),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
