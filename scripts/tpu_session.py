#!/usr/bin/env python
"""One long-lived TPU session: verify all configs, run the headline bench,
probe the subsample outlier. Checkpoints progress via prints so a wedged
tunnel loses at most one stage.
"""

import io
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def verify(img):
    import jpegtpu
    from jpegtpu.config import EncoderConfig
    from jpegtpu.encoder import Encoder
    from PIL import Image
    try:
        import cv2
    except ImportError:
        cv2 = None

    decoded = {}
    for name, kw in [
        ("rows", dict(quality=90, subsampling="420",
                      restart_interval="rows")),
        ("r0", dict(quality=90, subsampling="420", restart_interval=0)),
        ("r5", dict(quality=90, subsampling="420", restart_interval=5)),
    ]:
        t0 = time.time()
        jpg = jpegtpu.encode(img, **kw)
        dec = np.asarray(Image.open(io.BytesIO(jpg)).convert("RGB"))
        p = psnr(dec, img)
        log(f"[{name}] {len(jpg)} bytes, PSNR {p:.2f} dB, "
            f"{time.time() - t0:.0f}s")
        assert p > 19.0, f"{name}: PSNR too low"
        if cv2 is not None:
            arr = cv2.imdecode(np.frombuffer(jpg, np.uint8),
                               cv2.IMREAD_COLOR)
            assert arr is not None, f"{name}: cv2 rejected"
        jpg_o = Encoder(EncoderConfig(device_bitpack=False, **kw))\
            .encode(img)
        assert jpg == jpg_o, f"{name}: differs from XLA oracle"
        log(f"[{name}] byte-identical to XLA oracle")
        decoded[name] = dec
    for name in ("r0", "r5"):
        np.testing.assert_array_equal(decoded["rows"], decoded[name])
    log("VERIFY OK (pixels identical across restart settings)")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"backend {jax.default_backend()}")

    stages = set(sys.argv[1:]) or {"verify", "bench", "subsample"}
    if "verify" in stages:
        from jpegtpu.io import ppm
        img = ppm.read_pnm("/root/reference/data/fruit.ppm")
        verify(img)

    if "bench" in stages:
        log("=== bench ===")
        import bench
        # run_bench, not supervise: this session's interpreter already
        # holds the backend; spawning retry children would be wrong here.
        rc = bench.run_bench()
        log(f"bench rc={rc}")

    if "subsample" in stages:
        log("=== subsample probe ===")
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import tpu_subsample_probe
        tpu_subsample_probe.main()
    log("SESSION DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
