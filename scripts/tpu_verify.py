#!/usr/bin/env python
"""End-to-end TPU verification: encode on the real chip via the Pallas
path, check byte-identity against the XLA oracle path, and decode with
independent decoders (PIL + cv2).

Run under `timeout 590 python -u` in the background (tunnel compiles are
slow and occasionally wedge — see CLAUDE.md).
"""

import io
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jpegtpu
    from jpegtpu.config import EncoderConfig
    from jpegtpu.encoder import Encoder
    from jpegtpu.io import ppm

    only = sys.argv[1] if len(sys.argv) > 1 else None
    print("backend:", jax.default_backend(), flush=True)
    img = ppm.read_pnm("/root/reference/data/fruit.ppm")
    print("image:", img.shape, flush=True)

    from PIL import Image
    try:
        import cv2
    except ImportError:
        cv2 = None

    decoded = {}
    configs = [
        ("rows", dict(quality=90, subsampling="420",
                      restart_interval="rows")),
        ("r0", dict(quality=90, subsampling="420", restart_interval=0)),
        ("r5", dict(quality=90, subsampling="420", restart_interval=5)),
    ]
    for name, kw in configs:
        if only and name != only:
            continue
        t0 = time.time()
        jpg = jpegtpu.encode(img, **kw)
        t1 = time.time()
        dec = np.asarray(Image.open(io.BytesIO(jpg)).convert("RGB"))
        p = psnr(dec, img)
        print(f"[{name}] {len(jpg)} bytes, PSNR {p:.2f} dB, "
              f"encode {t1 - t0:.1f}s (incl. compile)", flush=True)
        # fruit at q90 4:2:0 decodes at ~20.1 dB with PIL's own encoder
        # too (noisy photo content) — gate just below encoder parity.
        assert p > 19.0, f"{name}: PSNR too low"
        if cv2 is not None:
            arr = cv2.imdecode(np.frombuffer(jpg, np.uint8),
                               cv2.IMREAD_COLOR)
            assert arr is not None, f"{name}: cv2 rejected the file"
        decoded[name] = dec

        cfg = EncoderConfig(device_bitpack=False, **kw)
        jpg_o = Encoder(cfg).encode(img)
        assert jpg == jpg_o, \
            f"{name}: Pallas bytes differ from XLA oracle bytes"
        print(f"[{name}] byte-identical to XLA oracle", flush=True)

    # Restart settings change only markers, never pixels.
    if not only:
        for name in ("r0", "r5"):
            np.testing.assert_array_equal(decoded["rows"], decoded[name])
        print("decoded pixels identical across restart settings",
              flush=True)
    print("TPU VERIFY OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
