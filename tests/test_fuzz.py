"""Randomized end-to-end fuzzing: any (size, quality, subsampling, restart)
combination must produce a file both independent decoders accept, at libjpeg
quality."""

import io

import numpy as np
import pytest

from jpegtpu import encode


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_roundtrip(seed):
    rng = np.random.default_rng(seed)
    h = int(rng.integers(1, 90))
    w = int(rng.integers(1, 90))
    quality = int(rng.integers(1, 101))
    sub = str(rng.choice(["444", "444s", "422", "420"]))
    restart = rng.choice(["0", "1", str(int(rng.integers(2, 9))), "rows"])
    restart = "rows" if restart == "rows" else int(restart)

    # mix of content types: noise, flat, gradient, saturated
    kind = seed % 4
    if kind == 0:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    elif kind == 1:
        img = np.full((h, w, 3), int(rng.integers(0, 256)), np.uint8)
    elif kind == 2:
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([(xx * 3) % 256, (yy * 5) % 256,
                        ((xx + yy) * 2) % 256], -1).astype(np.uint8)
    else:
        img = rng.choice([0, 255], (h, w, 3)).astype(np.uint8)

    jpg = encode(img, quality=quality, subsampling=sub,
                 restart_interval=restart)

    from PIL import Image
    dec = np.asarray(Image.open(io.BytesIO(jpg)).convert("RGB"))
    assert dec.shape == img.shape, (h, w, quality, sub, restart)

    import cv2
    dec2 = cv2.imdecode(np.frombuffer(jpg, np.uint8), cv2.IMREAD_COLOR)
    assert dec2 is not None and dec2.shape == img.shape

    # the two independent decoders agree closely on our stream
    assert _psnr(dec, dec2[..., ::-1]) > 40
