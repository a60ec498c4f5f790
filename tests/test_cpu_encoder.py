"""Native C++ CPU reference encoder tests (the CPU-tier analog of the
reference's JpegEncoderHost pipeline)."""

import io

import numpy as np
import pytest

from jpegtpu import encode, native
from jpegtpu.encoder import encode_cpu

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def _decode(jpg, rgb=True):
    from PIL import Image
    im = Image.open(io.BytesIO(jpg))
    return np.asarray(im.convert("RGB") if rgb else im)


@pytest.mark.parametrize("subsampling", ["444", "422", "420"])
@pytest.mark.parametrize("quality", [50, 90])
def test_cpu_matches_device_path_quality(smooth_img, quality, subsampling):
    """CPU (f64 scalar C++) and device (f32 fused matmul) paths encode the
    same pixels: decoded outputs must agree to coefficient-rounding noise
    and file sizes within a few percent."""
    cpu = encode_cpu(smooth_img, quality=quality, subsampling=subsampling)
    dev = encode(smooth_img, quality=quality, subsampling=subsampling)
    dc, dd = _decode(cpu), _decode(dev)
    assert abs(len(cpu) - len(dev)) / len(dev) < 0.03
    assert _psnr(dc, smooth_img) >= _psnr(dd, smooth_img) - 0.1
    # decoded images nearly identical (paths differ only in float rounding)
    assert _psnr(dc, dd) > 45


def test_cpu_gray(smooth_img):
    gray = np.clip(smooth_img @ [0.299, 0.587, 0.114],
                   0, 255).astype(np.uint8)
    jpg = encode_cpu(gray, quality=85, subsampling="gray")
    dec = _decode(jpg, rgb=False)
    assert dec.shape == gray.shape
    assert _psnr(dec, gray) > 35


@pytest.mark.parametrize("restart", [0, 3, "rows"])
def test_cpu_restart_modes(smooth_img, restart):
    jpg = encode_cpu(smooth_img, quality=75, subsampling="420",
                     restart_interval=restart)
    dec = _decode(jpg)
    base = _decode(encode_cpu(smooth_img, quality=75, subsampling="420",
                              restart_interval=0))
    np.testing.assert_array_equal(dec, base)


def test_cpu_odd_sizes():
    rng = np.random.default_rng(1)
    for shape in [(1, 1), (9, 17), (16, 16)]:
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        jpg = encode_cpu(img, quality=90, subsampling="420")
        assert _decode(jpg).shape == img.shape
