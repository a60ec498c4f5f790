"""Integration tests: full encode -> independent decoders (PIL, OpenCV) ->
PSNR gates vs libjpeg's own encoder at identical settings (the BASELINE.md
quality criterion: PSNR >= reference-path quality at equal tables)."""

import io

import numpy as np
import pytest

from jpegtpu import encode
from jpegtpu.io import ppm


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / mse)


def _pil_decode(jpg):
    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(jpg)).convert("RGB"))


def _pil_encode(img, quality, subsampling):
    from PIL import Image
    buf = io.BytesIO()
    pil_mode = {"444": 0, "422": 1, "420": 2}[subsampling]
    Image.fromarray(img).save(buf, "JPEG", quality=quality,
                              subsampling=pil_mode)
    return buf.getvalue()


@pytest.mark.parametrize("quality", [50, 75, 90])
@pytest.mark.parametrize("subsampling", ["444", "422", "420"])
def test_psnr_matches_libjpeg(smooth_img, quality, subsampling):
    jpg = encode(smooth_img, quality=quality, subsampling=subsampling)
    ours = _psnr(_pil_decode(jpg), smooth_img)
    theirs = _psnr(_pil_decode(_pil_encode(smooth_img, quality, subsampling)),
                   smooth_img)
    assert ours >= theirs - 0.1, f"ours {ours:.2f} vs libjpeg {theirs:.2f}"


def test_fruit_all_configs(fruit):
    """BASELINE.json config 1: 4:4:4 encode of data/fruit.ppm, standard
    tables (q=50) — and the q=50/75/90 4:2:0 sweep of config 2."""
    for q, sub in [(50, "444"), (50, "420"), (75, "420"), (90, "420")]:
        jpg = encode(fruit, quality=q, subsampling=sub)
        ours = _psnr(_pil_decode(jpg), fruit)
        theirs = _psnr(_pil_decode(_pil_encode(fruit, q, sub)), fruit)
        assert ours >= theirs - 0.1


def test_opencv_decodes_us(smooth_img):
    """Second independent decoder."""
    cv2 = pytest.importorskip("cv2")
    jpg = encode(smooth_img, quality=75, subsampling="420")
    dec = cv2.imdecode(np.frombuffer(jpg, np.uint8), cv2.IMREAD_COLOR)
    assert dec is not None
    dec = dec[..., ::-1]  # BGR -> RGB
    assert dec.shape == smooth_img.shape
    assert _psnr(dec, smooth_img) > 25


@pytest.mark.parametrize("restart", [0, 1, 3, "rows"])
def test_restart_intervals_decode_identically(smooth_img, restart):
    """Restart segmentation must not change decoded pixels, only markers."""
    base = _pil_decode(encode(smooth_img, quality=75, subsampling="420",
                              restart_interval=0))
    got = _pil_decode(encode(smooth_img, quality=75, subsampling="420",
                             restart_interval=restart))
    np.testing.assert_array_equal(base, got)


@pytest.mark.parametrize("shape", [(8, 8), (16, 16), (17, 19), (1, 1),
                                   (9, 24), (64, 63)])
def test_odd_sizes(shape):
    """Padding paths: non-multiple dims, tiny images (the reference only ever
    handles one padded 256x256 case — SURVEY §2.11)."""
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    for sub in ["444", "422", "420"]:
        jpg = encode(img, quality=90, subsampling=sub)
        dec = _pil_decode(jpg)
        assert dec.shape == img.shape


def test_444s_mode_decodes(smooth_img):
    """Reference-parity smoothed-chroma mode (SURVEY §2.3)."""
    jpg = encode(smooth_img, quality=50, subsampling="444s")
    dec = _pil_decode(jpg)
    assert _psnr(dec, smooth_img) > 25


def test_grayscale_single_component_jpeg(smooth_img):
    """'gray' mode: single-component baseline JPEG from [H, W] input,
    matching PIL's grayscale encoder quality (a capability beyond the
    RGB-only reference)."""
    from PIL import Image
    gray = np.asarray(
        np.clip(smooth_img @ [0.299, 0.587, 0.114], 0, 255)).astype(np.uint8)
    jpg = encode(gray, quality=85, subsampling="gray")
    dec = np.asarray(Image.open(io.BytesIO(jpg)))
    assert dec.ndim == 2 and dec.shape == gray.shape
    ours = _psnr(dec, gray)
    buf = io.BytesIO()
    Image.fromarray(gray, "L").save(buf, "JPEG", quality=85)
    theirs = _psnr(np.asarray(Image.open(io.BytesIO(buf.getvalue()))), gray)
    assert ours >= theirs - 0.1
    # restart variants must decode identically
    base = np.asarray(Image.open(io.BytesIO(
        encode(gray, quality=85, subsampling="gray", restart_interval=0))))
    np.testing.assert_array_equal(base, dec)


def test_gray_image_compresses_tightly():
    img = np.full((64, 64, 3), 128, np.uint8)
    jpg = encode(img, quality=50, subsampling="420", restart_interval=0)
    assert len(jpg) < 1200  # headers + near-empty scan
    dec = _pil_decode(jpg)
    np.testing.assert_allclose(dec.astype(int), 128, atol=1)


def test_ppm_io_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    p = tmp_path / "x.ppm"
    ppm.write_pnm(p, img)
    np.testing.assert_array_equal(ppm.read_pnm(p), img)
    # comment handling
    data = b"P6 # comment\n# another\n13 11\n255\n" + img.tobytes()
    np.testing.assert_array_equal(ppm.read_pnm(data), img)


def test_ppm_rejects_bad_magic():
    with pytest.raises(ppm.PPMError):
        ppm.read_pnm(b"P3\n1 1\n255\n aaa")
