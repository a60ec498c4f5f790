"""Pixel-path op tests against independent oracles (scipy.fft, numpy loops)."""

import numpy as np
import pytest
import scipy.fft

from jpegtpu.core import ops, tables
from tests.test_tables import ZIGZAG_LITERAL


def _oracle_block_coeffs(block, quality, chroma):
    """Independent oracle: scipy orthonormal DCT-II + quant + literal zigzag."""
    f = scipy.fft.dctn(block.astype(np.float64) - 128.0, type=2, norm="ortho")
    q = tables.scale_quant_table(
        tables.QUANT_CHROMA if chroma else tables.QUANT_LUMA, quality)
    s = f / q
    r = np.sign(s) * np.floor(np.abs(s) + 0.5)
    return r.reshape(64)[ZIGZAG_LITERAL].astype(np.int32)


def test_rgb_to_ycbcr_reference_coefficients():
    """BT.601 full-precision coefficients of the reference CPU path
    (src/utils.cpp:92-110)."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    got = np.asarray(ops.rgb_to_ycbcr(img))
    r, g, b = [img[..., i].astype(np.float64) for i in range(3)]
    np.testing.assert_allclose(
        got[..., 0], 0.299 * r + 0.587 * g + 0.114 * b, atol=1e-3)
    np.testing.assert_allclose(
        got[..., 1], 128 - 0.168736 * r - 0.331264 * g + 0.5 * b, atol=1e-3)
    np.testing.assert_allclose(
        got[..., 2], 128 + 0.5 * r - 0.418688 * g - 0.081312 * b, atol=1e-3)


def test_ycbcr_identities():
    """Grey has zero chroma (Cb=Cr=128); white Y=255, black Y=0."""
    img = np.array([[[255, 255, 255], [0, 0, 0], [128, 128, 128]]], np.uint8)
    got = np.asarray(ops.rgb_to_ycbcr(img))[0]
    np.testing.assert_allclose(got[0], [255, 128, 128], atol=1e-3)
    np.testing.assert_allclose(got[1], [0, 128, 128], atol=1e-3)
    np.testing.assert_allclose(got[2], [128, 128, 128], atol=1e-3)


def test_smooth_chroma_2x2_reference_semantics():
    """444s mode: 2x2 average replicated to all four pixels, Y untouched,
    odd edges passed through (performCDS, src/utils.cpp:113-141)."""
    rng = np.random.default_rng(1)
    ycc = rng.uniform(0, 255, (5, 7, 3)).astype(np.float32)
    got = np.asarray(ops.smooth_chroma_2x2(ycc))
    np.testing.assert_array_equal(got[..., 0], ycc[..., 0])
    for y in range(0, 4, 2):
        for x in range(0, 6, 2):
            for c in (1, 2):
                avg = ycc[y:y + 2, x:x + 2, c].mean()
                np.testing.assert_allclose(got[y:y + 2, x:x + 2, c], avg,
                                           atol=1e-4)
    # odd row/col untouched
    np.testing.assert_array_equal(got[4, :, :], ycc[4, :, :])
    np.testing.assert_array_equal(got[:, 6, :], ycc[:, 6, :])


def test_pad_to_multiple_symmetric():
    img = np.arange(5 * 6 * 3, dtype=np.float32).reshape(5, 6, 3)
    got = np.asarray(ops.pad_to_multiple(img, 8))
    assert got.shape == (8, 8, 3)
    np.testing.assert_array_equal(got[:5, :6], img)
    # symmetric reflection: row 5 mirrors row 4, row 6 mirrors row 3...
    np.testing.assert_array_equal(got[5, :6], img[4])
    np.testing.assert_array_equal(got[6, :6], img[3])
    np.testing.assert_array_equal(got[:5, 6], img[:, 5])
    np.testing.assert_array_equal(got[:5, 7], img[:, 4])


def test_downsample_chroma_420():
    rng = np.random.default_rng(2)
    ycc = rng.uniform(0, 255, (4, 6, 3)).astype(np.float32)
    y, cb, cr = ops.downsample_chroma_420(ycc)
    assert np.asarray(y).shape == (4, 6)
    assert np.asarray(cb).shape == (2, 3)
    np.testing.assert_allclose(
        np.asarray(cb)[0, 0], ycc[0:2, 0:2, 1].mean(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cr)[1, 2], ycc[2:4, 4:6, 2].mean(), rtol=1e-5)


def test_blockify_layout():
    plane = np.arange(16 * 24, dtype=np.float32).reshape(16, 24)
    b = np.asarray(ops.blockify(plane))
    assert b.shape == (2, 3, 64)
    np.testing.assert_array_equal(b[0, 0].reshape(8, 8), plane[:8, :8])
    np.testing.assert_array_equal(b[1, 2].reshape(8, 8), plane[8:, 16:])


@pytest.mark.parametrize("quality", [10, 50, 90])
@pytest.mark.parametrize("chroma", [False, True])
def test_fused_dct_quant_zigzag_vs_scipy(quality, chroma):
    rng = np.random.default_rng(3)
    blocks = rng.integers(0, 256, (17, 8, 8))
    got = np.asarray(ops.fused_dct_quant_zigzag(
        blocks.reshape(-1, 64).astype(np.float32), quality, chroma))
    ref = np.stack([_oracle_block_coeffs(b, quality, chroma) for b in blocks])
    # f32 matmul vs f64 oracle: allow off-by-one on exact rounding boundaries
    diff = np.abs(got - ref)
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.001


def test_encode_blocks_444_structure(smooth_img):
    coeffs = np.asarray(ops.encode_blocks(smooth_img, 50, "444"))
    my, mx = ops.mcu_grid(*smooth_img.shape[:2], "444")
    assert coeffs.shape == (my * mx, 3, 64)
    # Y of first block must match the scipy oracle on padded Y plane
    ycc = np.asarray(ops.rgb_to_ycbcr(smooth_img))
    ref = _oracle_block_coeffs(ycc[:8, :8, 0], 50, False)
    assert np.abs(coeffs[0, 0] - ref).max() <= 1


def test_encode_blocks_420_structure(smooth_img):
    coeffs = np.asarray(ops.encode_blocks(smooth_img, 50, "420"))
    my, mx = ops.mcu_grid(*smooth_img.shape[:2], "420")
    assert coeffs.shape == (my * mx, 6, 64)
    # Y01 slot of MCU 0 = luma block at cols 8..16
    ycc = np.asarray(ops.rgb_to_ycbcr(smooth_img))
    ref = _oracle_block_coeffs(ycc[:8, 8:16, 0], 50, False)
    assert np.abs(coeffs[0, 1] - ref).max() <= 1
    # Cb slot: subsampled chroma block
    h, w = smooth_img.shape[:2]
    ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
    yccp = np.asarray(ops.pad_to_multiple(ops.rgb_to_ycbcr(smooth_img), 16))
    cb = yccp[..., 1].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    ref_cb = _oracle_block_coeffs(cb[:8, :8], 50, True)
    assert np.abs(coeffs[0, 4] - ref_cb).max() <= 1
