"""Constant-table tests: zigzag, quant matrices, quality scaling, DCT basis,
fused-operator equivalence."""

import numpy as np

from jpegtpu.core import tables

# ITU-T T.81 Figure 5 zigzag sequence, written out literally (independent of
# the arithmetic generator under test).
ZIGZAG_LITERAL = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def test_zigzag_matches_standard():
    assert tables.ZIGZAG_ORDER.tolist() == ZIGZAG_LITERAL


def test_inv_zigzag():
    z = tables.ZIGZAG_ORDER
    assert np.array_equal(z[tables.INV_ZIGZAG[z]], z)
    assert sorted(tables.INV_ZIGZAG.tolist()) == list(range(64))


def test_quant_tables_annex_k_spot_values():
    # Spot anchors from T.81 Annex K.1/K.2.
    assert tables.QUANT_LUMA[0, 0] == 16
    assert tables.QUANT_LUMA[7, 7] == 99
    assert tables.QUANT_LUMA[4, 5] == 109
    assert tables.QUANT_CHROMA[0, 0] == 17
    assert tables.QUANT_CHROMA[1, 1] == 21
    assert (tables.QUANT_CHROMA[4:, :] == 99).all()


def test_quality_scaling_libjpeg_formula():
    assert np.array_equal(
        tables.scale_quant_table(tables.QUANT_LUMA, 50), tables.QUANT_LUMA)
    q100 = tables.scale_quant_table(tables.QUANT_LUMA, 100)
    assert (q100 == 1).all()  # scale 0 -> clipped to 1
    q1 = tables.scale_quant_table(tables.QUANT_LUMA, 1)
    assert (q1 == 255).all()  # scale 5000 -> clipped
    q90 = tables.scale_quant_table(tables.QUANT_LUMA, 90)
    # scale=20: floor((16*20+50)/100) = 3
    assert q90[0, 0] == 3
    q25 = tables.scale_quant_table(tables.QUANT_LUMA, 25)
    # scale=200: 16*2 = 32
    assert q25[0, 0] == 32


def test_dct_matrix_orthonormal():
    c = tables.dct_matrix_8x8()
    np.testing.assert_allclose(c @ c.T, np.eye(8), atol=1e-12)


def test_fused_operator_equals_composed_stages():
    """M, b must equal shift->DCT->quant->zigzag composed step by step."""
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (7, 8, 8)).astype(np.float64)
    c = tables.dct_matrix_8x8()
    for quality, chroma in [(50, False), (90, True), (10, False)]:
        q = tables.scale_quant_table(
            tables.QUANT_CHROMA if chroma else tables.QUANT_LUMA, quality)
        ref = np.stack([(c @ (b - 128.0) @ c.T) / q for b in x])
        ref = ref.reshape(-1, 64)[:, tables.ZIGZAG_ORDER]
        m, bias = tables.fused_block_operator(quality, chroma)
        got = x.reshape(-1, 64) @ m.astype(np.float64) + bias.astype(np.float64)
        np.testing.assert_allclose(got, ref, atol=1e-3)


def test_quant_table_zigzag_roundtrip():
    z = tables.quant_table_zigzag(50, chroma=False)
    assert z[0] == 16          # DC steps first
    assert len(z) == 64
    assert sorted(z) == sorted(tables.QUANT_LUMA.reshape(64))
