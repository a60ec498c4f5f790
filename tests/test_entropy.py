"""Entropy-path tests: the vectorized symbolizer + packer must be bit-exact
against the sequential Python oracle on adversarial coefficient patterns."""

import jax.numpy as jnp
import numpy as np
import pytest

from jpegtpu.entropy import assemble, scan
from tests import reference_impl as ri


def _random_sparse_blocks(rng, n, density):
    c = np.zeros((n, 64), np.int32)
    mask = rng.random((n, 64)) < density
    c[mask] = rng.integers(-1023, 1024, mask.sum())
    return c


def _check_blocks(coeffs, n_luma=1, restart=0):
    """coeffs [nM, B, 64] -> assert bit-exact vs the sequential oracle."""
    coeffs = coeffs.astype(np.int32)
    n_mcu, b, _ = coeffs.shape
    lens, bits = scan.symbolize_scan(jnp.asarray(coeffs), n_luma, restart)
    r = restart if restart > 0 else n_mcu
    n_seg = -(-n_mcu // r)
    pad = n_seg * r - n_mcu
    lens = np.concatenate([np.asarray(lens),
                           np.zeros((pad, b, 64), np.int32)])
    bits = np.concatenate([np.asarray(bits),
                           np.zeros((pad, b, 64), np.uint32)])
    st, nb, sb = assemble.pack_segments(
        jnp.asarray(lens).reshape(-1, 64), jnp.asarray(bits).reshape(-1, 64),
        n_seg, r * b)
    st, nb, sb = np.asarray(st), np.asarray(nb), np.asarray(sb)

    ref_segs = ri.encode_scan_bits(coeffs, n_luma, restart)
    assert len(ref_segs) == n_seg
    for s in range(n_seg):
        assert int(sb[s]) == len(ref_segs[s]), f"segment {s} bit count"
        ref = ri.pack_and_stuff(ref_segs[s])
        got = st[s, :int(nb[s])].tobytes()
        assert got == ref, f"segment {s} bytes"


def test_single_dc_only_block():
    c = np.zeros((1, 1, 64), np.int32)
    c[0, 0, 0] = 5
    _check_blocks(c)


def test_all_zero_block():
    _check_blocks(np.zeros((1, 1, 64), np.int32))


def test_trailing_nonzero_no_eob():
    c = np.zeros((1, 1, 64), np.int32)
    c[0, 0, 63] = -3
    _check_blocks(c)  # run of 62 zeros -> 3 ZRLs + (14, v), no EOB


def test_zrl_boundaries():
    for run in [15, 16, 17, 31, 32, 33, 47, 48, 62]:
        c = np.zeros((1, 1, 64), np.int32)
        c[0, 0, 1 + run] = 7
        _check_blocks(c)


def test_negative_values_magnitude():
    c = np.zeros((1, 1, 64), np.int32)
    c[0, 0, 0] = -1024
    c[0, 0, 1] = -1
    c[0, 0, 2] = -255
    c[0, 0, 5] = 1023
    _check_blocks(c)


def test_dense_block():
    rng = np.random.default_rng(0)
    c = rng.integers(-5, 6, (3, 1, 64)).astype(np.int32)
    _check_blocks(c)


@pytest.mark.parametrize("density", [0.02, 0.15, 0.6])
def test_random_sparse_444(density):
    rng = np.random.default_rng(int(density * 100))
    c = _random_sparse_blocks(rng, 12 * 3, density).reshape(12, 3, 64)
    _check_blocks(c, n_luma=1, restart=0)


def test_random_420_with_restarts():
    rng = np.random.default_rng(7)
    c = _random_sparse_blocks(rng, 10 * 6, 0.1).reshape(10, 6, 64)
    _check_blocks(c, n_luma=4, restart=3)  # ragged last segment (10 = 3*3+1)


def test_restart_resets_dc_chain():
    rng = np.random.default_rng(8)
    c = _random_sparse_blocks(rng, 8 * 3, 0.05).reshape(8, 3, 64)
    _check_blocks(c, n_luma=1, restart=2)
    _check_blocks(c, n_luma=1, restart=8)


def test_dc_diffs_basic():
    c = np.zeros((4, 3, 64), np.int32)
    c[:, 0, 0] = [10, 12, 9, 9]     # Y
    c[:, 1, 0] = [5, 5, 7, 2]       # Cb
    c[:, 2, 0] = [1, 0, 0, 4]       # Cr
    d = np.asarray(scan.dc_diffs(jnp.asarray(c), 1, 0))
    np.testing.assert_array_equal(d[:, 0], [10, 2, -3, 0])
    np.testing.assert_array_equal(d[:, 1], [5, 0, 2, -5])
    np.testing.assert_array_equal(d[:, 2], [1, -1, 0, 4])
    # restart=2: chains reset at MCU 2
    d = np.asarray(scan.dc_diffs(jnp.asarray(c), 1, 2))
    np.testing.assert_array_equal(d[:, 0], [10, 2, 9, 0])


def test_dc_diffs_420_y_chain_within_mcu():
    """In 4:2:0 the Y predictor chains across the 4 Y blocks of each MCU."""
    c = np.zeros((2, 6, 64), np.int32)
    c[0, :4, 0] = [10, 11, 13, 10]
    c[1, :4, 0] = [20, 20, 25, 30]
    d = np.asarray(scan.dc_diffs(jnp.asarray(c), 4, 0))
    np.testing.assert_array_equal(d[0, :4], [10, 1, 2, -3])
    np.testing.assert_array_equal(d[1, :4], [10, 0, 5, 5])


def test_stuffing_materializes_zero_bytes():
    """Force 0xFF bytes in the packed stream and check 0x00 insertion."""
    # A crafted coefficient pattern with long runs of 1-bits: large values.
    c = np.full((2, 1, 64), 0, np.int32)
    c[:, :, 0] = 1023
    c[:, :, 1:4] = -1023
    _check_blocks(c)
