"""Pallas kernel tests (interpreter mode on CPU): the production kernels
must agree bit-for-bit with the XLA oracle tier."""

import jax.numpy as jnp
import numpy as np
import pytest

from jpegtpu.core import ops
from jpegtpu.entropy import scan
from jpegtpu.kernels import entropy_pack as ep
from jpegtpu.kernels import fused_dctq


def _random_blocks(rng, n_mcu, b, density=0.15, lo=-1023, hi=1024):
    c = np.zeros((n_mcu * b, 64), np.int32)
    mask = rng.random((n_mcu * b, 64)) < density
    c[mask] = rng.integers(lo, hi, mask.sum())
    return c.reshape(n_mcu, b, 64)


def _pack_block_oracle(lens_row, bits_row):
    """Sequential bit placement for one block -> BLOCK_WORDS words."""
    w = np.zeros(ep.BLOCK_WORDS, np.uint64)
    off = 0
    for L, v in zip(lens_row, bits_row):
        L, v = int(L), int(v)
        if L:
            wi, b = off >> 5, off & 31
            win = v << (64 - b - L)
            w[wi] |= win >> 32
            if wi + 1 < ep.BLOCK_WORDS:
                w[wi + 1] |= win & 0xFFFFFFFF
            off += L
    return w.astype(np.uint32), off


@pytest.mark.parametrize("density", [0.02, 0.3])
def test_block_pack_matches_oracle(density):
    rng = np.random.default_rng(int(density * 1000))
    n_mcu, b, n_luma, restart = 16, 3, 1, 4
    c = _random_blocks(rng, n_mcu, b, density)
    lens_o, bits_o = scan.symbolize_scan(jnp.asarray(c), n_luma, restart)
    lens_o = np.asarray(lens_o).reshape(-1, 64)
    bits_o = np.asarray(bits_o).reshape(-1, 64)

    cls = np.tile(np.array([0] * n_luma + [1] * (b - n_luma), np.int32),
                  n_mcu)
    dcd = np.asarray(scan.dc_diffs(jnp.asarray(c), n_luma, restart))
    words, blens = ep.block_pack(jnp.asarray(c.reshape(-1, 64)),
                                 jnp.asarray(cls),
                                 jnp.asarray(dcd.reshape(-1)))
    words, blens = np.asarray(words), np.asarray(blens)

    np.testing.assert_array_equal(blens, lens_o.sum(axis=1))
    for i in range(n_mcu * b):
        ref, _ = _pack_block_oracle(lens_o[i], bits_o[i])
        np.testing.assert_array_equal(words[i], ref, err_msg=f"block {i}")


def test_seg_merge_matches_oracle():
    rng = np.random.default_rng(7)
    n_mcu, b, n_luma, restart = 12, 6, 4, 4   # 3 segments, 420-style MCU
    c = _random_blocks(rng, n_mcu, b, 0.12, -255, 256)
    lens_o, bits_o = scan.symbolize_scan(jnp.asarray(c), n_luma, restart)
    lens_f = np.asarray(lens_o).reshape(3, -1)
    bits_f = np.asarray(bits_o).reshape(3, -1)

    # sequential oracle with byte 1-padding
    w_cap = 1024
    ref = np.zeros((3, w_cap), np.uint64)
    ref_bits = []
    for s in range(3):
        off = 0
        for L, v in zip(lens_f[s], bits_f[s]):
            L, v = int(L), int(v)
            if L:
                wi, bb = off >> 5, off & 31
                win = v << (64 - bb - L)
                ref[s, wi] |= win >> 32
                ref[s, wi + 1] |= win & 0xFFFFFFFF
                off += L
        pad = (-off) % 8
        if pad:
            wi, bb = off >> 5, off & 31
            win = ((1 << pad) - 1) << (64 - bb - pad)
            ref[s, wi] |= win >> 32
            ref[s, wi + 1] |= win & 0xFFFFFFFF
        ref_bits.append(off)
    ref = ref.astype(np.uint32)

    cls = np.tile(np.array([0] * n_luma + [1] * (b - n_luma), np.int32),
                  n_mcu)
    dcd = np.asarray(scan.dc_diffs(jnp.asarray(c), n_luma, restart))
    words, blens = ep.block_pack(jnp.asarray(c.reshape(-1, 64)),
                                 jnp.asarray(cls),
                                 jnp.asarray(dcd.reshape(-1)))
    sw, sb = ep.seg_merge(words, blens, 3, restart * b, w_cap)
    sw, sb = np.asarray(sw), np.asarray(sb)
    np.testing.assert_array_equal(sb, ref_bits)
    np.testing.assert_array_equal(sw[:, :w_cap], ref)


@pytest.mark.parametrize("g", [3, 6])
def test_seg_merge_v2_matches_v1(g):
    """Two-phase (MCU pre-merge + register window) merge must produce the
    same segment streams as the straightforward v1 serial merge."""
    rng = np.random.default_rng(g)
    n_mcu, n_luma, restart = 8, (4 if g == 6 else 1), 4
    c = _random_blocks(rng, n_mcu, g, 0.2, -255, 256)
    cls = np.tile(np.array([0] * n_luma + [1] * (g - n_luma), np.int32),
                  n_mcu)
    dcd = np.asarray(scan.dc_diffs(jnp.asarray(c), n_luma, restart))
    words, blens = ep.block_pack(jnp.asarray(c.reshape(-1, 64)),
                                 jnp.asarray(cls),
                                 jnp.asarray(dcd.reshape(-1)))
    n_seg, bps, w_cap = 2, restart * g, 2048
    sw1, sb1 = ep.seg_merge(words, blens, n_seg, bps, w_cap)
    sw2, sb2 = ep.seg_merge_v2(words, blens, n_seg, bps, w_cap,
                               blocks_per_mcu=g)
    np.testing.assert_array_equal(np.asarray(sb1), np.asarray(sb2))
    sw1, sw2 = np.asarray(sw1), np.asarray(sw2)
    for s in range(n_seg):
        n = (int(sb1[s]) + 31) // 32
        np.testing.assert_array_equal(sw2[s, :n], sw1[s, :n],
                                      err_msg=f"segment {s}")


@pytest.mark.parametrize("n_seg,g,block_mcus", [
    (2, 6, None),        # S=2, single m step
    (1, 6, 2),           # S=1 (restart=0-style), streamed in 2-MCU steps
    (3, 3, None),        # S=4 with one padded segment row
    (9, 6, 2),           # S=8, two groups, multi-step streaming
])
def test_seg_merge_v3_matches_v1(n_seg, g, block_mcus):
    """Offset-precomputed sublane-vectorized merge must produce the same
    segment streams as the v1 serial merge, across group/streaming shapes."""
    rng = np.random.default_rng(n_seg * 10 + g)
    restart = 4
    n_mcu = n_seg * restart
    n_luma = 4 if g == 6 else 1
    c = _random_blocks(rng, n_mcu, g, 0.2, -255, 256)
    cls = np.tile(np.array([0] * n_luma + [1] * (g - n_luma), np.int32),
                  n_mcu)
    dcd = np.asarray(scan.dc_diffs(jnp.asarray(c), n_luma, restart))
    words, blens = ep.block_pack(jnp.asarray(c.reshape(-1, 64)),
                                 jnp.asarray(cls),
                                 jnp.asarray(dcd.reshape(-1)))
    bps, w_cap = restart * g, 2048
    sw1, sb1 = ep.seg_merge(words, blens, n_seg, bps, w_cap)
    sw3, sb3, mx = ep.seg_merge_v3(words, blens, n_seg, bps, w_cap,
                                   blocks_per_mcu=g, block_mcus=block_mcus)
    np.testing.assert_array_equal(np.asarray(sb1), np.asarray(sb3))
    assert int(mx) == int(np.asarray(blens).reshape(-1, g).sum(1).max())
    sw1, sw3 = np.asarray(sw1), np.asarray(sw3)
    for s in range(n_seg):
        n = (int(sb1[s]) + 31) // 32
        np.testing.assert_array_equal(sw3[s, :n], sw1[s, :n],
                                      err_msg=f"segment {s}")


def test_seg_merge_v3_budget_chunks():
    """Budget-sized MCU capacity (1 chunk instead of 3 for 420) must stay
    bit-identical when every MCU fits the budget."""
    rng = np.random.default_rng(42)
    g, restart, n_seg = 6, 4, 2
    c = _random_blocks(rng, n_seg * restart, g, 0.1, -63, 64)
    cls = np.tile(np.array([0, 0, 0, 0, 1, 1], np.int32), n_seg * restart)
    dcd = np.asarray(scan.dc_diffs(jnp.asarray(c), 4, restart))
    words, blens = ep.block_pack(jnp.asarray(c.reshape(-1, 64)),
                                 jnp.asarray(cls),
                                 jnp.asarray(dcd.reshape(-1)))
    chunks, cap_bits = ep.mcu_capacity(g, 384)
    assert chunks == 1
    bps, w_cap = restart * g, 2048
    sw1, sb1 = ep.seg_merge(words, blens, n_seg, bps, w_cap)
    sw3, sb3, mx = ep.seg_merge_v3(words, blens, n_seg, bps, w_cap,
                                   blocks_per_mcu=g, mcu_chunks=chunks)
    assert int(mx) <= cap_bits      # precondition for the comparison
    np.testing.assert_array_equal(np.asarray(sb1), np.asarray(sb3))
    sw1, sw3 = np.asarray(sw1), np.asarray(sw3)
    for s in range(n_seg):
        n = (int(sb1[s]) + 31) // 32
        np.testing.assert_array_equal(sw3[s, :n], sw1[s, :n])


@pytest.mark.parametrize("n_seg,restart", [
    (1, 4),        # single segment, tiny/ragged
    (2, 12),       # segment length not a multiple of 8
    (5, 16),       # aligned, several segments
])
def test_seg_merge_mcu_small_geometries(n_seg, restart):
    """seg_merge_mcu must stay bit-identical to the v1 serial merge on
    small/ragged geometries (whatever kernel it dispatches to)."""
    rng = np.random.default_rng(n_seg * 31 + restart)
    g = 6
    n_mcu = n_seg * restart
    c = _random_blocks(rng, n_mcu, g, 0.1, -63, 64)
    cls = np.tile(np.array([0, 0, 0, 0, 1, 1], np.int32), n_mcu)
    dcd = np.asarray(scan.dc_diffs(jnp.asarray(c), 4, restart))
    words, blens = ep.block_pack(jnp.asarray(c.reshape(-1, 64)),
                                 jnp.asarray(cls),
                                 jnp.asarray(dcd.reshape(-1)))
    chunks, cap_bits = ep.mcu_capacity(g, 384)
    assert chunks == 1
    mw, ml = ep.mcu_merge(words, blens, g, chunks)
    assert int(jnp.max(ml)) <= cap_bits
    bps, w_cap = restart * g, 4096
    sw1, sb1 = ep.seg_merge(words, blens, n_seg, bps, w_cap)
    sw2, sb2, mx = ep.seg_merge_mcu(mw, ml, n_seg, restart, w_cap)
    assert int(mx) == int(np.asarray(ml).max())
    np.testing.assert_array_equal(np.asarray(sb1), np.asarray(sb2))
    sw1, sw2 = np.asarray(sw1), np.asarray(sw2)
    for s in range(n_seg):
        n = (int(sb1[s]) + 31) // 32
        np.testing.assert_array_equal(sw2[s, :n], sw1[s, :n],
                                      err_msg=f"segment {s}")


def test_seg_merge_mcu_s_rows_64():
    """s_rows=64 (two-word crossing bitmap) must be bit-identical to the
    production s_rows=32 selection, including a padded group (70
    segments -> 128 padded rows). HW verdict (scripts/tpu_probe_srows):
    bit-identical but SLOWER than 32 at 4K n_seg=135 — tested negative
    result, kept selectable."""
    rng = np.random.default_rng(64)
    n_seg, mps, g = 70, 12, 6
    chunks, _ = ep.mcu_capacity(g, 384)
    nm = n_seg * mps
    mlens = rng.integers(20, 900, nm).astype(np.int32)
    mwords = np.zeros((nm, chunks * 128), np.uint32)
    for i in range(nm):
        nw = -(-int(mlens[i]) // 32)
        w = rng.integers(0, 1 << 32, nw, dtype=np.uint64).astype(np.uint32)
        tail = int(mlens[i]) & 31
        if tail:
            w[-1] &= np.uint32(0xFFFFFFFF) << (32 - tail)
        mwords[i, :nw] = w
    w_cap = -(-mps * g * 384 // 32)
    o64, b64, _ = ep.seg_merge_mcu(jnp.asarray(mwords), jnp.asarray(mlens),
                                   n_seg, mps, w_cap, s_rows=64)
    o32, b32, _ = ep.seg_merge_mcu(jnp.asarray(mwords), jnp.asarray(mlens),
                                   n_seg, mps, w_cap, s_rows=32)
    np.testing.assert_array_equal(np.asarray(b64), np.asarray(b32))
    np.testing.assert_array_equal(np.asarray(o64), np.asarray(o32))


def test_mcu_merge_against_block_oracle():
    """Pre-merged MCU stream == sequentially packed concatenation."""
    rng = np.random.default_rng(3)
    c = _random_blocks(rng, 4, 6, 0.25, -63, 64)
    cls = np.tile(np.array([0, 0, 0, 0, 1, 1], np.int32), 4)
    dcd = np.asarray(scan.dc_diffs(jnp.asarray(c), 4, 0))
    words, blens = ep.block_pack(jnp.asarray(c.reshape(-1, 64)),
                                 jnp.asarray(cls),
                                 jnp.asarray(dcd.reshape(-1)))
    mw, ml = ep.mcu_merge(words, blens, 6)
    mw, ml = np.asarray(mw), np.asarray(ml)
    words, blens = np.asarray(words), np.asarray(blens)
    np.testing.assert_array_equal(ml, blens.reshape(4, 6).sum(axis=1))
    for i in range(4):
        stream = np.zeros(mw.shape[1], np.uint64)
        off = 0
        for gi in range(6):
            for wi in range(ep.BLOCK_WORDS):
                v = int(words[i * 6 + gi, wi])
                if v == 0:
                    continue
                # word wi covers bits [32wi, 32wi+32) of the block stream
                o = off + 32 * wi
                wq, bq = o >> 5, o & 31
                win = v << (32 - bq)
                stream[wq] |= win >> 32
                stream[wq + 1] |= win & 0xFFFFFFFF
            off += int(blens[i * 6 + gi])
        np.testing.assert_array_equal(mw[i], stream.astype(np.uint32),
                                      err_msg=f"mcu {i}")


@pytest.mark.parametrize("g", [1, 3, 4, 6])
def test_block_pack_mcu_matches_composition(g):
    """Fused kernels B+C == block_pack -> mcu_merge, bit for bit
    (including odd g via the dummy-block pair pad and row padding)."""
    rng = np.random.default_rng(11 + g)
    for nm in (5, 300):
        c = _random_blocks(rng, nm, g, 0.2, -255, 256)
        cls = (rng.random(nm * g) < 0.4).astype(np.int32)
        dcd = rng.integers(-500, 500, nm * g).astype(np.int32)
        chunks, _ = ep.mcu_capacity(g, 384)
        w, l = ep.block_pack(jnp.asarray(c.reshape(-1, 64)),
                             jnp.asarray(cls), jnp.asarray(dcd))
        mw0, ml0 = ep.mcu_merge(w, l, g, chunks)
        mw1, ml1 = ep.block_pack_mcu(jnp.asarray(c.reshape(-1, 64)),
                                     jnp.asarray(cls), jnp.asarray(dcd),
                                     g, chunks)
        np.testing.assert_array_equal(np.asarray(mw0), np.asarray(mw1))
        np.testing.assert_array_equal(np.asarray(ml0), np.asarray(ml1))


def _stuff_oracle(seg_bytes_list, restart):
    """Reference scan assembly: 0xFF00 stuffing + RSTn splicing."""
    parts = []
    for s, raw in enumerate(seg_bytes_list):
        out = bytearray()
        for b in raw:
            out.append(b)
            if b == 0xFF:
                out.append(0)
        parts.append(bytes(out))
        if restart > 0 and s != len(seg_bytes_list) - 1:
            parts.append(bytes((0xFF, 0xD0 + (s % 8))))
    return b"".join(parts)


@pytest.mark.parametrize("kb", [1, 2, 3, 4])
@pytest.mark.parametrize("restart", [0, 4])
@pytest.mark.parametrize("seed", [0, 1])
def test_compact_stuffed_matches_oracle(restart, seed, kb):
    """Device-side stuffing+RST splicing must reproduce the host scan
    assembly byte for byte, including FF-heavy content and masked tails.
    kb > 1 runs the chunk-batched kernel (same bytes required)."""
    rng = np.random.default_rng(seed)
    n_seg, frames = 3, 2
    # Build the big-endian byte stream first (seg streams are BE words:
    # byte 0 of the scan is the MSB of word 0), with dense 0xFF content.
    by = rng.integers(0, 256, (n_seg, frames * 4096), dtype=np.uint8)
    by[rng.random(by.shape) < 0.25] = 0xFF
    if restart == 0:
        n_seg = 1
        by = by[:1]
    seg_bits = np.array([4097 * 8 - 3, 5000 * 8, 40][:n_seg], np.int32)
    nbytes = (seg_bits + 7) // 8
    by[0, nbytes[0] - 1] = 0xFF               # last byte FF -> stuffed
    b4 = by.reshape(n_seg, -1, 4).astype(np.uint32)
    words = ((b4[..., 0] << 24) | (b4[..., 1] << 16) |
             (b4[..., 2] << 8) | b4[..., 3])

    expected = _stuff_oracle([by[s, :nbytes[s]] for s in range(n_seg)],
                             restart)

    stream, img_off, total = ep.compact_segments_stuffed(
        jnp.asarray(words), jnp.asarray(seg_bits), frames, restart,
        k_chunks=kb)
    raw = np.asarray(stream).view(np.uint8)[:int(total)]
    assert int(total) == len(expected)
    assert raw.tobytes() == expected


@pytest.mark.parametrize("kb", [1, 2, 3, 4])
@pytest.mark.parametrize("resid", [4093, 4094, 4095])
def test_compact_stuffed_trailing_marker_frame_edge(resid, kb):
    """Trailing RST marker on the LAST segment (the sharded row-shard path
    gives non-final shards one) with seg_end landing at the 4 KB frame
    edge. Regression: the final drain excluded the trailing marker, so at
    seg_end%4096==4094 the marker-completed frame was re-flushed from the
    zeroed window (4096 output bytes silently zeroed) and at 4095 the
    marker's second byte was never flushed at all. 4093 is the control."""
    rng = np.random.default_rng(resid)
    n_seg, frames = 2, 2
    # No 0xFF anywhere: stuffing is identity, so byte positions are exact.
    by = rng.integers(0, 255, (n_seg, frames * 4096), dtype=np.uint8)
    n0 = 100
    # seg_start of seg 1 is n0 + 2 (marker after seg 0); choose n1 so
    # seg 1's seg_end = 4096 + resid, i.e. marker bytes straddle/complete
    # the second output frame.
    n1 = (4096 + resid) - (n0 + 2)
    seg_bits = np.array([n0 * 8, n1 * 8], np.int32)
    b4 = by.reshape(n_seg, -1, 4).astype(np.uint32)
    words = ((b4[..., 0] << 24) | (b4[..., 1] << 16) |
             (b4[..., 2] << 8) | b4[..., 3])
    # Markers after BOTH segments, as on a non-final row shard.
    mnum = np.array([0xD0, 0xD1], np.int32)

    expected = (by[0, :n0].tobytes() + b"\xff\xd0" +
                by[1, :n1].tobytes() + b"\xff\xd1")

    stream, _, total = ep.compact_segments_stuffed(
        jnp.asarray(words), jnp.asarray(seg_bits), frames, 4,
        mnum=jnp.asarray(mnum), k_chunks=kb)
    raw = np.asarray(stream).view(np.uint8)[:int(total)]
    assert int(total) == len(expected)
    assert raw.tobytes() == expected


def test_compact_stuffed_batched_images():
    """With segs_per_image, RST markers and numbering reset per image and
    image_offsets slice the stream into independent scans."""
    rng = np.random.default_rng(7)
    n_seg, frames, spi = 4, 1, 2
    by = rng.integers(0, 256, (n_seg, frames * 4096), dtype=np.uint8)
    by[rng.random(by.shape) < 0.3] = 0xFF
    seg_bits = np.array([100 * 8, 33 * 8, 4000 * 8, 7 * 8], np.int32)
    nbytes = (seg_bits + 7) // 8
    b4 = by.reshape(n_seg, -1, 4).astype(np.uint32)
    words = ((b4[..., 0] << 24) | (b4[..., 1] << 16) |
             (b4[..., 2] << 8) | b4[..., 3])

    expected_imgs = [
        _stuff_oracle([by[0, :nbytes[0]], by[1, :nbytes[1]]], 4),
        _stuff_oracle([by[2, :nbytes[2]], by[3, :nbytes[3]]], 4),
    ]
    stream, img_off, total = ep.compact_segments_stuffed(
        jnp.asarray(words), jnp.asarray(seg_bits), frames, 4,
        segs_per_image=spi)
    raw = np.asarray(stream).view(np.uint8)[:int(total)].tobytes()
    off = np.asarray(img_off)
    assert raw[off[0]:off[1]] == expected_imgs[0]
    assert raw[off[1]:] == expected_imgs[1]


@pytest.mark.parametrize("subsampling", ["444", "422", "420", "444s"])
@pytest.mark.parametrize("quality", [35, 90])
def test_fused_dctq_matches_ops(subsampling, quality):
    # (32, 48) is 8-aligned, so 444s takes the fused in-operator-
    # smoothing path here — a REAL comparison against the staged
    # smooth-then-DCT oracle (mean-vs-CSC rounding reorder lands in the
    # same tolerance class as the other modes' staged-vs-fused skew).
    rng = np.random.default_rng(quality)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    a = np.asarray(ops.encode_blocks(img, quality, subsampling))
    b = np.asarray(fused_dctq.encode_blocks(jnp.asarray(img), quality,
                                            subsampling))
    # single fused f32 matmul vs staged f32: tiny rounding-boundary skew only
    d = np.abs(a - b)
    assert d.max() <= 1
    assert (d > 0).mean() < 1e-3


def test_fused_dctq_444s_odd_sizes_delegate_to_ops():
    """Non-8-aligned 444s must take the staged oracle path EXACTLY (the
    reference smooths before mirror-padding and passes odd edges
    through — semantics a uniform per-MCU operator cannot express)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (17, 19, 3), dtype=np.uint8)
    a = np.asarray(ops.encode_blocks(img, 75, "444s"))
    b = np.asarray(fused_dctq.encode_blocks(jnp.asarray(img), 75, "444s"))
    np.testing.assert_array_equal(a, b)


def test_fused_dctq_odd_sizes():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (17, 19, 3), dtype=np.uint8)
    a = np.asarray(ops.encode_blocks(img, 75, "420"))
    b = np.asarray(fused_dctq.encode_blocks(jnp.asarray(img), 75, "420"))
    assert a.shape == b.shape
    assert np.abs(a - b).max() <= 1


@pytest.mark.parametrize("shape", [(64, 96, 3), (33, 17, 3), (16, 16, 3),
                                   (2, 48, 32, 3)])
@pytest.mark.parametrize("quality", [35, 90])
def test_pixel_kernel_bit_exact_vs_twin(shape, quality):
    """The Pallas pixel kernel must be BIT-identical to its XLA twin
    (encode_blocks) — it is the production pixel path on the Pallas
    entropy paths, and scripts/tpu_bisect.py extends this check to real
    hardware."""
    rng = np.random.default_rng(quality + sum(shape))
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    a = np.asarray(fused_dctq.encode_blocks(jnp.asarray(img), quality,
                                            "420"))
    b = np.asarray(fused_dctq.encode_blocks_pallas(jnp.asarray(img),
                                                   quality, "420"))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("shape", [(64, 96, 3), (33, 17, 3), (16, 16, 3),
                                   (2, 48, 32, 3)])
@pytest.mark.parametrize("quality", [35, 90])
def test_pixel_kernel_dma_bit_exact_vs_twin(shape, quality):
    """The DMA-input pixel kernel (kernel-managed HBM->VMEM tiling +
    in-kernel xor) must also be BIT-identical to the XLA twin in the
    pairs layout; scripts/tpu_probe_pixel_dma.py extends this to the
    full program on hardware."""
    rng = np.random.default_rng(quality + sum(shape))
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    a = np.asarray(fused_dctq.encode_blocks_pairs(jnp.asarray(img),
                                                  quality, "420"))
    b = np.asarray(fused_dctq.encode_blocks_pallas_dma_pairs(
        jnp.asarray(img), quality, "420"))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("sub,shape", [
    ("420", (64, 128, 3)),    # nrx=8: one full lane group
    ("420", (33, 250, 3)),    # odd dims, mirror pad, nrx=16
    ("420", (2, 48, 128, 3)),  # batch
    ("420", (16, 96, 3)),     # nrx=6 % 8 != 0: XLA fallback
    ("422", (32, 128, 3)),    # grp=8 (48 B rows)
    ("444", (17, 250, 3)),    # grp=16 (24 B rows), nrx=32
    ("444s", (32, 128, 3)),   # 8-aligned: in-operator smoothing path
])
@pytest.mark.parametrize("quality", [35, 90])
def test_pixel_kernel_nat_bit_exact_vs_twin(sub, shape, quality):
    """The natural-layout pixel kernel (production since round 3: row-slab
    input, in-kernel lanes->sublanes MCU transpose) must be BIT-identical
    to the XLA twin in the pairs layout across every MCU geometry it
    covers, and fall back cleanly when nrx has no whole lane group;
    scripts/tpu_ab_pixel_nat.py extends this to the full program on
    hardware."""
    rng = np.random.default_rng(quality + sum(shape))
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    a = np.asarray(fused_dctq.encode_blocks_pairs(jnp.asarray(img),
                                                  quality, sub))
    b = np.asarray(fused_dctq.encode_blocks_pallas_nat_pairs(
        jnp.asarray(img), quality, sub))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("sub,shape", [
    ("420", (64, 128, 3)),
    ("444", (17, 250, 3)),
    ("420", (16, 96, 3)),     # XLA fallback path: dc must come back None
])
def test_pixel_kernel_dc_plane_matches_slice(sub, shape):
    """The DC-plane second output (round 5, fused_dctq._PIXEL_DC,
    tested-negative default-off variant): the COEFFS output must stay
    bit-identical to the XLA twin (the CLAUDE.md kernel-twin invariant
    — _pixel_kernel_nat_dc is a separate kernel body that could drift
    from _pixel_kernel_nat), the dc plane must equal coeffs[:, ::64]
    with lanes >= B zero, and fallback paths must return dc=None;
    scripts/tpu_ab_pixel_dc.py extends this to the full program on HW."""
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = fused_dctq.encode_blocks_pallas_nat_pairs(
        jnp.asarray(img), 85, sub, with_dc=True)
    coeffs, dc = out
    cref = np.asarray(coeffs)
    twin = np.asarray(fused_dctq.encode_blocks_pairs(
        jnp.asarray(img), 85, sub))
    np.testing.assert_array_equal(cref, twin)
    if shape == (16, 96, 3):
        assert dc is None
        return
    dcn = np.asarray(dc)
    b = cref.shape[-1] // 64
    np.testing.assert_array_equal(dcn[..., :b], cref[..., ::64])
    assert not dcn[..., b:].any()


@pytest.mark.parametrize("sub,n_luma,shape,restart", [
    ("420", 4, (64, 128, 3), 8),      # rows restart
    ("420", 4, (64, 128, 3), 0),      # restartless (virtual-split dcd)
    ("420", 4, (33, 250, 3), 3),      # general N + mirror pad
    ("422", 2, (32, 128, 3), 8),
    ("444", 1, (17, 250, 3), 5),      # odd g: dummy block pair
    ("420", 4, (2, 48, 128, 3), 8),   # batch (resets cross images)
])
def test_fused_pipeline_matches_split(sub, n_luma, shape, restart):
    """The mega-fused pixel+block-pack kernel (fused_pipeline) must be
    bit-identical to the split pipeline running on the SAME Pallas
    pixel-kernel coefficients — including the in-kernel DC-difference
    chain (sublane rolls + cross-row carry + restart resets) against
    scan.dc_diffs_from_dc. The comparison pins both sides to the nat
    kernel's matmul because the XLA twin can differ by one rounding ulp
    on knife-edge values (see fused_pipeline docstring);
    scripts/tpu_ab_fused_bp.py extends this to hardware."""
    from jpegtpu.entropy import scan as escan
    from jpegtpu.kernels import fused_pipeline

    rng = np.random.default_rng(sum(shape) + restart)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    b = n_luma + 2
    chunks, _ = ep.mcu_capacity(b, 384)
    out = fused_pipeline.fused_pixel_block_pack_pairs(
        jnp.asarray(img), 90, sub, restart, chunks, n_luma)
    assert out is not None
    mw, ml = out
    c = fused_dctq.encode_blocks_pallas_nat_pairs(jnp.asarray(img), 90,
                                                  sub)
    flat = c.reshape(-1, c.shape[-1])
    nm = flat.shape[0]
    dcd = escan.dc_diffs_from_dc(flat[:, ::64], n_luma,
                                 restart).reshape(-1)
    cls = (jnp.arange(nm * b, dtype=jnp.int32) % b >= n_luma)
    mw2, ml2 = ep.block_pack_mcu_pairs(flat, cls.astype(jnp.int32), dcd,
                                       b, chunks, n_luma=n_luma)
    np.testing.assert_array_equal(np.asarray(mw), np.asarray(mw2))
    np.testing.assert_array_equal(np.asarray(ml), np.asarray(ml2))


def test_encoder_fused_bp_end_to_end(monkeypatch):
    """EncoderConfig(fuse_bp=True) routes the Pallas tier through the
    mega-fused front-end; the complete encode must stay byte-identical to
    the XLA oracle encoder (the production-flip precondition).

    Geometry (64, 128, 3): 4:2:0 gives nrx=8 MCUs per row, a multiple of
    the kernel's grp=8, so fused_pixel_block_pack_pairs actually covers it
    — asserted below (with 64x48 / nrx=3 the fused path returned None and
    this test silently validated only the fallback; advisor r3 medium)."""
    import jpegtpu.encoder as enc_mod
    import jpegtpu.kernels.entropy_pack as epk
    from jpegtpu.config import EncoderConfig
    from jpegtpu.kernels import fused_pipeline

    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, (64, 128, 3), dtype=np.uint8)
    fused_calls = []
    real_fused = fused_pipeline.fused_pixel_block_pack_pairs

    def spy(*a, **k):
        out = real_fused(*a, **k)
        fused_calls.append(out is not None)
        return out

    for restart in ("rows", 0, 2):
        base = EncoderConfig(quality=85, subsampling="420",
                             restart_interval=restart)
        xla_bytes = enc_mod.Encoder(base).encode(img)

        cfg = EncoderConfig(quality=85, subsampling="420",
                            restart_interval=restart, fuse_bp=True)
        monkeypatch.setattr(enc_mod.jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(epk, "_interpret", lambda: True)
        monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
        monkeypatch.setattr(fused_pipeline,
                            "fused_pixel_block_pack_pairs", spy)
        enc_mod._jitted_encode.cache_clear()
        try:
            pallas_bytes = enc_mod.Encoder(cfg).encode(img)
        finally:
            monkeypatch.undo()
            enc_mod._jitted_encode.cache_clear()
        assert pallas_bytes == xla_bytes, restart
    # the mega-fused front-end must have been TAKEN, not fallen back
    assert fused_calls and all(fused_calls), fused_calls


def test_pixel_kernel_non420_falls_back():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    for sub in ("444", "422"):
        a = np.asarray(fused_dctq.encode_blocks(jnp.asarray(img), 80, sub))
        b = np.asarray(fused_dctq.encode_blocks_pallas(jnp.asarray(img),
                                                       80, sub))
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("sub", [
    "420",
    # 444/422 exercise the grouped batch path (gm > 1) under the
    # round-5 mode-aware first-pass budgets (330 / 248)
    pytest.param("444", marks=pytest.mark.deep),
    "422",
])
def test_encode_batch_fused_matches_single(monkeypatch, sub):
    """Batched device program must produce byte-identical files to the
    per-image path (interpret mode), in every subsampling mode."""
    import jpegtpu.encoder as enc_mod
    import jpegtpu.kernels.entropy_pack as epk
    from jpegtpu.config import EncoderConfig

    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 256, (3, 24, 16, 3), dtype=np.uint8)
    cfg = EncoderConfig(quality=80, subsampling=sub,
                        restart_interval="rows")
    singles = [enc_mod.Encoder(cfg).encode(im) for im in imgs]

    monkeypatch.setattr(enc_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(epk, "_interpret", lambda: True)
    monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
    enc_mod._jitted_encode.cache_clear()
    enc_mod._jitted_encode_batch.cache_clear()
    try:
        batched = enc_mod._encode_batch_fused(imgs, cfg)
    finally:
        enc_mod._jitted_encode.cache_clear()
        enc_mod._jitted_encode_batch.cache_clear()
    assert batched == singles


def test_encode_batch_fused_budget_escalation(monkeypatch):
    """A custom non-default bits_budget small enough to overflow must
    escalate on the BATCH path with the custom value threaded into the
    overflow check (not DEFAULT_BITS_BUDGET) and produce byte-identical
    output (VERDICT r3 weak #5)."""
    import jpegtpu.encoder as enc_mod
    import jpegtpu.kernels.entropy_pack as epk
    from jpegtpu.config import EncoderConfig

    rng = np.random.default_rng(6)
    imgs = rng.integers(0, 256, (2, 24, 16, 3), dtype=np.uint8)
    singles = [enc_mod.Encoder(EncoderConfig(
        quality=100, subsampling="420",
        restart_interval="rows")).encode(im) for im in imgs]

    cfg = EncoderConfig(quality=100, subsampling="420",
                        restart_interval="rows", bits_budget=48)
    seen = []
    real_overflow = enc_mod._budget_overflow

    def spy(seg_bits_np, max_mcu_bits, cap_bits, blocks_per_mcu,
            bits_budget):
        seen.append(bits_budget)
        return real_overflow(seg_bits_np, max_mcu_bits, cap_bits,
                             blocks_per_mcu, bits_budget)

    monkeypatch.setattr(enc_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(epk, "_interpret", lambda: True)
    monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
    monkeypatch.setattr(enc_mod, "_budget_overflow", spy)
    enc_mod._jitted_encode_batch.cache_clear()
    try:
        batched = enc_mod._encode_batch_fused(imgs, cfg)
    finally:
        enc_mod._jitted_encode_batch.cache_clear()
    assert batched == singles
    assert seen == [48], seen  # the FIRST-PASS budget, threaded through


def test_pallas_path_ragged_restart(monkeypatch):
    """Restart interval that does not divide the MCU count: the padded tail
    segment must stay silent (zero-length blocks) on the Pallas path too."""
    import jpegtpu.encoder as enc_mod
    import jpegtpu.kernels.entropy_pack as epk
    from jpegtpu.config import EncoderConfig

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (80, 16, 3), dtype=np.uint8)  # 5 MCU rows
    cfg = EncoderConfig(quality=75, subsampling="420", restart_interval=2)
    xla_bytes = enc_mod.Encoder(cfg).encode(img)   # 5 MCUs, segs 2+2+1

    monkeypatch.setattr(enc_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(epk, "_interpret", lambda: True)
    monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
    enc_mod._jitted_encode.cache_clear()
    try:
        pallas_bytes = enc_mod.Encoder(cfg).encode(img)
    finally:
        enc_mod._jitted_encode.cache_clear()
    assert pallas_bytes == xla_bytes


def test_budget_escalation(monkeypatch):
    """A tiny bits budget must trigger the worst-case re-run, with output
    identical to the XLA path (correctness is unconditional)."""
    import jpegtpu.encoder as enc_mod
    import jpegtpu.kernels.entropy_pack as epk
    from jpegtpu.config import EncoderConfig

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)  # noise: dense
    xla_bytes = enc_mod.Encoder(EncoderConfig(
        quality=100, subsampling="444",
        restart_interval="rows")).encode(img)

    # A custom (non-default) first-pass budget small enough to overflow:
    # the escalation must key off the budget the first pass actually
    # compiled with, not DEFAULT_BITS_BUDGET (VERDICT r3 weak #5).
    cfg = EncoderConfig(quality=100, subsampling="444",
                        restart_interval="rows", bits_budget=48)
    monkeypatch.setattr(enc_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(epk, "_interpret", lambda: True)
    monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
    enc_mod._jitted_encode.cache_clear()
    try:
        pallas_bytes = enc_mod.Encoder(cfg).encode(img)
    finally:
        enc_mod._jitted_encode.cache_clear()
    assert pallas_bytes == xla_bytes


def test_encoder_pallas_entropy_path_end_to_end(monkeypatch):
    """Force the Pallas entropy path (interpret mode) through the public
    encoder and compare bytes with the XLA path."""
    import jpegtpu.encoder as enc_mod
    from jpegtpu.config import EncoderConfig

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)

    cfg = EncoderConfig(quality=75, subsampling="420",
                        restart_interval="rows")
    xla_bytes = enc_mod.Encoder(cfg).encode(img)

    monkeypatch.setattr(enc_mod.jax, "default_backend", lambda: "tpu")
    # interpret-mode detection keys off the real backend, so patch it too
    import jpegtpu.kernels.entropy_pack as epk
    monkeypatch.setattr(epk, "_interpret", lambda: True)
    monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
    enc_mod._jitted_encode.cache_clear()
    try:
        pallas_bytes = enc_mod.Encoder(cfg).encode(img)
    finally:
        enc_mod._jitted_encode.cache_clear()
    assert pallas_bytes == xla_bytes


@pytest.mark.parametrize("n_seg,mps", [(3, 8), (5, 24), (1, 16)])
def test_block_pack_mcu_pairs_mcu_major(n_seg, mps):
    """mcu_major_segs output == the flat output rearranged: column s of
    [mps, n_seg, .] is segment s's MCU streams."""
    rng = np.random.default_rng(7 * n_seg + mps)
    g = 6
    nm = n_seg * mps
    c = _random_blocks(rng, nm, g, 0.2, -255, 256)
    cls = (rng.random(nm * g) < 0.4).astype(np.int32)
    dcd = rng.integers(-500, 500, nm * g).astype(np.int32)
    chunks, _ = ep.mcu_capacity(g, 384)
    c2 = jnp.asarray(c.reshape(nm, g * 64))
    mw0, ml0 = ep.block_pack_mcu_pairs(c2, jnp.asarray(cls),
                                       jnp.asarray(dcd), g, chunks)
    mw1, ml1 = ep.block_pack_mcu_pairs(c2, jnp.asarray(cls),
                                       jnp.asarray(dcd), g, chunks,
                                       mcu_major_segs=n_seg)
    n_seg_p = -(-n_seg // 8) * 8
    assert mw1.shape == (mps, n_seg_p * chunks * 128)
    got = np.asarray(mw1).reshape(mps, n_seg_p, chunks * 128)
    np.testing.assert_array_equal(
        np.asarray(mw0).reshape(n_seg, mps, -1).transpose(1, 0, 2),
        got[:, :n_seg])
    np.testing.assert_array_equal(np.asarray(ml0), np.asarray(ml1))


@pytest.mark.parametrize("n_seg,restart", [(1, 8), (3, 16), (9, 24)])
def test_seg_merge_mcu_mcu_major(n_seg, restart):
    """seg_merge_mcu(mcu_major=True) on [mps, n_seg, CW] input must be
    bit-identical to the segment-major path (incl. the n_seg > 8 case
    that spans sublane groups and the mps padding path)."""
    rng = np.random.default_rng(n_seg * 13 + restart)
    g = 6
    n_mcu = n_seg * restart
    c = _random_blocks(rng, n_mcu, g, 0.1, -63, 64)
    cls = np.tile(np.array([0, 0, 0, 0, 1, 1], np.int32), n_mcu)
    dcd = np.asarray(scan.dc_diffs(jnp.asarray(c), 4, restart))
    chunks, _ = ep.mcu_capacity(g, 384)
    c2 = jnp.asarray(c.reshape(n_mcu, g * 64))
    mw, ml = ep.block_pack_mcu_pairs(c2, jnp.asarray(cls),
                                     jnp.asarray(dcd.reshape(-1)), g,
                                     chunks)
    mwm, _ = ep.block_pack_mcu_pairs(c2, jnp.asarray(cls),
                                     jnp.asarray(dcd.reshape(-1)), g,
                                     chunks, mcu_major_segs=n_seg)
    w_cap = 4096
    sw0, sb0, mx0 = ep.seg_merge_mcu(mw, ml, n_seg, restart, w_cap)
    sw1, sb1, mx1 = ep.seg_merge_mcu(mwm, ml, n_seg, restart, w_cap,
                                     mcu_major=True)
    assert int(mx0) == int(mx1)
    np.testing.assert_array_equal(np.asarray(sb0), np.asarray(sb1))
    np.testing.assert_array_equal(np.asarray(sw0), np.asarray(sw1))


def test_seg_merge_mcu_mcu_major_multistep(monkeypatch):
    """mcu-major streaming across m grid steps (block_mcus < mps)."""
    rng = np.random.default_rng(5)
    g, n_seg, restart = 6, 2, 32
    n_mcu = n_seg * restart
    c = _random_blocks(rng, n_mcu, g, 0.15, -63, 64)
    cls = np.tile(np.array([0, 0, 0, 0, 1, 1], np.int32), n_mcu)
    dcd = np.asarray(scan.dc_diffs(jnp.asarray(c), 4, restart))
    chunks, _ = ep.mcu_capacity(g, 384)
    c2 = jnp.asarray(c.reshape(n_mcu, g * 64))
    mw, ml = ep.block_pack_mcu_pairs(c2, jnp.asarray(cls),
                                     jnp.asarray(dcd.reshape(-1)), g,
                                     chunks)
    mwm, _ = ep.block_pack_mcu_pairs(c2, jnp.asarray(cls),
                                     jnp.asarray(dcd.reshape(-1)), g,
                                     chunks, mcu_major_segs=n_seg)
    w_cap = 8192
    sw0, sb0, _ = ep.seg_merge_mcu(mw, ml, n_seg, restart, w_cap)
    sw1, sb1, _ = ep.seg_merge_mcu(mwm, ml, n_seg, restart, w_cap,
                                   mcu_major=True, block_mcus=8)
    np.testing.assert_array_equal(np.asarray(sb0), np.asarray(sb1))
    np.testing.assert_array_equal(np.asarray(sw0), np.asarray(sw1))


def test_encoder_mcu_major_path_end_to_end(monkeypatch):
    """The (disabled-by-default) MCU-major handoff must stay byte-
    identical to the transpose path through the public encoder."""
    import jpegtpu.encoder as enc_mod
    import jpegtpu.kernels.entropy_pack as epk
    from jpegtpu.config import EncoderConfig

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (64, 128, 3), dtype=np.uint8)
    cfg = EncoderConfig(quality=75, subsampling="420",
                        restart_interval="rows")
    xla_bytes = enc_mod.Encoder(cfg).encode(img)

    monkeypatch.setattr(enc_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(epk, "_interpret", lambda: True)
    monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
    monkeypatch.setattr(enc_mod, "_MCU_MAJOR_ENABLED", True)
    # 64x128 rows-restart: mps = 8, divisible by 8 -> gate applies
    assert enc_mod._mcu_major_ok(0, 8, 3)
    enc_mod._jitted_encode.cache_clear()
    try:
        mm_bytes = enc_mod.Encoder(cfg).encode(img)
    finally:
        enc_mod._jitted_encode.cache_clear()
    assert mm_bytes == xla_bytes


def test_bit_join_matches_numpy_oracle():
    """bit_join must concatenate big-endian bit streams exactly,
    stripping per-stream byte padding and 1-padding the joined tail."""
    rng = np.random.default_rng(9)
    s, wv = 8, 6
    bits = rng.integers(0, wv * 32 - 8, s).astype(np.int32)
    bits[3] = 0                                  # empty stream
    words = rng.integers(0, 2 ** 32, (s, wv), dtype=np.uint64)

    def mask_np(w, nb):
        out = []
        for i in range(wv):
            keep = min(max(nb - 32 * i, 0), 32)
            m = 0 if keep == 0 else (0xFFFFFFFF << (32 - keep)) & 0xFFFFFFFF
            out.append(int(w[i]) & m)
        return out

    bitstr = ""
    for k in range(s):
        for i, wd in enumerate(mask_np(words[k], int(bits[k]))):
            take = min(max(int(bits[k]) - 32 * i, 0), 32)
            bitstr += format(wd, "032b")[:take]
    total = len(bitstr)
    pad = (-total) % 8
    bitstr += "1" * pad
    bitstr += "0" * ((-len(bitstr)) % 32)
    ref = np.array([int(bitstr[i:i + 32], 2)
                    for i in range(0, len(bitstr), 32)], dtype=np.uint64)

    out_words = 64
    got, tot = ep.bit_join(jnp.asarray(words.astype(np.uint32)),
                           jnp.asarray(bits), out_words)
    got = np.asarray(got)
    assert int(tot) == total
    np.testing.assert_array_equal(got[:len(ref)], ref.astype(np.uint32))
    assert not got[len(ref):].any()

    # The tree form (tested-negative variant, kept selectable) must be
    # bit-identical too, including at non-power-of-two stream counts.
    for s_sub in (s, 5):
        gt, tt = ep._bit_join_tree(
            jnp.asarray(words[:s_sub].astype(np.uint32)),
            jnp.asarray(bits[:s_sub]), out_words)
        gl, tl = ep.bit_join(
            jnp.asarray(words[:s_sub].astype(np.uint32)),
            jnp.asarray(bits[:s_sub]), out_words)
        assert int(tt) == int(tl)
        np.testing.assert_array_equal(np.asarray(gt), np.asarray(gl))


def test_encoder_restart0_virtual_split(monkeypatch):
    """restart=0 takes the 8-way virtual-segment merge + bit_join path
    and must stay byte-identical to the XLA oracle (incl. ragged splits
    with empty virtual segments)."""
    import jpegtpu.encoder as enc_mod
    import jpegtpu.kernels.entropy_pack as epk
    from jpegtpu.config import EncoderConfig

    rng = np.random.default_rng(4)
    # 64x64: 16 MCUs, exact 8-way split; 33x130: 27 MCUs, ragged split
    # incl. one fully-empty virtual segment
    for shape in ((64, 64, 3), (33, 130, 3)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        cfg = EncoderConfig(quality=85, subsampling="420",
                            restart_interval=0)
        oracle = enc_mod.Encoder(
            EncoderConfig(quality=85, subsampling="420", restart_interval=0,
                          device_bitpack=False)).encode(img)
        monkeypatch.setattr(enc_mod.jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(epk, "_interpret", lambda: True)
        monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
        enc_mod._jitted_encode.cache_clear()
        try:
            pallas = enc_mod.Encoder(cfg).encode(img)
        finally:
            enc_mod._jitted_encode.cache_clear()
            monkeypatch.undo()
        assert pallas == oracle, shape


@pytest.mark.parametrize("shape,sub", [((40, 56), "gray"),
                                       ((40, 56, 3), "444"),
                                       ((40, 56, 3), "422")])
def test_encoder_restart0_virtual_all_modes(shape, sub, monkeypatch):
    """The virtual-split restart=0 path is mode-generic (any block count
    per MCU, including gray's b=1 dummy-pair pad)."""
    import jpegtpu.encoder as enc_mod
    import jpegtpu.kernels.entropy_pack as epk
    from jpegtpu.config import EncoderConfig

    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    cfg = EncoderConfig(quality=80, subsampling=sub, restart_interval=0)
    oracle = enc_mod.Encoder(EncoderConfig(
        quality=80, subsampling=sub, restart_interval=0,
        device_bitpack=False)).encode(img)
    monkeypatch.setattr(enc_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(epk, "_interpret", lambda: True)
    monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
    enc_mod._jitted_encode.cache_clear()
    try:
        pallas = enc_mod.Encoder(cfg).encode(img)
    finally:
        enc_mod._jitted_encode.cache_clear()
    assert pallas == oracle


def test_budget_escalation_virtual_split(monkeypatch):
    """Per-VIRTUAL-segment budget overflow on the restart=0 path must
    trigger the worst-case re-run via the max_mcu_bits sentinel (the
    joined [1] seg_bits can no longer reveal it), with output identical
    to the XLA path."""
    import jpegtpu.encoder as enc_mod
    import jpegtpu.kernels.entropy_pack as epk
    from jpegtpu.config import EncoderConfig

    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (32, 64, 3), dtype=np.uint8)  # 8 MCUs
    xla_bytes = enc_mod.Encoder(EncoderConfig(
        quality=100, subsampling="420", restart_interval=0)).encode(img)

    cfg = EncoderConfig(quality=100, subsampling="420", restart_interval=0,
                        bits_budget=48)  # custom budget forcing overflow
    monkeypatch.setattr(enc_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(epk, "_interpret", lambda: True)
    monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
    enc_mod._jitted_encode.cache_clear()
    try:
        pallas_bytes = enc_mod.Encoder(cfg).encode(img)
    finally:
        enc_mod._jitted_encode.cache_clear()
    assert pallas_bytes == xla_bytes


@pytest.mark.parametrize("g,n_luma", [(6, 4), (4, 2), (3, 1), (2, 2),
                                      (1, 1)])
def test_block_pack_mcu_static_class_bit_identical(g, n_luma):
    """The static-class AC-LUT fast path (n_luma hint: 2 table gathers
    per uniform pair instead of 4) must be bit-identical to the generic
    path for every MCU layout, including the mixed 444 pair and the
    odd-g dummy block."""
    rng = np.random.default_rng(g * 10 + n_luma)
    n_mcu = 24
    coeffs = _random_blocks(rng, n_mcu, g).reshape(-1, 64)
    cls = (np.arange(n_mcu * g, dtype=np.int32) % g >= n_luma) \
        .astype(np.int32)
    dcd = rng.integers(-500, 500, n_mcu * g).astype(np.int32)
    a_w, a_l = ep.block_pack_mcu(jnp.asarray(coeffs), jnp.asarray(cls),
                                 jnp.asarray(dcd), g)
    b_w, b_l = ep.block_pack_mcu(jnp.asarray(coeffs), jnp.asarray(cls),
                                 jnp.asarray(dcd), g, n_luma=n_luma)
    np.testing.assert_array_equal(np.asarray(a_w), np.asarray(b_w))
    np.testing.assert_array_equal(np.asarray(a_l), np.asarray(b_l))


@pytest.mark.parametrize("kb", [1, 2, 3, 4])
def test_compact_stuffed_all_ff_rows(kb):
    """A fully-0xFF segment doubles under stuffing, pushing rows past
    output word 254 — maximal expansion, the worst case for the batched
    kernel's per-iteration flush span."""
    n_seg, frames = 2, 2
    by = np.full((n_seg, frames * 4096), 0xFF, np.uint8)
    rng = np.random.default_rng(11)
    by[1] = rng.integers(0, 256, frames * 4096, dtype=np.uint8)
    seg_bits = np.array([5000 * 8, 300 * 8], np.int32)
    nbytes = (seg_bits + 7) // 8
    b4 = by.reshape(n_seg, -1, 4).astype(np.uint32)
    words = ((b4[..., 0] << 24) | (b4[..., 1] << 16) |
             (b4[..., 2] << 8) | b4[..., 3])
    expected = _stuff_oracle([by[s, :nbytes[s]] for s in range(n_seg)], 4)
    stream, _, total = ep.compact_segments_stuffed(
        jnp.asarray(words), jnp.asarray(seg_bits), frames, 4, k_chunks=kb)
    raw = np.asarray(stream).view(np.uint8)[:int(total)]
    assert int(total) == len(expected)
    assert raw.tobytes() == expected


@pytest.mark.parametrize("seed", range(6))
def test_compact_stuffed_fuzz(seed):
    """Property test over the device stuffing kernel: random segment
    counts/lengths (biased toward 4 KB frame edges), random FF density
    (incl. stretches dense enough to take the conditional third plane),
    and random trailing-marker patterns (the sharded mnum override) —
    byte-equal to the host oracle. Rotates kb over seeds so all three
    chunk-batching variants get fuzzed at constant suite cost."""
    kb = [1, 2, 3][seed % 3]
    rng = np.random.default_rng(1000 + seed)
    n_seg = int(rng.integers(1, 5))
    frames = int(rng.integers(1, 4))
    by = rng.integers(0, 256, (n_seg, frames * 4096), dtype=np.uint8)
    dens = rng.uniform(0, 1, n_seg) ** 3          # mostly light, some heavy
    for s in range(n_seg):
        by[s, rng.random(frames * 4096) < dens[s]] = 0xFF
    # segment byte lengths: half the time land near a frame edge
    nbytes = np.empty(n_seg, np.int64)
    for s in range(n_seg):
        if rng.random() < 0.5:
            nbytes[s] = int(rng.integers(1, frames)) * 4096 \
                + int(rng.integers(-3, 3)) if frames > 1 else \
                int(rng.integers(1, frames * 4096))
        else:
            nbytes[s] = int(rng.integers(1, frames * 4096))
        nbytes[s] = max(1, min(frames * 4096, nbytes[s]))
    seg_bits = (nbytes * 8).astype(np.int32)
    # random marker pattern (0 = none), incl. trailing markers
    mnum = np.where(rng.random(n_seg) < 0.7,
                    0xD0 + rng.integers(0, 8, n_seg), 0).astype(np.int32)
    b4 = by.reshape(n_seg, -1, 4).astype(np.uint32)
    words = ((b4[..., 0] << 24) | (b4[..., 1] << 16) |
             (b4[..., 2] << 8) | b4[..., 3])

    parts = []
    for s in range(n_seg):
        raw = by[s, :nbytes[s]]
        idx = np.flatnonzero(raw == 0xFF)
        parts.append((np.insert(raw, idx + 1, 0) if idx.size else raw)
                     .tobytes())
        if mnum[s]:
            parts.append(bytes((0xFF, int(mnum[s]))))
    expected = b"".join(parts)

    stream, _, total = ep.compact_segments_stuffed(
        jnp.asarray(words), jnp.asarray(seg_bits), frames, 4,
        mnum=jnp.asarray(mnum), k_chunks=kb)
    raw = np.asarray(stream).view(np.uint8)[:int(total)]
    assert int(total) == len(expected), (seed, n_seg, frames,
                                         nbytes.tolist(), mnum.tolist())
    assert raw.tobytes() == expected, (seed, n_seg, frames,
                                       nbytes.tolist(), mnum.tolist())


def test_encoder_dma_pixel_path_end_to_end(monkeypatch):
    """EncoderConfig(pixel_path='dma') routes the Pallas tier through the
    DMA-input pixel kernel; the complete encode must stay byte-identical
    to the XLA oracle encoder (the production-flip precondition)."""
    import jpegtpu.encoder as enc_mod
    import jpegtpu.kernels.entropy_pack as epk
    from jpegtpu.config import EncoderConfig

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    xla_bytes = enc_mod.Encoder(EncoderConfig(
        quality=85, subsampling="420",
        restart_interval="rows")).encode(img)

    cfg = EncoderConfig(quality=85, subsampling="420",
                        restart_interval="rows", pixel_path="dma")
    monkeypatch.setattr(enc_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(epk, "_interpret", lambda: True)
    monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
    enc_mod._jitted_encode.cache_clear()
    try:
        pallas_bytes = enc_mod.Encoder(cfg).encode(img)
    finally:
        enc_mod._jitted_encode.cache_clear()
    assert pallas_bytes == xla_bytes


@pytest.mark.parametrize("sub", [
    "422", "444", "gray",
    # 444s: reference-parity smoothed mode (XLA pixel fallback + the
    # same g=3/gm=4 entropy path as 444 at the 330-bit budget) — HW
    # conformance in scripts/conformance_r5.log
    pytest.param("444s", marks=pytest.mark.deep),
])
def test_encoder_pallas_path_all_subsamplings(sub, monkeypatch):
    """Encoder-level byte parity of the Pallas tier for the non-420 MCU
    layouts — 422 (uniform pairs, static-class fast path), 444 (mixed
    luma/chroma pair, generic fallback + odd-g dummy), 444s (smoothed
    chroma, XLA pixel fallback), gray (g=1) — against the XLA oracle
    encoder, rows-restart."""
    import jpegtpu.encoder as enc_mod
    import jpegtpu.kernels.entropy_pack as epk
    from jpegtpu.config import EncoderConfig

    rng = np.random.default_rng(ord(sub[0]))
    shape = (40, 48) if sub == "gray" else (40, 48, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    cfg = EncoderConfig(quality=80, subsampling=sub,
                        restart_interval="rows")
    xla_bytes = enc_mod.Encoder(cfg).encode(img)

    monkeypatch.setattr(enc_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(epk, "_interpret", lambda: True)
    monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
    enc_mod._jitted_encode.cache_clear()
    try:
        pallas_bytes = enc_mod.Encoder(cfg).encode(img)
    finally:
        enc_mod._jitted_encode.cache_clear()
    assert pallas_bytes == xla_bytes


@pytest.mark.parametrize("sub,shape,want_gm", [
    ("444", (16, 128, 3), 4),    # mx=16, g=3 -> chunk-growing quads
    ("444", (16, 72, 3), 1),     # mx=9: neither 4 nor 2 divides
    ("422", (16, 128, 3), 4),    # mx=8, g=4 -> quads at the round-5
                                 # 248-bit default budget (was pairs
                                 # at 384 — config.first_pass_budget)
    ("gray", (16, 128), 8),      # mx=16, g=1 -> 8 MCUs per unit
    ("420", (32, 128, 3), 1),    # g=6 already fills the budget chunk
])
def test_encoder_mcu_grouping_byte_parity(sub, shape, want_gm, monkeypatch):
    """The small-g MCU grouping (entropy_pack.mcu_group: gm MCUs merge as
    one block_pack unit, 1/gm the seg_merge appends) must (a) activate at
    the expected factor per mode and (b) leave the encoded file
    byte-identical to the XLA oracle encoder."""
    import jpegtpu.encoder as enc_mod
    import jpegtpu.kernels.entropy_pack as epk
    from jpegtpu.config import EncoderConfig

    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    cfg = EncoderConfig(quality=85, subsampling=sub,
                        restart_interval="rows")
    assert enc_mod._entropy_mcu_group(shape[:2], cfg) == want_gm
    xla_bytes = enc_mod.Encoder(cfg).encode(img)

    monkeypatch.setattr(enc_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(epk, "_interpret", lambda: True)
    monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
    enc_mod._jitted_encode.cache_clear()
    try:
        pallas_bytes = enc_mod.Encoder(cfg).encode(img)
    finally:
        enc_mod._jitted_encode.cache_clear()
    assert pallas_bytes == xla_bytes


@pytest.mark.parametrize("packed,rank6", [(True, False), (False, True),
                                          (True, True)])
@pytest.mark.parametrize("seed", [0, 3])
def test_block_pack_place_variants_bit_identical(packed, rank6, seed):
    """Round-4 gather-cut candidates in _place_pair (_BP_PLACE_PACKED:
    one packed-plane ps_at gather; _BP_RANK6: 6-probe rank search +
    count==64 broadcast fix-up) must be bit-identical to the production
    form on dense, sparse, zero and max-magnitude blocks."""
    rng = np.random.default_rng(seed)
    c2 = jnp.asarray(np.concatenate([
        rng.integers(-1023, 1024, (8, 6 * 64), np.int32),
        (rng.random((24, 6 * 64)) < 0.06).astype(np.int32) *
        rng.integers(-2047, 2048, (24, 6 * 64)),
        np.full((4, 6 * 64), -2047, np.int32),
        np.zeros((8, 6 * 64), np.int32)]))
    n = c2.shape[0]
    cls = jnp.asarray((np.arange(n * 6) % 6 >= 4).astype(np.int32))
    dcd = jnp.asarray(rng.integers(-2047, 2048, n * 6, np.int32))
    ref_w, ref_l = ep.block_pack_mcu_pairs(c2, cls, dcd, 6, 1, n_luma=4)
    old = ep._BP_PLACE_PACKED, ep._BP_RANK6
    try:
        ep._BP_PLACE_PACKED, ep._BP_RANK6 = packed, rank6
        w, l = ep.block_pack_mcu_pairs(c2, cls, dcd, 6, 1, n_luma=4)
    finally:
        ep._BP_PLACE_PACKED, ep._BP_RANK6 = old
    assert np.array_equal(np.asarray(w), np.asarray(ref_w))
    assert np.array_equal(np.asarray(l), np.asarray(ref_l))


def test_seg_merge_nat_input_bit_identical():
    """Round-4 candidate: seg_merge reading the NATURAL [n_seg, mps, CW]
    layout (no XLA transpose of the stream tensor) must be bit-identical
    to the transposed-input form."""
    rng = np.random.default_rng(3)
    n_seg, mps, g = 11, 24, 6
    nm = n_seg * mps
    mw = jnp.asarray(rng.integers(0, 1 << 32, (nm, 128),
                                  dtype=np.uint64).astype(np.uint32))
    ml = jnp.asarray(rng.integers(50, 2000, nm).astype(np.int32))
    w_cap = -(-mps * g * 384 // 32)
    ref = ep.seg_merge_mcu(mw, ml, n_seg, mps, w_cap)
    got = ep.seg_merge_mcu(mw, ml, n_seg, mps, w_cap, nat_input=True)
    for a, b in zip(ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("jb", [2, 4])
def test_seg_merge_jb_batching_bit_identical(jb, monkeypatch):
    """jb MCU columns per serial seg_merge iteration (round-4 candidate)
    must be bit-identical to the jb=1 form — streams zero-padded beyond
    their bit length like block_pack emits them."""
    rng = np.random.default_rng(7)
    n_seg, mps, g = 9, 40, 6
    nm = n_seg * mps
    mwn = rng.integers(0, 1 << 32, (nm, 128),
                       dtype=np.uint64).astype(np.uint32).copy()
    ml_np = rng.integers(1, 3600, nm).astype(np.int32)
    for i, ln in enumerate(ml_np):
        wfull = -(-int(ln) // 32)
        mwn[i, wfull:] = 0
        rb = int(ln) % 32
        if rb:
            mwn[i, wfull - 1] &= np.uint32(
                (0xFFFFFFFF << (32 - rb)) & 0xFFFFFFFF)
    mw, ml = jnp.asarray(mwn), jnp.asarray(ml_np)
    w_cap = -(-mps * g * 384 // 32)
    ref = ep.seg_merge_mcu(mw, ml, n_seg, mps, w_cap)
    monkeypatch.setattr(ep, "_SM_JB", jb)
    got = ep.seg_merge_mcu(mw, ml, n_seg, mps, w_cap)
    for a, b in zip(ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_encoder_seg_merge_jb_end_to_end(monkeypatch):
    import jpegtpu.encoder as enc_mod
    import jpegtpu.kernels.entropy_pack as epk
    from jpegtpu.config import EncoderConfig
    from jpegtpu.kernels import fused_dctq

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 128, 3), dtype=np.uint8)
    cfg = EncoderConfig(quality=85, subsampling="420",
                        restart_interval="rows")
    ref = enc_mod.Encoder(cfg).encode(img)
    monkeypatch.setattr(enc_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(epk, "_interpret", lambda: True)
    monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
    monkeypatch.setattr(epk, "_SM_JB", 4)
    enc_mod._jitted_encode.cache_clear()
    try:
        got = enc_mod.Encoder(cfg).encode(img)
    finally:
        enc_mod._jitted_encode.cache_clear()
    assert got == ref


def test_seg_merge_jb_odd_mb_clamp_bit_identical(monkeypatch):
    """Odd mps (mb=45) clamps jb to a non-power divisor (5); output must
    stay bit-identical to jb=1."""
    rng = np.random.default_rng(11)
    n_seg, mps, g = 9, 45, 6
    nm = n_seg * mps
    mwn = rng.integers(0, 1 << 32, (nm, 128),
                       dtype=np.uint64).astype(np.uint32).copy()
    ml_np = rng.integers(1, 3600, nm).astype(np.int32)
    for i, ln in enumerate(ml_np):
        wfull = -(-int(ln) // 32)
        mwn[i, wfull:] = 0
        rb = int(ln) % 32
        if rb:
            mwn[i, wfull - 1] &= np.uint32(
                (0xFFFFFFFF << (32 - rb)) & 0xFFFFFFFF)
    mw, ml = jnp.asarray(mwn), jnp.asarray(ml_np)
    w_cap = -(-mps * g * 384 // 32)
    monkeypatch.setattr(ep, "_SM_JB", 1)
    ref = ep.seg_merge_mcu(mw, ml, n_seg, mps, w_cap)
    monkeypatch.setattr(ep, "_SM_JB", 8)
    got = ep.seg_merge_mcu(mw, ml, n_seg, mps, w_cap)
    for a, b in zip(ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b))
