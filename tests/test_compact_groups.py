"""Grouped compaction chains (kernels/compact._compact_stuff_kernel_gkb,
EncoderConfig.compact_groups): byte parity against the single-chain
kernel on adversarial vectors, fuzz, and the full encoder path."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from jpegtpu.kernels import compact as cp


def _mk_case(rng, n_seg, f, density=0.5, ff_burst=False):
    words = rng.integers(0, 1 << 32, (n_seg, f * 1024),
                         dtype=np.uint64).astype(np.uint32)
    if ff_burst:
        words[:, :256] = 0xFFFFFFFF                # stuffing stress
    maxbits = f * 1024 * 32 - 2048
    bits = rng.integers(1, int(maxbits * density) + 2, n_seg) \
        .astype(np.int32)
    return jnp.asarray(words), jnp.asarray(bits)


def _assert_grouped_matches(words, bits, f, restart, gs, kb):
    ref_stream, ref_img, ref_total = cp.compact_segments_stuffed(
        words, bits, f, restart, k_chunks=min(kb, 3))
    ref_total = int(ref_total)
    ref = np.asarray(ref_stream).view(np.uint8)[:ref_total].tobytes()
    st2, glens, img2, tot2 = cp.compact_segments_stuffed_grouped(
        words, bits, f, restart, gs, k_chunks=kb)
    assert int(tot2) == ref_total
    glens = np.asarray(glens)
    assert int(glens.sum()) == ref_total
    got = b"".join(
        np.asarray(st2[g]).view(np.uint8)[:glens[g]].tobytes()
        for g in range(gs))
    assert got == ref
    assert np.array_equal(np.asarray(img2), np.asarray(ref_img))


@pytest.mark.parametrize("n_seg,f,gs,kb,restart,density,burst", [
    (8, 2, 2, 3, 240, 0.5, False),
    (8, 2, 4, 3, 240, 0.9, True),        # near-full segments + FF bursts
    (135, 2, 8, 3, 240, 0.3, False),     # the 4K rows-restart seg count
    (9, 3, 8, 2, 240, 0.7, False),       # ragged: 3 of 8 groups empty
    (5, 2, 8, 3, 0, 0.6, False),         # gs > n_seg, no restart markers
    (16, 4, 4, 1, 240, 0.4, True),
])
def test_grouped_compact_byte_parity(n_seg, f, gs, kb, restart, density,
                                     burst):
    rng = np.random.default_rng(n_seg * 31 + gs)
    words, bits = _mk_case(rng, n_seg, f, density, burst)
    _assert_grouped_matches(words, bits, f, restart, gs, kb)


@pytest.mark.parametrize("mm", [False, True])
def test_compact_mm_place_byte_parity(mm, monkeypatch):
    """The MXU one-hot placement (_COMPACT_MM_PLACE) must byte-match the
    chained-OR fold in both stuffing kernels, including stuffing bursts
    and ragged groups (round-5; HW-gated by scripts/tpu_ab_compact_mm)."""
    monkeypatch.setattr(cp, "_COMPACT_MM_PLACE", mm)
    rng = np.random.default_rng(77)
    words, bits = _mk_case(rng, 9, 2, 0.8, True)
    ref_stream, _, ref_total = cp.compact_segments_stuffed(
        words, bits, 2, 240, k_chunks=3)
    ref = np.asarray(ref_stream).view(np.uint8)[:int(ref_total)].tobytes()
    monkeypatch.setattr(cp, "_COMPACT_MM_PLACE", not mm)
    alt_stream, _, alt_total = cp.compact_segments_stuffed(
        words, bits, 2, 240, k_chunks=3)
    alt = np.asarray(alt_stream).view(np.uint8)[:int(alt_total)].tobytes()
    assert alt == ref
    monkeypatch.setattr(cp, "_COMPACT_MM_PLACE", mm)
    _assert_grouped_matches(words, bits, 2, 240, 4, 3)


@pytest.mark.parametrize("seed", range(4))
def test_grouped_compact_fuzz(seed):
    rng = np.random.default_rng(1000 + seed)
    n_seg = int(rng.integers(2, 40))
    f = int(rng.integers(1, 4))
    gs = int(rng.integers(2, 10))
    words, bits = _mk_case(rng, n_seg, f,
                           density=float(rng.uniform(0.05, 0.98)),
                           ff_burst=bool(rng.integers(0, 2)))
    _assert_grouped_matches(words, bits, f, 240, gs, 3)


def test_grouped_compact_frame_edge_drain():
    # the round-3 drain bug class: segment ends at all three 4 KB-edge
    # residues (4094/4095/4096) with a trailing marker
    rng = np.random.default_rng(5)
    n_seg, f = 6, 2
    words = rng.integers(0, 1 << 32, (n_seg, f * 1024),
                         dtype=np.uint64).astype(np.uint32)
    words[:] &= 0x7F7F7F7F                          # no stuffing noise
    bits = jnp.asarray(np.array([res * 8 - 16 for res in
                                 (4094, 4095, 4096, 4093, 4092, 4091)],
                                np.int32))
    _assert_grouped_matches(jnp.asarray(words), bits, f, 240, 3, 3)


def test_encoder_compact_groups_end_to_end(monkeypatch):
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
    enc_mod._jitted_encode.cache_clear()
    try:
        for gs in (1, 2, 8):
            cfg_g = dataclasses.replace(cfg, compact_groups=gs)
            got = enc_mod.Encoder(cfg_g).encode(img)
            assert got == ref, f"compact_groups={gs} bytes differ"
    finally:
        enc_mod._jitted_encode.cache_clear()


@pytest.mark.parametrize("gs", [
    2,
    pytest.param(3, marks=pytest.mark.deep),
    pytest.param(6, marks=pytest.mark.deep),
    pytest.param(8, marks=pytest.mark.deep),  # -> largest divisor of 6 is 6
])
def test_encode_batch_fused_compact_groups(monkeypatch, gs):
    """The grouped-chain batch path (groups of whole images) must produce
    byte-identical files to the per-image path for every gs | bsz,
    including gs < requested (bsz % compact_groups != 0 falls back to
    the largest divisor)."""
    import jpegtpu.encoder as enc_mod
    import jpegtpu.kernels.entropy_pack as epk
    from jpegtpu.config import EncoderConfig
    from jpegtpu.kernels import fused_dctq

    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 256, (6, 24, 16, 3), dtype=np.uint8)
    cfg = EncoderConfig(quality=80, subsampling="420",
                        restart_interval="rows")
    singles = [enc_mod.Encoder(cfg).encode(im) for im in imgs]

    monkeypatch.setattr(enc_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(epk, "_interpret", lambda: True)
    monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
    enc_mod._jitted_encode.cache_clear()
    enc_mod._jitted_encode_batch.cache_clear()
    try:
        cfg_g = dataclasses.replace(cfg, compact_groups=gs)
        batched = enc_mod._encode_batch_fused(imgs, cfg_g)
        assert batched == singles, f"compact_groups={gs}"
    finally:
        enc_mod._jitted_encode.cache_clear()
        enc_mod._jitted_encode_batch.cache_clear()
