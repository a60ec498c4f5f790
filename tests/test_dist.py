"""Sharded-encode tests on the virtual 8-device CPU mesh (stands in for a
pod slice — SURVEY §4's multi-host test strategy)."""

import jax
import numpy as np
import pytest

from jpegtpu.config import EncoderConfig
from jpegtpu.dist import mesh as mesh_lib
from jpegtpu.dist import shard
from jpegtpu.encoder import Encoder
from jpegtpu.kernels import fused_dctq


@pytest.fixture(scope="module")
def mesh24():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_lib.make_mesh(2, 4)


def test_make_mesh_shapes():
    n = len(jax.devices())
    m = mesh_lib.make_mesh()
    assert m.devices.size == n
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(3, 3)


def test_sharded_encode_matches_single_device(mesh24):
    rng = np.random.default_rng(0)
    cfg = EncoderConfig(quality=75, subsampling="420",
                        restart_interval="rows")
    # batch 4 (2 per data shard), H divides into 4 row-shards of 16
    imgs = rng.integers(0, 256, (4, 64, 48, 3), dtype=np.uint8)
    sharded = shard.encode_batch_sharded(imgs, cfg, mesh24)
    enc = Encoder(cfg)
    singles = [enc.encode(im) for im in imgs]
    assert sharded == singles


def test_sharded_encode_pads_rows(mesh24):
    """Shard-alignment padding must be invisible: byte-identical files to
    the single-device encoder (tail padding segments are dropped)."""
    rng = np.random.default_rng(1)
    cfg = EncoderConfig(quality=90, subsampling="444",
                        restart_interval="rows")
    imgs = rng.integers(0, 256, (2, 30, 24, 3), dtype=np.uint8)  # H=30 pads
    sharded = shard.encode_batch_sharded(imgs, cfg, mesh24)
    enc = Encoder(cfg)
    singles = [enc.encode(im) for im in imgs]
    assert sharded == singles


def test_sharded_pallas_entropy_path(mesh24, monkeypatch):
    """The sharded Pallas entropy path (interpret mode) must produce files
    byte-identical to the single-device encoder."""
    import jpegtpu.kernels.entropy_pack as epk

    rng = np.random.default_rng(9)
    cfg = EncoderConfig(quality=80, subsampling="420",
                        restart_interval="rows")
    imgs = rng.integers(0, 256, (2, 64, 48, 3), dtype=np.uint8)
    singles = [Encoder(cfg).encode(im) for im in imgs]

    monkeypatch.setattr(shard, "_pallas_entropy_ok",
                        lambda cfg_, mps: True)
    monkeypatch.setattr(epk, "_interpret", lambda: True)
    monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
    shard._build_sharded_pallas.cache_clear()
    try:
        sharded = shard.encode_batch_sharded(imgs, cfg, mesh24)
    finally:
        shard._build_sharded_pallas.cache_clear()
    assert sharded == singles


def test_sharded_pallas_row_padding(mesh24, monkeypatch):
    """Row-shard padding segments must be dropped on the Pallas path too."""
    import jpegtpu.kernels.entropy_pack as epk

    rng = np.random.default_rng(10)
    cfg = EncoderConfig(quality=90, subsampling="444",
                        restart_interval="rows")
    imgs = rng.integers(0, 256, (2, 30, 24, 3), dtype=np.uint8)
    singles = [Encoder(cfg).encode(im) for im in imgs]
    monkeypatch.setattr(shard, "_pallas_entropy_ok",
                        lambda cfg_, mps: True)
    monkeypatch.setattr(epk, "_interpret", lambda: True)
    monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
    shard._build_sharded_pallas.cache_clear()
    try:
        sharded = shard.encode_batch_sharded(imgs, cfg, mesh24)
    finally:
        shard._build_sharded_pallas.cache_clear()
    assert sharded == singles


def test_sharded_pallas_marker_cycle_across_shards(mesh24, monkeypatch):
    """Device-side RST splicing: marker numbering (mod-8 cycle) must run
    across row shards — 16 segments over 4 row shards wraps the cycle
    twice, and the true last segment (no marker) sits in the last shard."""
    import jpegtpu.kernels.entropy_pack as epk

    rng = np.random.default_rng(12)
    cfg = EncoderConfig(quality=85, subsampling="420",
                        restart_interval="rows")
    imgs = rng.integers(0, 256, (2, 256, 32, 3), dtype=np.uint8)
    singles = [Encoder(cfg).encode(im) for im in imgs]
    monkeypatch.setattr(shard, "_pallas_entropy_ok",
                        lambda cfg_, mps: True)
    monkeypatch.setattr(epk, "_interpret", lambda: True)
    monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
    shard._build_sharded_pallas.cache_clear()
    try:
        sharded = shard.encode_batch_sharded(imgs, cfg, mesh24)
    finally:
        shard._build_sharded_pallas.cache_clear()
    assert sharded == singles


def test_sharded_pallas_host_stuff_tier(mesh24, monkeypatch):
    """device_stuff=False keeps the host-splice tier on the sharded
    Pallas path (used when a deployment wants raw segment streams)."""
    import jpegtpu.kernels.entropy_pack as epk

    rng = np.random.default_rng(13)
    cfg = EncoderConfig(quality=80, subsampling="420",
                        restart_interval="rows", device_stuff=False)
    imgs = rng.integers(0, 256, (2, 64, 48, 3), dtype=np.uint8)
    singles = [Encoder(cfg).encode(im) for im in imgs]
    monkeypatch.setattr(shard, "_pallas_entropy_ok",
                        lambda cfg_, mps: True)
    monkeypatch.setattr(epk, "_interpret", lambda: True)
    monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
    shard._build_sharded_pallas.cache_clear()
    try:
        sharded = shard.encode_batch_sharded(imgs, cfg, mesh24)
    finally:
        shard._build_sharded_pallas.cache_clear()
    assert sharded == singles


def test_norestart_sharded_dc_exchange(mesh24):
    """restart=0: the DC chain crosses shard boundaries via a ppermute
    exchange over the row axis; host merges shard bitstreams at bit level.
    Output must be byte-identical to the single-device no-restart encode."""
    rng = np.random.default_rng(3)
    cfg = EncoderConfig(quality=75, subsampling="420", restart_interval=0)
    imgs = rng.integers(0, 256, (2, 64, 32, 3), dtype=np.uint8)
    sharded = shard.encode_batch_sharded(imgs, cfg, mesh24)
    enc = Encoder(cfg)
    singles = [enc.encode(im) for im in imgs]
    assert sharded == singles


def test_norestart_sharded_rejects_row_padding(mesh24):
    cfg = EncoderConfig(quality=75, subsampling="420", restart_interval=0)
    imgs = np.zeros((2, 40, 32, 3), np.uint8)   # 40 not divisible by 4*16
    with pytest.raises(ValueError, match="no-restart"):
        shard.encode_batch_sharded(imgs, cfg, mesh24)


def test_sharded_requires_row_aligned_restart(mesh24):
    cfg = EncoderConfig(quality=75, subsampling="420", restart_interval=7)
    imgs = np.zeros((2, 64, 48, 3), np.uint8)
    with pytest.raises(ValueError, match="restart"):
        shard.encode_batch_sharded(imgs, cfg, mesh24)


def test_sharded_pallas_requires_row_aligned_restart(mesh24, monkeypatch):
    """The Pallas branch must reject a non-dividing restart interval too
    (on a real TPU mesh it would otherwise silently undercount segments
    and emit corrupt files)."""
    monkeypatch.setattr(shard, "_pallas_entropy_ok", lambda cfg_, mps: True)
    cfg = EncoderConfig(quality=75, subsampling="420", restart_interval=7)
    imgs = np.zeros((2, 64, 48, 3), np.uint8)  # mx=3, 3 % 7 != 0
    shard._build_sharded_pallas.cache_clear()
    try:
        with pytest.raises(ValueError, match="restart"):
            shard.encode_batch_sharded(imgs, cfg, mesh24)
    finally:
        shard._build_sharded_pallas.cache_clear()


def test_norestart_sharded_pallas_path(mesh24, monkeypatch):
    """The Pallas no-restart shard body (virtual segment merge +
    bit_join, raw unaligned shard streams) must stay byte-identical to
    the single-device no-restart encode."""
    import jpegtpu.kernels.entropy_pack as epk

    rng = np.random.default_rng(6)
    cfg = EncoderConfig(quality=75, subsampling="420", restart_interval=0)
    # 64 rows / 4 row-shards -> 1 MCU row (2 MCUs) per shard: exercises
    # the vseg=1 fallback; 128 rows -> 2 MCU rows (8 MCUs): virtual split
    for h, w in ((64, 32), (128, 64)):
        imgs = rng.integers(0, 256, (2, h, w, 3), dtype=np.uint8)
        singles = [Encoder(cfg).encode(im) for im in imgs]
        monkeypatch.setattr(shard, "_pallas_entropy_ok",
                            lambda cfg_, mps: True)
        monkeypatch.setattr(epk, "_interpret", lambda: True)
        monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
        shard._build_sharded_norestart.cache_clear()
        try:
            sharded = shard.encode_batch_sharded(imgs, cfg, mesh24)
        finally:
            shard._build_sharded_norestart.cache_clear()
            monkeypatch.undo()
        assert sharded == singles, (h, w)


def test_sharded_budget_escalation(mesh24, monkeypatch):
    """A custom non-default bits_budget small enough to overflow must
    escalate on the SHARDED path with the custom value threaded into the
    overflow check (not DEFAULT_BITS_BUDGET) and produce byte-identical
    output (VERDICT r3 weak #5). Covers both device_stuff tiers."""
    import jpegtpu.encoder as enc_mod
    import jpegtpu.kernels.entropy_pack as epk

    rng = np.random.default_rng(13)
    imgs = rng.integers(0, 256, (2, 64, 48, 3), dtype=np.uint8)

    for device_stuff in (True, False):
        base = EncoderConfig(quality=100, subsampling="420",
                             restart_interval="rows",
                             device_stuff=device_stuff)
        singles = [Encoder(base).encode(im) for im in imgs]

        cfg = EncoderConfig(quality=100, subsampling="420",
                            restart_interval="rows",
                            device_stuff=device_stuff, bits_budget=48)
        seen = []
        real_overflow = enc_mod._budget_overflow

        def spy(seg_bits_np, max_mcu_bits, cap_bits, blocks_per_mcu,
                bits_budget):
            seen.append(bits_budget)
            return real_overflow(seg_bits_np, max_mcu_bits, cap_bits,
                                 blocks_per_mcu, bits_budget)

        monkeypatch.setattr(shard, "_pallas_entropy_ok",
                            lambda cfg_, mps: True)
        monkeypatch.setattr(epk, "_interpret", lambda: True)
        monkeypatch.setattr(fused_dctq, "_interpret", lambda: True)
        monkeypatch.setattr(enc_mod, "_budget_overflow", spy)
        shard._build_sharded_pallas.cache_clear()
        try:
            sharded = shard.encode_batch_sharded(imgs, cfg, mesh24)
        finally:
            shard._build_sharded_pallas.cache_clear()
            monkeypatch.undo()
        assert sharded == singles, device_stuff
        # the first-pass budget (the custom 48, NOT the default) reached
        # the overflow check exactly once
        assert seen == [48], (device_stuff, seen)
