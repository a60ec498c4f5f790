"""The kernels/ package facades: entropy_pack re-exports the oracle merge
generations (entropy_oracles) and the compaction tier (compact) via PEP
562 so round-3-era call sites keep working after the round-4 split."""

import pytest


def test_entropy_pack_reexports_compact():
    from jpegtpu.kernels import compact as cp
    from jpegtpu.kernels import entropy_pack as ep

    assert ep.compact_segments is cp.compact_segments
    assert ep.compact_segments_stuffed is cp.compact_segments_stuffed
    # flag READS forward to the live value in compact (mutations must go
    # to compact directly — documented in entropy_pack.__getattr__)
    old = cp._COMPACT_KB
    try:
        cp._COMPACT_KB = old + 1
        assert ep._COMPACT_KB == old + 1
    finally:
        cp._COMPACT_KB = old
    assert ep._COMPACT_ATTR_MODE is cp._COMPACT_ATTR_MODE


def test_entropy_pack_reexports_oracles():
    from jpegtpu.kernels import entropy_oracles as eo
    from jpegtpu.kernels import entropy_pack as ep

    assert ep.mcu_merge is eo.mcu_merge
    assert ep.seg_merge_v2 is eo.seg_merge_v2


def test_entropy_pack_unknown_attr_raises():
    from jpegtpu.kernels import entropy_pack as ep

    with pytest.raises(AttributeError):
        ep.no_such_symbol


def test_compact_interpret_follows_facade_monkeypatch(monkeypatch):
    # compact._interpret resolves through entropy_pack at call time so
    # tests that monkeypatch the facade govern the compaction kernels too
    from jpegtpu.kernels import compact as cp
    from jpegtpu.kernels import entropy_pack as ep

    monkeypatch.setattr(ep, "_interpret", lambda: "sentinel")
    assert cp._interpret() == "sentinel"
