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


def test_mode_aware_first_pass_budget():
    """Round-5: reduced first-pass budgets make larger MCU groups
    chunk-free (HW A/Bs scripts/ab_budget444.log, ab_budget_all*.log);
    420 keeps 384 (neutral, measured); quality >= 97 disables the
    reduction (escalation headroom); explicit bits_budget always wins."""
    assert EncoderConfig(subsampling="444").first_pass_budget == 330
    assert EncoderConfig(subsampling="444s").first_pass_budget == 330
    assert EncoderConfig(subsampling="422").first_pass_budget == 248
    assert EncoderConfig(subsampling="gray").first_pass_budget == 384
    assert EncoderConfig(subsampling="420").first_pass_budget == 384
    assert EncoderConfig(subsampling="444",
                         quality=97).first_pass_budget == 384
    assert EncoderConfig(subsampling="422",
                         quality=100).first_pass_budget == 384
    assert EncoderConfig(subsampling="444",
                         bits_budget=384).first_pass_budget == 384


def test_444_default_budget_single_chunk():
    """The point of the 330 default: one stream chunk per gm=4 unit."""
    from jpegtpu.kernels.entropy_pack import mcu_capacity
    assert mcu_capacity(12, 330)[0] == 1
    assert mcu_capacity(12, 384)[0] == 2


def test_mcu_group_vmem_feasibility_cap():
    """Round-5 HW finding (scripts/check_escalation.log): tiny user
    budgets made huge groups look chunk-free — budget=48 at 420 picked
    gm=8 (g_eff=48), whose block_pack scoped-VMEM stack (33 MB) fails
    Mosaic compilation on real hardware while interpret mode passes.
    The grouping rule caps the unit at 16 blocks."""
    from jpegtpu.kernels.entropy_pack import mcu_group
    for g in (1, 2, 3, 4, 6):
        for budget in (48, 64, 128, 248, 330, 384):
            gm = mcu_group(g, budget, 240)
            assert g * gm <= 16, (g, budget, gm)
    # the pathological case from the HW failure: 420 at budget 48
    assert mcu_group(6, 48, 240) * 6 <= 16
