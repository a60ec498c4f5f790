"""Test harness config: force CPU JAX with 8 virtual devices so mesh/sharding
tests run anywhere (SURVEY §4: multi-host tests stand in for pods via
xla_force_host_platform_device_count)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The env-var routes above are ignored by this jax build (axon plugin); the
# config API is authoritative. Must run before the backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import re  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Deep test tier (VERDICT r4 #9): the slowest interpret-mode
# parametrizations — negative-result kernel variants, fuzz seeds beyond
# the first, and redundant kb/gm/shape combinations — run only when
# explicitly requested (nightly / round gates / `-m deep`), keeping the
# default PR loop under ~10 min at -n 4 while every kernel-parity CLASS
# keeps at least one default-tier representative. Patterns are nodeid
# fnmatch globs, chosen from the measured durations of the full round-5
# suite run (310 tests, slowest-60 table, /tmp/suite_r5a.log).
_DEEP_PATTERNS = [
    # tested-negative / non-production kernel variants (flags default off)
    "*test_encoder_fused_bp_end_to_end",
    "*test_encoder_dma_pixel_path_end_to_end",
    "*test_seg_merge_mcu_s_rows_64",
    # fused_pipeline ladder: keep one representative (422 geometry)
    "*test_fused_pipeline_matches_split[420*",
    "*test_fused_pipeline_matches_split[444*",
    # fuzz beyond the first seed
    "*test_grouped_compact_fuzz[1]",
    "*test_grouped_compact_fuzz[2]",
    "*test_grouped_compact_fuzz[3]",
    "*test_compact_stuffed_fuzz[3]",
    "*test_compact_stuffed_fuzz[4]",
    # adversarial compact vectors: keep the 4K-geometry and max-burst
    # cases; the rest of the (n_seg, gs, kb) grid is deep
    "*test_grouped_compact_byte_parity[8-2-2*",
    "*test_grouped_compact_byte_parity[9-3-8*",
    "*test_grouped_compact_byte_parity[16-4-4*",
    "*test_grouped_compact_byte_parity[5-2-8*",
    # frame-edge drain regressions: kb=3 (production) stays default-tier
    "*test_compact_stuffed_trailing_marker_frame_edge[*-1]",
    "*test_compact_stuffed_trailing_marker_frame_edge[*-2]",
    "*test_compact_stuffed_trailing_marker_frame_edge[*-4]",
    # oracle parity: the second fuzz seed of the kb grid
    "*test_compact_stuffed_matches_oracle[1-*",
    # mcu-major geometry grid: keep the smallest
    "*test_seg_merge_mcu_mcu_major[3-16]",
    "*test_seg_merge_mcu_mcu_major[9-24]",
    # per-mode gm parity: keep the production 444 gm=4 + gray gm=8 cases
    "*test_encoder_mcu_grouping_byte_parity[422*",
    "*test_encoder_mcu_grouping_byte_parity[444-shape1*",
    "*test_encoder_mcu_grouping_byte_parity[420*",
    # multihost: the 4-process variant (2-process + pallas stay default)
    "*test_multihost_matches_single[4]",
]


def _glob_re(pat):
    # literal glob: only '*' is a wildcard ('[' / ']' appear verbatim in
    # pytest parametrize ids, so fnmatch's character classes misfire)
    return re.compile(
        "^" + ".*".join(re.escape(p) for p in pat.split("*")) + "$")


_DEEP_RES = [_glob_re(p) for p in _DEEP_PATTERNS]


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(r.match(item.nodeid) for r in _DEEP_RES):
            item.add_marker(pytest.mark.deep)


@pytest.fixture(scope="session")
def fruit():
    """The reference's benchmark image (253x254 P6; exercises padding on
    every run, like the reference — SURVEY §2.4)."""
    from jpegtpu.io import ppm
    path = "/root/reference/data/fruit.ppm"
    if not os.path.exists(path):
        pytest.skip("reference fruit.ppm not available")
    return ppm.read_pnm(path)


@pytest.fixture(scope="session")
def smooth_img():
    """Deterministic synthetic image with smooth structure (JPEG-friendly)."""
    h, w = 120, 200
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 128 + 90 * np.sin(xx / 17) * np.cos(yy / 23)
    g = 128 + 80 * np.cos(xx / 29 + 1) * np.sin(yy / 13)
    b = 128 + 70 * np.sin((xx + yy) / 19)
    return np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)
