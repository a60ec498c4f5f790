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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


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
