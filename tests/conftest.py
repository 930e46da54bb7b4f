"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Note: this environment's site hook force-registers a tunneled TPU plugin and
overrides ``jax_platforms`` at interpreter start (ignoring JAX_PLATFORMS), so
the CPU override must be applied via jax.config *after* import. Multi-chip
sharding paths are validated on the virtual CPU devices; benchmarks run on
the real TPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("F4L_PLATFORM", "cpu")

import jax  # noqa: E402

from fusion4landslide_tpu.utils.platform import apply_platform_from_env  # noqa: E402

apply_platform_from_env()
assert jax.devices()[0].platform == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
