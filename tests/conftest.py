"""Test harness configuration.

Tests run on a CPU backend with 8 virtual devices (SURVEY.md §4 TPU mapping:
single-host multi-device EP tests on a virtual mesh; Pallas kernels run in
interpreter mode off-TPU automatically via utils.interpret_mode()).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS from the environment; force CPU
# here (must happen before the backend is initialized by any computation).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
