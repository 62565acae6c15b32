"""
Test configuration: force CPU with 8 virtual devices so multi-chip sharding
tests run without TPU hardware. Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import pytest  # noqa: E402
import jax  # noqa: E402

# exact f32 matmuls for golden-output parity with the torch reference
# (the default allows reduced-precision matmul even on CPU)
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
