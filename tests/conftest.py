"""
Test configuration: force CPU with 8 virtual devices so multi-chip sharding
tests run without TPU hardware.

Note: this image's sitecustomize registers the remote-TPU ("axon") backend
at interpreter start, so setting JAX_PLATFORMS via os.environ in conftest is
too late — we must override through jax.config before any backend init.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# exact f32 matmuls for golden-output parity with the torch reference
# (the default allows reduced-precision matmul even on CPU)
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8, f"expected 8 virtual cpu devices, got {jax.devices()}"
