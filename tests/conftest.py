"""Test harness config.

Tests run on CPU with 8 virtual devices so mesh/shard_map paths are
exercised without TPU hardware (SURVEY.md section 4, "distributed tests
without a cluster"). Must be set before jax import.
"""

import os

# force CPU: the environment presets JAX_PLATFORMS=axon (the real TPU
# tunnel), but tests must run on the virtual 8-device CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# belt-and-braces: a pytest plugin may import jax before this conftest
# runs, in which case the env var above was read too late
jax.config.update("jax_platforms", "cpu")

# this JAX build's default matmul precision resolves to bf16-like even on
# CPU; parity tests need real float32 (model forward pins it internally,
# but tests also call ops directly)
jax.config.update("jax_default_matmul_precision", "float32")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running fixtures (multi-process mesh, e2e)"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
