"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware. Must run before jax is imported."""
import os

# NOTE: the axon TPU plugin ignores JAX_PLATFORMS; JAX_PLATFORM_NAME works.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("ADAPTPOINT_TPU_KERNELS", "xla")

# Plugins may have imported jax before this conftest ran, in which case the
# env vars above were read too late — force the platform programmatically too.
import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
