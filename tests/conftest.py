"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware. Must run before jax is imported.

TPU tier: ``ADAPTPOINT_TPU_TESTS=1 python -m pytest -m tpu`` skips the CPU
pinning so the @pytest.mark.tpu kernel-golden tests (tests/test_tpu_kernels
.py) run against the real chip."""
import os

_TPU_TIER = os.environ.get("ADAPTPOINT_TPU_TESTS", "") == "1"

if not _TPU_TIER:
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

if not _TPU_TIER:
    jax.config.update("jax_platform_name", "cpu")
    # persistent compile cache: XLA:CPU compilation dominates the fast
    # tier's wall time (5-17s per big-model test on a 1-vCPU box); warm
    # reruns skip it entirely
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
