"""Test config: force the CPU backend with 8 virtual devices so sharding /
collective tests run without a TPU pod (SURVEY.md §4 implication).

Note: this environment preloads jax and registers the axon TPU plugin via
sitecustomize in every Python process, so env-var overrides are too late —
``jax.config.update`` after import is the reliable switch (and avoids test
processes contending for the single TPU chip).
"""

import os

# Must be set before the CPU client initializes (first backend use).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
# Persistent compile cache: amortizes XLA compilation across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402  (already preloaded by sitecustomize)

jax.config.update("jax_platforms", "cpu")
# The default matmul precision on this backend is bf16-class; tests compare
# against float64 NumPy oracles, so force true float32 matmuls.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
