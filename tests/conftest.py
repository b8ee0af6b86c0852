"""Test config: force CPU with 8 virtual devices so multi-chip sharding tests
run without TPU hardware (SURVEY.md §4 implication; the driver separately
dry-runs the multichip path)."""
import os

# The harness pins JAX_PLATFORMS=axon (the real TPU tunnel); a site hook
# re-forces it, so plain env vars are not enough — set the config directly.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# the axon sitecustomize imports jax at interpreter startup, before the env
# vars above exist — set the persistent-cache config directly so CPU test
# compiles actually cache across runs
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# Make float32 matmuls actually float32 in tests (TPU/axon would otherwise
# run single-pass bf16 and break oracle comparisons).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
