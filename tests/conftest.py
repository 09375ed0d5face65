"""Test environment: virtual 8-device CPU mesh (no TPU needed in CI).

The harness may pin JAX_PLATFORMS to a TPU plugin; tests must run on CPU with
8 virtual devices to exercise the multi-chip sharding path, so we override
both the env var and the jax config before anything imports jax.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# keep float32 matmuls exact on CPU for golden-value comparisons
jax.config.update("jax_default_matmul_precision", "highest")
# persistent cache, CPU-only namespace (never /tmp/jax_cache: axon-attached
# processes park remotely-compiled CPU AOT entries there that abort on this
# host) — repeated suite runs skip recompilation
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end tests (CLI subprocesses)")
