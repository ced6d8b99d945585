"""Test configuration: run everything on an 8-device virtual CPU mesh.

Must set flags before jax initializes a backend — hence module level, and
conftest is imported before any test module.
"""

import os

# force, not setdefault: the rig's outer env pins JAX_PLATFORMS=axon
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# persistent compilation cache: repeated test runs skip recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# the axon sitecustomize force-registers the tunneled TPU backend and
# overrides JAX_PLATFORMS from the env; this config update wins
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
