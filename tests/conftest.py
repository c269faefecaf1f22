"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip SPMD paths are exercised on virtual CPU devices
(xla_force_host_platform_device_count) so the suite runs anywhere; the
driver's dryrun_multichip does the same for the full training step.
"""
import os

# Force CPU. NOTE: a sitecustomize preloads jax._src at interpreter start,
# freezing env-var reads — setting os.environ here is too late. The config
# API still works because backends initialize lazily.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import sys

import numpy as np
import pytest

# persistent XLA compilation cache: repeat suite runs skip the big
# CPU compiles (the dominant cost of the model/meta tests)
import jax  # noqa: E402  (after the platform env vars above)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compilation_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass

REFERENCE_PATH = "/root/reference"


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_PATH)


@pytest.fixture(scope="session")
def reference_path():
    """Path to the reference repo (test oracle only), or skip."""
    if not reference_available():
        pytest.skip("reference repo not mounted")
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    return REFERENCE_PATH
