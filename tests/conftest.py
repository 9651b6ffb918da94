"""Test env: force CPU with an 8-device virtual mesh so sharding tests run
anywhere (the standard JAX pattern for testing multi-chip code without a
real cluster). Must run before any jax BACKEND is created."""

import os
import sys

# Force CPU even if the ambient environment points JAX at a TPU platform
# (the test suite must run hermetically and fast; sharding tests use the
# virtual 8-device CPU mesh).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some environments preimport jax via sitecustomize (with JAX_PLATFORMS
# pointing at a TPU plugin) before this file runs — then the env var
# above is read too late. The config update works as long as no backend
# has been initialized yet, which is the case at collection time.
if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy interpret-mode Pallas / oracle tests"
    )
    config.addinivalue_line(
        "markers", "quick: fast default CI loop (auto-added when not slow)"
    )


def pytest_collection_modifyitems(config, items):
    """Everything not marked slow is quick: `pytest -m quick` is the
    <90 s default loop, the full suite stays the release gate."""
    import pytest
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)
