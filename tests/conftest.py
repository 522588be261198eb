"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices (no TPU pod needed);
the driver's `dryrun_multichip` does the same. These env vars must be set
before jax initializes its backends, hence module scope in conftest.
"""

import os

# Force-set (not setdefault): the host environment pre-sets JAX_PLATFORMS to
# the TPU plugin, which would silently run "CPU" tests on the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: integration tests (full SLAM drives, multichip end-to-end); "
        "run the fast unit/oracle tier with `pytest -m 'not slow'` (<2 min)",
    )
