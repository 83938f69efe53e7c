"""Test configuration: run all tests on a virtual 8-device CPU platform.

Multi-device sharding tests (SURVEY.md §4 item 4) use XLA host-device
simulation so the partitioned aggregation path is testable without a pod.

Note: on this machine the ``JAX_PLATFORMS`` *env var* deadlocks against the
axon TPU plugin when combined with ``--xla_force_host_platform_device_count``;
``jax.config.update('jax_platforms', 'cpu')`` does not, so we use that.
Env vars must be set before jax initializes a backend.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: driver/e2e tests taking minutes; deselect with -m 'not slow'",
    )
    config.addinivalue_line(
        "markers",
        "tpu: compiled-on-TPU checks (subprocess); auto-skip without a TPU",
    )
    config.addinivalue_line(
        "markers",
        "smoke: the representative subset of the slow driver tier — all "
        "four drivers, mesh, resume, and the scan-loop equivalences — "
        "sized to finish inside a reviewer's 10-minute budget "
        "(tier table in NOTES.md round-5)",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
