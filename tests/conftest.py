"""Test config: all tests run on a virtual 8-device CPU mesh
(SURVEY.md §4 item 4 — distributed-without-cluster).

Note: this environment pre-imports jax and pins JAX_PLATFORMS to the
remote-TPU plugin via sitecustomize, so we must override through
jax.config *after* import — env vars alone are too late/ignored.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
