"""Test configuration: run everything on a virtual 8-device CPU mesh.

SURVEY.md §4: multi-host behavior is tested with
``xla_force_host_platform_device_count`` fake-device meshes — the standard
JAX substitute for multi-node testing without a cluster.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var JAX_PLATFORMS is not honored when the axon TPU plugin is
# present; the config route is.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
