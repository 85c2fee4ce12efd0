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


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Full-suite runs accumulate hundreds of compiled CPU executables in
    one process; past a point the XLA CPU compiler has been observed to
    segfault mid-compile (reproduced twice at ~60% of the suite, never in
    isolated modules). Dropping compiled programs between modules keeps
    the process lean; modules rarely share shapes, so the recompile cost
    is minimal."""
    yield
    import gc
    jax.clear_caches()
    gc.collect()
