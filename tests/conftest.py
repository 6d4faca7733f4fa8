"""Test configuration: run on a virtual 8-device CPU mesh with x64.

Mirrors the reference's CI strategy of exercising the full multi-rank
stack on one box (``mpiexec -n 2``, reference runtests.sh:3-5): here the
stand-in is 8 XLA host-platform devices, used by the sharding tests.

Must set env vars before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize hook force-selects the TPU backend via
# jax.config (overriding JAX_PLATFORMS), so override it back here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Reset JAX's compiled-executable caches after each test module.

    The XLA CPU JIT segfaulted twice compiling a late-module program
    after ~250 accumulated compilations in one pytest process (same
    crash site, passes in isolation) -- bounding the per-process
    compiler state avoids that and the monotonically growing cache
    memory.  Cross-module recompiles cost a few minutes over the whole
    suite."""
    yield
    jax.clear_caches()
