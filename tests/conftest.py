"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax loads,
so sharding paths are exercised without TPU hardware (SURVEY.md §5: multi
host test strategy)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compile cache: kernel tests re-run in seconds instead of
# minutes.  The dir is EXCLUSIVE to this suite configuration (8 virtual
# CPU devices): XLA:CPU AOT cache entries embed machine-feature options
# that are NOT part of jax's cache key, and loading an entry written
# under a different process configuration SIGSEGVs/SIGILLs the
# deserializer (observed 2026-08-19; see
# utils/dispatch.py::ensure_compile_cache).  Never point other runs here.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_cpu8")
# the XLA per-fusion autotune cache rides along when a cache dir is set
# and segfaulted XLA:CPU compiles late in cold full-suite runs
# (backend_compile_and_load, observed 3x on 2026-08-19); executable
# caching alone is what we want
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "none")

# Force the CPU backend regardless of ambient JAX_PLATFORMS.  This box
# pre-imports jax in sitecustomize (registering a TPU platform), so env
# edits are too late -- but backends initialize lazily, so flipping the
# config before the first device access still works.  Set CIRI_TEST_TPU=1
# to run the suite against real hardware instead.
if not os.environ.get("CIRI_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

import zlib

import numpy as np
import pytest


@pytest.fixture
def rng(request):
    """Per-test deterministic RNG: seeded from the test's nodeid so data is
    reproducible AND independent of execution order (a shared session rng
    made marginal tests flap when the suite composition changed)."""
    seed = zlib.crc32(request.node.nodeid.encode()) ^ 20260816
    return np.random.default_rng(seed)


@pytest.fixture(scope="module")
def module_rng(request):
    seed = zlib.crc32(request.node.module.__name__.encode()) ^ 20260816
    return np.random.default_rng(seed)
