"""Test configuration: force an 8-device virtual CPU mesh.

Must run before any jax import (SURVEY.md §4: fake-backend strategy for
mesh-sharding tests).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env ships JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU plugin and resets
# jax_platforms to "axon,cpu" — override it after import, before any backend
# is initialized, so tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
# Single-core CI: persist compiled executables across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The full 384-test suite accumulates hundreds of live XLA:CPU executables
    in one process; past ~350 tests the next compile segfaults inside
    backend_compile_and_load (reproduced twice at the same test, while every
    half-suite subset passes — a cumulative JIT-code-memory threshold, not a
    specific test). Dropping the in-memory caches at module boundaries stays
    well below the threshold; the persistent disk cache (above) makes the
    cross-module reloads cheap.
    """
    yield
    import gc

    jax.clear_caches()
    gc.collect()
