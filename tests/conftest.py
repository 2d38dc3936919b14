"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's CI strategy (host-path-only gtest runs,
.github/workflows/ci.yaml:16-32): the same code paths that run on TPU are
exercised on the CPU backend, plus multi-device sharding via
xla_force_host_platform_device_count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np
import pytest

# Force the CPU backend even when a TPU plugin overrides jax_platforms at
# interpreter startup (the axon tunnel plugin does). This makes tests compile
# with real XLA:CPU — keep crypto kernels ROLLED (fori_loop rounds): XLA:CPU
# compile time on long straight-line scalar-u32 chains is pathological
# (>500s for an unrolled BLAKE3 that compiles in <1s rolled).
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: XLA:CPU compiles of the unrolled crypto kernels
# are expensive on small hosts; cache them across test runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)
