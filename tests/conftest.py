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

# Persistent compile cache across test runs (warm runs are ~3x faster).
# The loud cpu_aot_loader "machine feature" warnings it triggers concern
# only XLA's prefer-no-scatter/gather tuning pseudo-features — benign.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# The full suite compiles hundreds of XLA:CPU executables in one process;
# each adds tens of memory mappings and the process crosses the default
# vm.max_map_count (65530) near the end, at which point LLVM's JIT
# segfaults on a failed mmap. Raise the limit when we can (root VMs).
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        if int(_f.read()) < 262144:
            with open("/proc/sys/vm/max_map_count", "w") as _g:
                _g.write("1048576")
except (OSError, ValueError):
    pass


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)
