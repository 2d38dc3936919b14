"""fss_tpu: a TPU-native function-secret-sharing framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference CUDA/C++ library (myl7/fss): DPF, DCF, Half-Tree DPF, Grotto DCF,
VDPF, VDMPF, the ChaCha / AES-128-MMO PRGs, SHA-256 / BLAKE3 hashes, the
AES-Feistel small-domain PRP and Cuckoo hashing — all batched-first and
shardable over TPU meshes.
"""

import os as _os

import jax as _jax

# Persistent XLA compile cache, mirroring the reference's per-parameter-set
# JIT cache design (fss_crypto/_jit.py:198-253 caches generated extensions
# under ~/.cache/fss_crypto). OPT-IN via FSS_TPU_COMPILE_CACHE=<dir>: on
# hosts where compiles are served by a remote compile service (TPU
# tunnels), cached CPU executables can carry the *remote* machine's CPU
# features and SIGILL when loaded locally — so nothing is cached unless
# the user asks. Never overrides a cache dir configured elsewhere.
_cache_dir = _os.environ.get("FSS_TPU_COMPILE_CACHE")
if _cache_dir and _jax.config.jax_compilation_cache_dir is None:
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except (OSError, AttributeError):
        pass

from fss_tpu import block, groups


def __getattr__(name):
    # Lazy convenience exports: fss_tpu.Dpf is fss_tpu.api.Dpf etc.
    if name in ("Dpf", "Dcf", "GrottoDcf", "HalfTreeDpf", "Vdpf", "Vdmpf"):
        from fss_tpu import api
        return getattr(api, name)
    raise AttributeError(f"module 'fss_tpu' has no attribute {name!r}")


__all__ = ["block", "groups", "Dpf", "Dcf", "GrottoDcf", "HalfTreeDpf",
           "Vdpf", "Vdmpf"]
__version__ = "0.1.0"
