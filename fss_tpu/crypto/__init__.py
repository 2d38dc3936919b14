"""fss_crypto-parity API: drop-in for the reference's Python package.

Mirrors reference fss_crypto/__init__.py (exports Dpf, Dcf) with the same
call signatures, tensor shapes/dtypes (int32), string configs, validation
error messages, and key layouts — but computes on TPU via fss_tpu instead
of JIT-compiled CUDA extensions. Tensors may be torch (CPU) or numpy; the
return type matches the input family.
"""

from fss_tpu.crypto.dpf import Dpf
from fss_tpu.crypto.dcf import Dcf

__all__ = ["Dpf", "Dcf"]
