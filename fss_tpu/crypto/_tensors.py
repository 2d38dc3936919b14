"""Tensor interop for the fss_crypto-parity API.

The reference exchanges int32 torch tensors (fss_crypto/dpf.py:43-109);
internally fss_tpu works on uint32 jnp arrays. Conversions are pure
bitcasts. Outputs are returned in the caller's tensor family (torch in ->
torch out, numpy otherwise).

PRG key material parity: the reference uses a process-global random nonce
(fss_crypto/_csrc/binding_common.cuh:13-24), so keys generated in one
process only evaluate correctly in that process unless the nonce is pinned.
Here the same contract holds via ``process_nonce()`` /
``process_aes_keys()``; pin with env FSS_TPU_NONCE="lo,hi" /
FSS_TPU_AES_KEYS=<hex128 x mul, comma-separated> for cross-process interop.
"""

from __future__ import annotations

import os
import secrets

import numpy as np

_NONCE = None
_AES_KEYS = {}


def process_nonce() -> tuple:
    global _NONCE
    if _NONCE is None:
        env = os.environ.get("FSS_TPU_NONCE")
        if env:
            lo, hi = (int(v, 0) & 0xFFFFFFFF for v in env.split(","))
            _NONCE = (lo, hi)
        else:
            _NONCE = (secrets.randbits(32), secrets.randbits(32))
    return _NONCE


def process_aes_keys(mul: int) -> tuple:
    if mul not in _AES_KEYS:
        env = os.environ.get("FSS_TPU_AES_KEYS")
        if env:
            keys = tuple(bytes.fromhex(k) for k in env.split(","))[:mul]
            assert len(keys) == mul and all(len(k) == 16 for k in keys)
        else:
            keys = tuple(secrets.token_bytes(16) for _ in range(mul))
        _AES_KEYS[mul] = keys
    return _AES_KEYS[mul]


def is_torch(t) -> bool:
    try:
        import torch
        return isinstance(t, torch.Tensor)
    except ImportError:
        return False


def to_u32(t) -> np.ndarray:
    """int32 tensor (torch or numpy) -> uint32 numpy view."""
    if is_torch(t):
        t = t.numpy()
    return np.asarray(t, dtype=np.int32).view(np.uint32)


def from_u32(arr, like) -> object:
    """uint32 array -> int32 tensor of the same family as ``like``."""
    out = np.asarray(arr, dtype=np.uint32).view(np.int32)
    if is_torch(like):
        import torch
        return torch.from_numpy(out.copy())
    return out


def split_uint128(value: int) -> tuple:
    """(lo64, hi64) split, reference fss_crypto/_int.py:4-8."""
    value = int(value)
    return value & 0xFFFFFFFFFFFFFFFF, (value >> 64) & 0xFFFFFFFFFFFFFFFF
