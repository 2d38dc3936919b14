"""fss_crypto-parity DPF wrapper (reference fss_crypto/dpf.py).

Same signatures, shapes, dtypes, validation errors, and key layout; the
compute runs on TPU through fss_tpu.api. ``eval`` additionally accepts an
array of inputs (batched-first extension — the reference only batches in
raw CUDA)."""

from __future__ import annotations

import numpy as np

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.api import Dpf as _ApiDpf
from fss_tpu.crypto import _tensors as tz
from fss_tpu.crypto._validate import (
    validate_alpha,
    validate_beta,
    validate_cpu_only,
    validate_cws,
    validate_device_match,
    validate_domain_value,
    validate_group,
    validate_in_bits,
    validate_party,
    validate_prg,
    validate_s0,
    validate_s0s,
)
from fss_tpu.prg.aes import Aes128Mmo
from fss_tpu.prg.chacha import ChaCha


def _make_prg(prg: str, mul: int):
    if prg == "chacha":
        return ChaCha(mul=mul, nonce=tz.process_nonce())
    return Aes128Mmo(mul=mul, keys=tz.process_aes_keys(mul))


def _make_group(group: str, in_bits: int):
    """String config -> group instance (reference _jit.py:76-87)."""
    if group == "bytes":
        return groups.Bytes()
    if in_bits <= 32:
        return groups.Uint(32)
    if in_bits <= 64:
        return groups.Uint(64)
    return groups.Uint(128, mod=1 << 127)


class Dpf:
    """2-party DPF with the fss_crypto tensor contract.

    Config strings match the reference: ``in_bits`` in 1..128, ``group``
    in {"bytes", "uint"}, ``prg`` in {"chacha", "aes128_mmo"}. Tensors are
    int32 (torch or numpy) in the reference's shapes.
    """

    def __init__(self, in_bits: int, group: str = "bytes",
                 prg: str = "chacha"):
        validate_in_bits(in_bits)
        validate_group(group)
        validate_prg(prg, "dpf")

        self.in_bits = in_bits
        self.group = group
        self.prg = prg
        self._impl = _ApiDpf(in_bits, group=_make_group(group, in_bits),
                             prg=_make_prg(prg, 2))

    def gen(self, s0s, alpha: int, beta):
        """Dealer step: (2, 4) seeds + alpha + (4,) beta ->
        (in_bits+1, 8) int32 correction words."""
        validate_s0s(s0s)
        validate_alpha(alpha, self.in_bits)
        validate_beta(beta)
        validate_cpu_only(s0s, beta, fn_name="gen")

        cws = self._impl.gen(tz.to_u32(s0s), int(alpha), tz.to_u32(beta))
        return tz.from_u32(cws, like=s0s)

    def eval(self, party: int, s0, cws, x):
        """(4,) int32 share for a scalar x; (N, 4) for array inputs (the
        batched-first extension over the reference's scalar-only eval)."""
        validate_party(party)
        validate_s0(s0)
        validate_cws(cws, self.in_bits)
        validate_device_match(s0, cws)
        if isinstance(x, (bool, int, np.integer)) or np.isscalar(x):
            validate_domain_value("x", x, self.in_bits)
            y = np.asarray(self._impl.eval(party, tz.to_u32(s0),
                                           tz.to_u32(cws), int(x)))
            return tz.from_u32(y, like=s0)
        xs = np.asarray(x)
        y = self._impl.eval(party, tz.to_u32(s0), tz.to_u32(cws), xs)
        return tz.from_u32(y, like=s0)

    def eval_all(self, party: int, s0, cws):
        """(2^in_bits, 4) int32 shares over the whole domain."""
        validate_party(party)
        validate_s0(s0)
        validate_cws(cws, self.in_bits)
        validate_cpu_only(s0, cws, fn_name="eval_all")

        ys = self._impl.eval_all(party, tz.to_u32(s0), tz.to_u32(cws))
        return tz.from_u32(ys, like=s0)
