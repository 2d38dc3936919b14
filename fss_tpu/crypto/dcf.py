"""fss_crypto-parity DCF wrapper (reference fss_crypto/dcf.py).

Same surface as crypto.dpf.Dpf plus the ``pred`` config ("lt"/"gt")."""

from __future__ import annotations

import numpy as np

from fss_tpu.api import Dcf as _ApiDcf
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
    validate_pred,
    validate_prg,
    validate_s0,
    validate_s0s,
)
from fss_tpu.crypto.dpf import _make_group, _make_prg


class Dcf:
    """2-party Distributed Comparison Function.

    Args:
        in_bits: Input domain bit size (1..128).
        group: Output group type, "bytes" or "uint".
        prg: PRG type, "chacha" or "aes128_mmo".
        pred: Comparison predicate, "lt" (y = beta iff x < alpha) or "gt".
    """

    def __init__(self, in_bits: int, group: str = "bytes",
                 prg: str = "chacha", pred: str = "lt"):
        validate_in_bits(in_bits)
        validate_group(group)
        validate_prg(prg, "dcf")
        validate_pred(pred)

        self.in_bits = in_bits
        self.group = group
        self.prg = prg
        self.pred = pred
        self._impl = _ApiDcf(in_bits, group=_make_group(group, in_bits),
                             prg=_make_prg(prg, 4), pred=pred)

    def gen(self, s0s, alpha: int, beta):
        """Returns (in_bits+1, 8) int32 correction words."""
        validate_s0s(s0s)
        validate_alpha(alpha, self.in_bits)
        validate_beta(beta)
        validate_cpu_only(s0s, beta, fn_name="gen")

        cws = self._impl.gen(tz.to_u32(s0s), int(alpha), tz.to_u32(beta))
        return tz.from_u32(cws, like=s0s)

    def eval(self, party: int, s0, cws, x):
        """(4,) int32 share for a scalar x; (N, 4) for array inputs."""
        validate_party(party)
        validate_s0(s0)
        validate_cws(cws, self.in_bits)
        validate_device_match(s0, cws)
        if isinstance(x, (bool, int, np.integer)) or np.isscalar(x):
            validate_domain_value("x", x, self.in_bits)
            y = np.asarray(self._impl.eval(party, tz.to_u32(s0),
                                           tz.to_u32(cws), int(x)))
            return tz.from_u32(y, like=s0)
        y = self._impl.eval(party, tz.to_u32(s0), tz.to_u32(cws),
                            np.asarray(x))
        return tz.from_u32(y, like=s0)

    def eval_all(self, party: int, s0, cws):
        """(2^in_bits, 4) int32 output shares."""
        validate_party(party)
        validate_s0(s0)
        validate_cws(cws, self.in_bits)
        validate_cpu_only(s0, cws, fn_name="eval_all")

        ys = self._impl.eval_all(party, tz.to_u32(s0), tz.to_u32(cws))
        return tz.from_u32(ys, like=s0)
