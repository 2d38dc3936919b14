"""Small-domain PRP: 4-round Feistel with AES-128 round PRF + cycle-walking.

Reference: include/fss/prp/aes128_feistel.cuh (host-only OpenSSL there;
fully batched and device-capable here). Semantics carried bit-exactly:
  - b = ceil(log2(domain)), half = (b + 1) // 2, mask = 2^half - 1;
  - per-round AES key = seed with round index XORed into lane 0
    (aes128_feistel.cuh:142-144);
  - PRF = AES(round_key, pack128(right)) truncated to half bits;
  - cycle-walk until the output lands in [0, domain)
    (aes128_feistel.cuh:136-157).

The PRP seed (sigma) is public key material known host-side, so the four
per-round AES key schedules are expanded once in NumPy at construction; the
batched path is then pure VPU work + table gathers. Values are carried as
(hi, lo) uint32 pairs, supporting domains up to 2^62 without x64 mode.

The cycle-walk is a lax.while_loop re-permuting only the still-out-of-range
lanes — expected < 4 iterations total since 2^(2*half) < 4 * domain.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from fss_tpu.prg import aes as _aes

_U32MASK = 0xFFFFFFFF


def _shr_lanes(x4, k: int):
    """Logical right shift of [..., 4] little-endian uint32 lanes by a
    static 0 <= k < 128."""
    ws, bs = divmod(k, 32)
    w = [x4[..., i] for i in range(4)]
    zero = jnp.zeros_like(w[0])
    w = w[ws:] + [zero] * ws
    if bs:
        lo, hi = np.uint32(bs), np.uint32(32 - bs)
        w = [(w[i] >> lo) | (w[i + 1] << hi) if i < 3 else (w[i] >> lo)
             for i in range(4)]
    return jnp.stack(w, axis=-1)


def _shl_lanes(x4, k: int):
    """Left shift of [..., 4] little-endian uint32 lanes by a static k."""
    ws, bs = divmod(k, 32)
    w = [x4[..., i] for i in range(4)]
    zero = jnp.zeros_like(w[0])
    w = [zero] * ws + w[:4 - ws]
    if bs:
        lo, hi = np.uint32(bs), np.uint32(32 - bs)
        w = [(w[i] << lo) | (w[i - 1] >> hi) if i > 0 else (w[i] << lo)
             for i in range(4)]
    return jnp.stack(w, axis=-1)


def _mask_low_lanes(x4, nbits: int):
    """Keep the low ``nbits`` of [..., 4] little-endian uint32 lanes."""
    mask = (1 << nbits) - 1
    lanes = [np.uint32((mask >> (32 * i)) & _U32MASK) for i in range(4)]
    return x4 & jnp.asarray(np.array(lanes, dtype=np.uint32))


def _lt_const_lanes(x4, c: int):
    """Elementwise x < c for [..., 4] little-endian uint32 lane values."""
    lt = jnp.zeros(x4.shape[:-1], dtype=jnp.bool_)
    eq = jnp.ones(x4.shape[:-1], dtype=jnp.bool_)
    for i in range(3, -1, -1):
        ci = np.uint32((c >> (32 * i)) & _U32MASK)
        lt = lt | (eq & (x4[..., i] < ci))
        eq = eq & (x4[..., i] == ci)
    return lt


def ceil_log2(x: int) -> int:
    """ceil(log2(x)); 0 for x <= 1 (aes128_feistel.cuh:50-59)."""
    if x <= 1:
        return 0
    return (x - 1).bit_length()


def _seed_bytes(sigma) -> bytes:
    """sigma as the int4's 16 memory bytes (lanes little-endian)."""
    if isinstance(sigma, (bytes, bytearray)):
        assert len(sigma) == 16
        return bytes(sigma)
    lanes = np.asarray(sigma, dtype=np.uint32)
    assert lanes.shape == (16,) or lanes.shape == (4,)
    if lanes.shape == (16,):
        return lanes.astype(np.uint8).tobytes()
    return lanes.astype("<u4").tobytes()


@dataclasses.dataclass(frozen=True)
class Aes128Feistel:
    """PRP over [0, domain), keyed by a 16-byte sigma; static per key."""

    sigma: bytes
    domain: int

    def __post_init__(self):
        object.__setattr__(self, "sigma", _seed_bytes(self.sigma))
        assert self.domain >= 2
        b = ceil_log2(self.domain)
        half = (b + 1) // 2
        assert half <= 64, "domain must fit 128 bits (prp.cuh:22-25)"
        object.__setattr__(self, "_half", half)
        object.__setattr__(self, "_mask",
                           np.uint32(((1 << half) - 1) & _U32MASK
                                     if half < 32 else _U32MASK))
        # Round key = sigma with the round index XORed into lane 0
        # (byte 0, little-endian) — aes128_feistel.cuh:142-144.
        rks = []
        for r in range(4):
            kb = bytearray(self.sigma)
            kb[0] ^= r
            rks.append(_aes.key_expansion(bytes(kb)))
        object.__setattr__(self, "_round_keys", tuple(rks))

    # -- device path --------------------------------------------------------

    def _feistel(self, hi, lo):
        half = self._half
        assert half <= 32, "use permu_lanes for domains above 2^62"
        mask = self._mask
        if half == 32:
            left, right = hi, lo
        else:
            left = ((hi << np.uint32(32 - half))
                    | (lo >> np.uint32(half))) & mask
            right = lo & mask
        for rk in self._round_keys:
            # PRF input block = pack128(right): lane 0 = right, rest 0.
            zero = jnp.zeros_like(right)
            w0 = _aes._bswap32(right)
            o0, _, _, _ = _aes.aes128_encrypt_words(rk, w0, zero, zero, zero)
            f = _aes._bswap32(o0) & mask
            left = left ^ f
            left, right = right, left
        if half == 32:
            return left, right
        new_lo = ((left << np.uint32(half)) | right) & np.uint32(_U32MASK)
        new_hi = left >> np.uint32(32 - half)
        return new_hi, new_lo

    def permu(self, xs) -> tuple:
        """Batched PRP: xs as (hi, lo) uint32 arrays or a single uint32/
        int array (hi = 0). Returns (hi, lo) uint32 arrays."""
        if isinstance(xs, tuple):
            hi, lo = (jnp.asarray(v, dtype=jnp.uint32) for v in xs)
        else:
            lo = jnp.asarray(xs, dtype=jnp.uint32)
            hi = jnp.zeros_like(lo)
        d_hi = np.uint32(self.domain >> 32)
        d_lo = np.uint32(self.domain & _U32MASK)

        def in_domain(hi, lo):
            return (hi < d_hi) | ((hi == d_hi) & (lo < d_lo))

        hi, lo = self._feistel(hi, lo)

        def cond(state):
            hi, lo = state
            return jnp.any(~in_domain(hi, lo))

        def body(state):
            hi, lo = state
            nhi, nlo = self._feistel(hi, lo)
            ok = in_domain(hi, lo)
            return jnp.where(ok, hi, nhi), jnp.where(ok, lo, nlo)

        hi, lo = jax.lax.while_loop(cond, body, (hi, lo))
        return hi, lo

    # -- wide device path (4-lane values, domains up to 2^128) --------------

    def _feistel_lanes(self, x4):
        """One Feistel pass over [..., 4] uint32 lane values (little-
        endian lanes), half <= 64. Bit-exact twin of ``permu_host`` for
        wide domains — parity with the reference PRP's __uint128_t
        domain (prp.cuh:22-25, aes128_feistel.cuh:127-159)."""
        half = self._half
        r = _mask_low_lanes(x4, half)
        left = _mask_low_lanes(_shr_lanes(x4, half), half)
        for rk in self._round_keys:
            # PRF block = right.to_bytes(16, 'little'); AES words are the
            # big-endian views of each 4-byte group.
            w = [_aes._bswap32(r[..., i]) for i in range(4)]
            o = _aes.aes128_encrypt_words(rk, *w)
            f = jnp.stack([_aes._bswap32(oi) for oi in o], axis=-1)
            f = _mask_low_lanes(f, half)
            left = left ^ f
            left, r = r, left
        return _shl_lanes(left, half) | r

    def permu_lanes(self, x4) -> jax.Array:
        """Batched PRP over [..., 4] uint32 lane values; any domain up to
        2^128. Returns [..., 4] lanes (cycle-walked into [0, domain))."""
        x4 = jnp.asarray(x4, dtype=jnp.uint32)
        d = self.domain

        def in_domain(v):
            return _lt_const_lanes(v, d)

        y = self._feistel_lanes(x4)

        def cond(v):
            return jnp.any(~in_domain(v))

        def body(v):
            nv = self._feistel_lanes(v)
            return jnp.where(in_domain(v)[..., None], v, nv)

        return jax.lax.while_loop(cond, body, y)

    # -- precomputed permutation table --------------------------------------

    TABLE_MAX_DOMAIN = 1 << 22

    def permutation_table(self) -> np.ndarray:
        """The full [domain] uint32 permutation, computed once per key.

        The PRP is public (sigma is key material both parties hold), so
        for small domains the whole bijection can be tabulated — after
        which every Locate is ONE table gather instead of 4 AES rounds of
        table gathers (vdmpf routing's hot path on TPU). Uses the native
        AES-NI engine when present; cached on the instance.
        """
        assert self.domain <= self.TABLE_MAX_DOMAIN, "table too large"
        cached = getattr(self, "_table", None)
        if cached is not None:
            return cached
        xs = np.arange(self.domain, dtype=np.uint64)
        table = None
        try:
            from fss_tpu import native
            eng = native.engine()
            if eng.has_aesni:
                table = eng.prp_permu_batch(self.sigma, self.domain,
                                            xs).astype(np.uint32)
        except Exception:
            table = None
        if table is None:  # pure-Python fallback (slow; small domains)
            table = np.array([self.permu_host(int(x)) for x in xs],
                             dtype=np.uint32)
        object.__setattr__(self, "_table", table)
        return table

    # -- host oracle (used by Cuckoo insertion and tests) --------------------

    def permu_host(self, x: int) -> int:
        """Scalar NumPy/int path, bit-exact twin of ``permu``."""
        assert 0 <= x < self.domain
        half = self._half
        mask = (1 << half) - 1
        val = x
        while True:
            left = (val >> half) & mask
            right = val & mask
            for r in range(4):
                kb = bytearray(self.sigma)
                kb[0] ^= r
                block = right.to_bytes(16, "little")
                out = _aes.aes128_encrypt_reference(bytes(kb), block)
                f = int.from_bytes(out, "little") & mask
                left ^= f
                left, right = right, left
            val = (left << half) | right
            if val < self.domain:
                return val
