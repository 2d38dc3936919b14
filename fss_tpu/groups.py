"""L2 output-group algebra over 128-bit blocks.

Reference: include/fss/group.cuh (Groupable concept), group/bytes.cuh,
group/uint.cuh. The output domain is fixed at 16 bytes with the clamped bit
(LSB of lane 3) zero, i.e. lambda = 127.

Group values are represented uniformly as [..., 4] uint32 lane arrays
(little-endian), so group ops vmap/shard trivially and reconstruction across
parties is an elementwise op (psum for Uint, XOR-reduce for Bytes).

Key encoding subtlety carried over bit-exactly (group/uint.cuh:58-81): for
128-bit Uint the clamped bit sits *inside* the block encoding — From() takes
``(w >> 1) << 96`` and Into() emits ``(val >> 96) << 1``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
_ONE = np.uint32(1)


# ---------------------------------------------------------------------------
# 128-bit lane arithmetic helpers (4 x uint32, little-endian lanes)
# ---------------------------------------------------------------------------

def _add128(a: jax.Array, b: jax.Array) -> jax.Array:
    """Wrapping 128-bit add of [..., 4] uint32 lane arrays."""
    s0 = a[..., 0] + b[..., 0]
    c0 = (s0 < a[..., 0]).astype(U32)
    s1 = a[..., 1] + b[..., 1]
    c1 = (s1 < a[..., 1]).astype(U32)
    s1c = s1 + c0
    c1 = c1 + (s1c < s1).astype(U32)
    s2 = a[..., 2] + b[..., 2]
    c2 = (s2 < a[..., 2]).astype(U32)
    s2c = s2 + c1
    c2 = c2 + (s2c < s2).astype(U32)
    s3 = a[..., 3] + b[..., 3] + c2
    return jnp.stack([s0, s1c, s2c, s3], axis=-1)


def _sub128(a: jax.Array, b: jax.Array) -> jax.Array:
    """Wrapping 128-bit subtract a - b."""
    d0 = a[..., 0] - b[..., 0]
    br0 = (a[..., 0] < b[..., 0]).astype(U32)
    d1 = a[..., 1] - b[..., 1]
    br1 = (a[..., 1] < b[..., 1]).astype(U32)
    d1b = d1 - br0
    br1 = br1 + ((d1 < br0).astype(U32))
    d2 = a[..., 2] - b[..., 2]
    br2 = (a[..., 2] < b[..., 2]).astype(U32)
    d2b = d2 - br1
    br2 = br2 + ((d2 < br1).astype(U32))
    d3 = a[..., 3] - b[..., 3] - br2
    return jnp.stack([d0, d1b, d2b, d3], axis=-1)


def _ge128(a: jax.Array, b: jax.Array) -> jax.Array:
    """Lexicographic a >= b over lanes (bool of batch shape)."""
    gt = a[..., 3] > b[..., 3]
    eq = a[..., 3] == b[..., 3]
    for lane in (2, 1, 0):
        gt = gt | (eq & (a[..., lane] > b[..., lane]))
        eq = eq & (a[..., lane] == b[..., lane])
    return gt | eq


def _iszero128(a: jax.Array) -> jax.Array:
    return (a[..., 0] | a[..., 1] | a[..., 2] | a[..., 3]) == 0


def _mask_to_bits(a: jax.Array, bits: int) -> jax.Array:
    """Zero out everything above ``bits`` bits."""
    if bits >= 128:
        return a
    full = bits // 32
    rem = bits % 32
    lanes = []
    for i in range(4):
        if i < full:
            lanes.append(a[..., i])
        elif i == full and rem:
            lanes.append(a[..., i] & np.uint32((1 << rem) - 1))
        else:
            lanes.append(jnp.zeros_like(a[..., i]))
    return jnp.stack(lanes, axis=-1)


def _mod_reduce(a: jax.Array, mod_lanes: np.ndarray, a_bits: int) -> jax.Array:
    """a % mod for a < 2^a_bits via MSB-first shift-subtract long division."""
    mod = jnp.asarray(mod_lanes)

    def body(_, carry):
        val, r = carry
        # Shift (val, r) left by one as a 256-bit pair; MSB of val enters r.
        msb = val[..., 3] >> np.uint32(31)
        val = jnp.stack([
            val[..., 0] << _ONE,
            (val[..., 1] << _ONE) | (val[..., 0] >> np.uint32(31)),
            (val[..., 2] << _ONE) | (val[..., 1] >> np.uint32(31)),
            (val[..., 3] << _ONE) | (val[..., 2] >> np.uint32(31)),
        ], axis=-1)
        r = jnp.stack([
            (r[..., 0] << _ONE) | msb,
            (r[..., 1] << _ONE) | (r[..., 0] >> np.uint32(31)),
            (r[..., 2] << _ONE) | (r[..., 1] >> np.uint32(31)),
            (r[..., 3] << _ONE) | (r[..., 2] >> np.uint32(31)),
        ], axis=-1)
        ge = _ge128(r, mod)
        r = jnp.where(ge[..., None], _sub128(r, mod), r)
        return val, r

    # Pre-shift so the loop runs only a_bits iterations.
    shift_up = 128 - a_bits
    val = a
    for _ in range(shift_up // 32):
        val = jnp.concatenate(
            [jnp.zeros_like(val[..., :1]), val[..., :3]], axis=-1)
    rem_shift = np.uint32(shift_up % 32)
    if int(rem_shift):
        inv = np.uint32(32 - int(rem_shift))
        val = jnp.stack([
            val[..., 0] << rem_shift,
            (val[..., 1] << rem_shift) | (val[..., 0] >> inv),
            (val[..., 2] << rem_shift) | (val[..., 1] >> inv),
            (val[..., 3] << rem_shift) | (val[..., 2] >> inv),
        ], axis=-1)
    r0 = jnp.zeros_like(a)
    _, r = jax.lax.fori_loop(0, a_bits, body, (val, r0))
    return r


# ---------------------------------------------------------------------------
# Groups
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Bytes:
    """XOR group over 16-byte blocks (reference group/bytes.cuh).

    Self-inverse: neg(x) == x.
    """

    name = "bytes"

    def from_block(self, buf: jax.Array) -> jax.Array:
        return buf

    def into_block(self, val: jax.Array) -> jax.Array:
        return val

    def add(self, a: jax.Array, b: jax.Array) -> jax.Array:
        return jnp.bitwise_xor(a, b)

    def neg(self, a: jax.Array) -> jax.Array:
        return a

    def zero(self, shape=()) -> jax.Array:
        return jnp.zeros((*shape, 4), dtype=U32)


@dataclasses.dataclass(frozen=True)
class Uint:
    """Unsigned integers with wrapping or modular addition as a group.

    Reference group/uint.cuh. ``bits`` in {8, 16, 32, 64, 128}; ``mod`` = 0
    means wrap at 2^bits. For bits=128 a nonzero mod <= 2^127 is required
    because of the clamped bit.
    """

    bits: int
    mod: int = 0

    def __post_init__(self):
        if self.bits not in (8, 16, 32, 64, 128):
            raise ValueError(f"bits must be 8/16/32/64/128, got {self.bits}")
        if self.bits == 128 and not (0 < self.mod <= (1 << 127)):
            raise ValueError("bits=128 requires 0 < mod <= 2^127")
        if self.mod and self.mod > (1 << self.bits):
            raise ValueError("mod exceeds the value width")

    @property
    def name(self) -> str:
        return f"uint{self.bits}" + (f"_mod{self.mod}" if self.mod else "")

    def _mod_lanes(self) -> np.ndarray:
        m = self.mod
        return np.array([(m >> (32 * i)) & 0xFFFFFFFF for i in range(4)],
                        dtype=np.uint32)

    @property
    def _mod_is_pow2(self) -> bool:
        return self.mod != 0 and (self.mod & (self.mod - 1)) == 0

    def from_block(self, buf: jax.Array) -> jax.Array:
        if self.bits <= 32:
            v0 = buf[..., 0]
            if self.bits < 32:
                v0 = v0 & np.uint32((1 << self.bits) - 1)
            rest = jnp.zeros((*v0.shape, 3), dtype=U32)
            val = jnp.concatenate([v0[..., None], rest], axis=-1)
        elif self.bits == 64:
            val = jnp.stack(
                [buf[..., 0], buf[..., 1],
                 jnp.zeros_like(buf[..., 0]), jnp.zeros_like(buf[..., 0])],
                axis=-1)
        else:
            # The clamped bit sits inside the encoding (group/uint.cuh:58-62).
            val = jnp.stack(
                [buf[..., 0], buf[..., 1], buf[..., 2],
                 buf[..., 3] >> _ONE], axis=-1)
        if self.mod:
            if self._mod_is_pow2:
                val = _mask_to_bits(val, self.mod.bit_length() - 1)
            elif self.bits <= 32:
                v0 = jnp.mod(val[..., 0], np.uint32(self.mod))
                val = val.at[..., 0].set(v0)
            else:
                src_bits = self.bits if self.bits < 128 else 127
                val = _mod_reduce(val, self._mod_lanes(), src_bits)
        return val

    def into_block(self, val: jax.Array) -> jax.Array:
        if self.bits < 128:
            return val
        # buf.w = (val >> 96) << 1 (group/uint.cuh:76-81)
        return val.at[..., 3].set(val[..., 3] << _ONE)

    def add(self, a: jax.Array, b: jax.Array) -> jax.Array:
        if self.mod == 0:
            return _mask_to_bits(_add128(a, b), self.bits)
        s = _add128(a, b)  # operands < mod <= 2^127, no 128-bit overflow
        mod = jnp.asarray(self._mod_lanes())
        ge = _ge128(s, mod)
        return jnp.where(ge[..., None], _sub128(s, mod), s)

    def neg(self, a: jax.Array) -> jax.Array:
        if self.mod == 0:
            zero = jnp.zeros_like(a)
            return _mask_to_bits(_sub128(zero, a), self.bits)
        mod = jnp.zeros_like(a) + jnp.asarray(self._mod_lanes())
        isz = _iszero128(a)
        return jnp.where(isz[..., None], jnp.zeros_like(a), _sub128(mod, a))

    def zero(self, shape=()) -> jax.Array:
        return jnp.zeros((*shape, 4), dtype=U32)


def to_int(group, val) -> int:
    """Convert a single group value's lanes to a Python int (test helper)."""
    lanes = np.asarray(val, dtype=np.uint64)
    return int(sum(int(lanes[i]) << (32 * i) for i in range(4)))
