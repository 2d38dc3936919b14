"""Bitsliced AES-128: gather-free AES for the TPU VPU.

Table lookups are serialized on TPU, so the T-table AES in prg/aes.py is
host-oracle-grade only. This module computes AES as pure bitwise ops on
bit-planes: 32 instances pack into each uint32 word, the 128 state bits
become 128 [B/32]-shaped word arrays, and the S-box is GF(2^8) inversion
(x^254 via an addition chain of bitsliced multiplies/squarings) plus the
affine map — ~4k word-ops per instance, no gathers anywhere. This is the
approach SURVEY §7.3 calls out as the TPU-native answer to soft AES (the
reference's GPU answer is shared-memory T-tables, aes128_mmo_soft.cuh).

All linear-layer bit matrices (squaring, xtime, reduction) are derived
numerically at import from the AES polynomial x^8+x^4+x^3+x+1 — nothing
hand-transcribed — and the whole cipher is verified against FIPS-197
vectors in tests.

Layout: instances pack along the LAST axis; planes[i] holds bit i of the
state for 32 instances per word. bit_transpose handles [B, 4]-uint32
block <-> plane conversion.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from fss_tpu.prg.aes import key_expansion

_POLY = 0x11B  # AES field polynomial


def _gf_mul_int(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        b >>= 1
        a <<= 1
        if a & 0x100:
            a ^= _POLY
    return r


def _linear_matrix(fn):
    """8x8 bit matrix of a linear GF(2^8) map: M[i] = bitmask of inputs
    feeding output bit i."""
    cols = [fn(1 << j) for j in range(8)]
    return [sum(((cols[j] >> i) & 1) << j for j in range(8))
            for i in range(8)]


_SQ_MAT = _linear_matrix(lambda x: _gf_mul_int(x, x))
_XTIME_MAT = _linear_matrix(lambda x: _gf_mul_int(x, 2))
# Reduction of schoolbook product bits 8..14 back into bits 0..7.


def _reduce_int(v: int) -> int:
    for bit in range(14, 7, -1):
        if (v >> bit) & 1:
            v ^= _POLY << (bit - 8)
    return v & 0xFF


_RED = [_reduce_int(1 << k) for k in range(15)]
# Affine layer: out_i = in_i ^ in_{i+4} ^ in_{i+5} ^ in_{i+6} ^ in_{i+7} ^ c_i
_AFFINE_C = 0x63


def _apply_matrix(mat, bits):
    """bits: list of 8 word arrays; mat[i] = input mask for output i."""
    out = []
    for i in range(8):
        acc = None
        m = mat[i]
        for j in range(8):
            if (m >> j) & 1:
                acc = bits[j] if acc is None else acc ^ bits[j]
        out.append(acc if acc is not None else jnp.zeros_like(bits[0]))
    return out


def _gf_mul(a, b):
    """Bitsliced GF(2^8) multiply: two 8-plane lists -> 8-plane list."""
    # Schoolbook partial products t_k = XOR_{i+j=k} a_i & b_j.
    t = [None] * 15
    for i in range(8):
        for j in range(8):
            p = a[i] & b[j]
            k = i + j
            t[k] = p if t[k] is None else t[k] ^ p
    # Fold bits 8..14 through the field polynomial.
    out = list(t[:8])
    for k in range(8, 15):
        red = _RED[k]  # byte value of x^k mod poly
        for i in range(8):
            if (red >> i) & 1:
                out[i] = out[i] ^ t[k]
    return out


def _gf_sq(a):
    return _apply_matrix(_SQ_MAT, a)


def _sbox_planes(b):
    """Bitsliced AES S-box on 8 planes: inverse (x^254) + affine."""
    x2 = _gf_sq(b)
    x3 = _gf_mul(x2, b)
    x12 = _gf_sq(_gf_sq(x3))
    x15 = _gf_mul(x12, x3)
    x240 = _gf_sq(_gf_sq(_gf_sq(_gf_sq(x15))))
    x252 = _gf_mul(x240, x12)
    inv = _gf_mul(x252, x2)  # x^254
    ones = None
    out = []
    for i in range(8):
        v = (inv[i] ^ inv[(i + 4) % 8] ^ inv[(i + 5) % 8]
             ^ inv[(i + 6) % 8] ^ inv[(i + 7) % 8])
        if (_AFFINE_C >> i) & 1:
            if ones is None:
                ones = ~jnp.zeros_like(v)
            v = v ^ ones
        out.append(v)
    return out


def _xtime(b):
    return _apply_matrix(_XTIME_MAT, b)


_SHIFT_ROWS = tuple((byt % 4) + 4 * (((byt // 4) + (byt % 4)) % 4)
                    for byt in range(16))


def _key_planes(round_keys: np.ndarray) -> np.ndarray:
    """[11, 16] uint8 round keys -> [11, 16, 8] uint32 plane constants
    (0 or 0xFFFFFFFF), XORed into the state as data so the 10 rounds can
    roll into a fori_loop."""
    rk = np.zeros((11, 16, 8), dtype=np.uint32)
    for r in range(11):
        for byt in range(16):
            for bit in range(8):
                if (int(round_keys[r, byt]) >> bit) & 1:
                    rk[r, byt, bit] = 0xFFFFFFFF
    return rk


def encrypt_planes(planes, round_keys: np.ndarray):
    """Bitsliced AES-128 over plane arrays.

    planes: list of 128 word arrays [N] — planes[8*byte + bit] = bit
    ``bit`` of state byte ``byte`` (bytes in block memory order).
    round_keys: [11, 16] uint8.

    Compile-friendly shape: the 16 byte S-boxes run as ONE vectorized
    circuit over a [16, N] axis, and rounds 1..9 roll into a fori_loop
    with the round keys indexed as data — HLO stays a few thousand ops
    instead of ~10^5 (the XLA:CPU straight-line pathology).
    """
    n = planes[0].shape
    st = jnp.stack(planes).reshape(16, 8, *n)  # [byte, bit, N]
    rk = jnp.asarray(_key_planes(round_keys))  # [11, 16, 8]
    rk = rk.reshape(11, 16, 8, *([1] * len(n)))

    def sub_shift_mix(st, mix: bool):
        bits = [st[:, b] for b in range(8)]       # 8 x [16, N]
        bits = _sbox_planes(bits)
        st = jnp.stack(bits, axis=1)              # [16, 8, N]
        st = st[jnp.asarray(_SHIFT_ROWS)]
        if not mix:
            return st
        cols = st.reshape(4, 4, 8, *n)            # [col, row, bit, N]
        a = [[cols[c, r] for r in range(4)] for c in range(4)]
        out = []
        for c in range(4):
            xa = [_xtime([a[c][r][b] for b in range(8)]) for r in range(4)]
            col_out = []
            for r in range(4):
                t = [xa[r][b] ^ xa[(r + 1) % 4][b]
                     ^ a[c][(r + 1) % 4][b]
                     ^ a[c][(r + 2) % 4][b]
                     ^ a[c][(r + 3) % 4][b] for b in range(8)]
                col_out.append(jnp.stack(t))
            out.append(jnp.stack(col_out))
        return jnp.stack(out).reshape(16, 8, *n)

    st = st ^ rk[0]

    def body(r, st):
        st = sub_shift_mix(st, mix=True)
        return st ^ jax.lax.dynamic_index_in_dim(rk, r, 0, keepdims=False)

    st = jax.lax.fori_loop(1, 10, body, st)
    st = sub_shift_mix(st, mix=False) ^ rk[10]
    return [st[byt, bit] for byt in range(16) for bit in range(8)]


# ---------------------------------------------------------------------------
# Block <-> plane packing (32 instances per uint32 word)
# ---------------------------------------------------------------------------

def _transpose32(x):
    """Bit-transpose of a [..., 32] uint32 array (32x32 bit matrices)."""
    masks = [(np.uint32(0x0000FFFF), 16), (np.uint32(0x00FF00FF), 8),
             (np.uint32(0x0F0F0F0F), 4), (np.uint32(0x33333333), 2),
             (np.uint32(0x55555555), 1)]
    for m, s in masks:
        # Swap s-bit groups between row pairs (k, k+s).
        x = x.reshape(*x.shape[:-1], 32 // (2 * s), 2, s)
        a = x[..., 0, :]
        b = x[..., 1, :]
        t = ((a >> np.uint32(s)) ^ b) & m
        a2 = a ^ (t << np.uint32(s))
        b2 = b ^ t
        x = jnp.stack([a2, b2], axis=-2).reshape(*x.shape[:-3], 32)
    return x


def blocks_to_planes(blocks: jax.Array):
    """[B, 4] uint32 blocks -> (list of 128 [B/32] plane words, B).

    B is padded to a multiple of 32. Plane order: byte-major bit-minor
    over the block's 16 little-endian memory bytes (matching
    encrypt_planes and the AES block byte order of prg/aes.py).
    """
    B = blocks.shape[0]
    Bp = ((B + 31) // 32) * 32
    blk8 = jnp.pad(blocks, ((0, Bp - B), (0, 0)))
    # -> [Bp, 16] bytes (little-endian within each lane).
    b = jnp.stack([(blk8[:, w] >> np.uint32(8 * i)) & np.uint32(0xFF)
                   for w in range(4) for i in range(4)], axis=1)
    # group instances: [G, 32, 16] -> per byte, transpose 32x... build
    # 8 planes per byte via bit-transpose of [G, 32] words.
    g = Bp // 32
    planes = []
    for byt in range(16):
        w = b[:, byt].reshape(g, 32)  # 32 instances' byte values
        t = _transpose32(w)  # bit i of the 32 instances -> word i
        for bit in range(8):
            planes.append(t[:, bit])
    return planes, B


def planes_to_blocks(planes, batch: int):
    """Inverse of blocks_to_planes."""
    g = planes[0].shape[0]
    out_bytes = []
    for byt in range(16):
        rows = [planes[8 * byt + bit] for bit in range(8)]
        rows += [jnp.zeros_like(rows[0])] * 24
        t = _transpose32(jnp.stack(rows, axis=1))  # [g, 32]
        out_bytes.append(t.reshape(g * 32))  # byte value per instance
    lanes = []
    for w in range(4):
        v = out_bytes[4 * w]
        for i in range(1, 4):
            v = v | (out_bytes[4 * w + i] << np.uint32(8 * i))
        lanes.append(v)
    return jnp.stack(lanes, axis=1)[:batch]


def aes128_encrypt_blocks(key16: bytes, blocks: jax.Array) -> jax.Array:
    """Bitsliced AES-128 ECB over [B, 4] uint32 blocks."""
    rks = _round_key_bytes(key16)
    planes, B = blocks_to_planes(jnp.asarray(blocks, dtype=jnp.uint32))
    out = encrypt_planes(planes, rks)
    return planes_to_blocks(out, B)


def _round_key_bytes(key16: bytes) -> np.ndarray:
    """[11, 16] uint8 round keys (byte order of the AES state)."""
    rk_words = key_expansion(key16)  # [11, 4] big-endian words
    out = np.zeros((11, 16), dtype=np.uint8)
    for r in range(11):
        for w in range(4):
            be = int(rk_words[r, w])
            out[r, 4 * w:4 * w + 4] = [(be >> 24) & 0xFF, (be >> 16) & 0xFF,
                                       (be >> 8) & 0xFF, be & 0xFF]
    return out
