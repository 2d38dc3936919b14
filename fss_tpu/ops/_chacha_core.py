"""Shared ChaCha core for Pallas TPU kernels (fully unrolled rounds).

Reference semantics: prg/chacha.cuh (nonstandard single-block variant, XOR
feed-forward against the inputs). Used inside kernels only — the rolled
jnp implementation for XLA paths lives in fss_tpu.prg.chacha.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

ONE = np.uint32(1)
NOTONE = np.uint32(0xFFFFFFFE)
FULL = np.uint32(0xFFFFFFFF)

CONST16 = (np.uint32(0x61707865), np.uint32(0x3120646E),
           np.uint32(0x79622D36), np.uint32(0x6B206574))
CONST32 = (np.uint32(0x61707865), np.uint32(0x3320646E),
           np.uint32(0x79622D32), np.uint32(0x6B206574))
_COLS = ((0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15))
_DIAG = ((0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14))


def _rotl(x, n: int):
    return (x << np.uint32(n)) | (x >> np.uint32(32 - n))


def _qr(a, b, c, d):
    a = a + b
    d = _rotl(d ^ a, 16)
    c = c + d
    b = _rotl(b ^ c, 12)
    a = a + b
    d = _rotl(d ^ a, 8)
    c = c + d
    b = _rotl(b ^ c, 7)
    return a, b, c, d


def chacha_block(k0, k1, k2, k3, nonce, mul: int, rounds: int = 20,
                 unroll: bool = True):
    """Returns a tuple of ``mul`` 4-word outputs (chacha.cuh:95-126).

    ``unroll=False`` rolls the rounds into a fori_loop — used by interpret
    -mode tests on XLA:CPU, whose compile time on long unrolled scalar
    chains is pathological. TPU kernels keep the unrolled form.
    """
    const = CONST16 if mul <= 2 else CONST32
    zero = jnp.zeros_like(k0)
    st = [zero + c for c in const] + [k0, k1, k2, k3, k0, k1, k2, k3,
                                      zero, zero, zero + nonce[0],
                                      zero + nonce[1]]

    def dround(s):
        s = list(s)
        for ia, ib, ic, id_ in _COLS:
            s[ia], s[ib], s[ic], s[id_] = _qr(s[ia], s[ib], s[ic], s[id_])
        for ia, ib, ic, id_ in _DIAG:
            s[ia], s[ib], s[ic], s[id_] = _qr(s[ia], s[ib], s[ic], s[id_])
        return s

    if unroll:
        for _ in range(rounds // 2):
            st = dround(st)
    else:
        import jax
        st = list(jax.lax.fori_loop(
            0, rounds // 2, lambda _, s: tuple(dround(s)), tuple(st)))
    out1 = (st[4] ^ k0, st[5] ^ k1, st[6] ^ k2, st[7] ^ k3)
    if mul == 1:
        return (out1,)
    out0 = (st[0] ^ const[0], st[1] ^ const[1], st[2] ^ const[2],
            st[3] ^ const[3])
    if mul == 2:
        return (out0, out1)
    out2 = (st[8] ^ k0, st[9] ^ k1, st[10] ^ k2, st[11] ^ k3)
    out3 = (st[12], st[13], st[14] ^ nonce[0], st[15] ^ nonce[1])
    return (out0, out1, out2, out3)


def add128(a, b):
    """Wrapping 128-bit add of two 4-word tuples (word 0 least
    significant); word-level carries only propagate upward, so truncating
    the result to a group's width equals adding in that group."""
    s0 = a[0] + b[0]
    c0 = (s0 < a[0]).astype(jnp.uint32)
    s1 = a[1] + b[1]
    c1 = (s1 < a[1]).astype(jnp.uint32)
    s1c = s1 + c0
    c1 = c1 + (s1c < s1).astype(jnp.uint32)
    s2 = a[2] + b[2]
    c2 = (s2 < a[2]).astype(jnp.uint32)
    s2c = s2 + c1
    c2 = c2 + (s2c < s2).astype(jnp.uint32)
    s3 = a[3] + b[3] + c2
    return (s0, s1c, s2c, s3)


def neg128(a):
    """Two's-complement negation of a 4-word tuple (128-bit lanes)."""
    one = jnp.full_like(a[0], 1)
    zero = jnp.zeros_like(a[0])
    return add128(tuple(x ^ FULL for x in a), (one, zero, zero, zero))
