"""ChaCha-as-PRG, bit-exact to the reference's nonstandard variant.

Reference: include/fss/prg/chacha.cuh. This is NOT standard ChaCha20 stream
output: a single block is generated per seed, with the final feed-forward
done by XOR against the *input* state rows instead of 32-bit addition, and
only the rows needed for ``mul`` outputs are fed forward:

  - state row0 = "expand 16-byte k" constant for mul<=2, else the 32-byte
    constant (chacha.cuh:98-100)
  - rows 1 and 2 = the 128-bit seed, duplicated (chacha.cuh:103-104, 66-68)
  - row3 = counter 0 || 0 and a 2-word nonce (chacha.cuh:106-111)
  - after `rounds` rounds: buf[1] ^= seed always; mul=2 adds buf[0] ^=
    const16; mul=4 adds buf[2] ^= seed and buf[3] ^= {0,0,nonce}
    (chacha.cuh:113-126)

The kernel is written structure-of-arrays: 16 independent uint32 words each
carrying the full batch shape, so every quarter-round op is a full-width VPU
op with no lane shuffles.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fss_tpu import block as blk

_CONST16 = (np.uint32(0x61707865), np.uint32(0x3120646E),
            np.uint32(0x79622D36), np.uint32(0x6B206574))  # "expand 16-byte k"
_CONST32 = (np.uint32(0x61707865), np.uint32(0x3320646E),
            np.uint32(0x79622D32), np.uint32(0x6B206574))  # "expand 32-byte k"

_COLUMNS = ((0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15))
_DIAGONALS = ((0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14))


def _rotl(x, n: int):
    n = np.uint32(n)
    return (x << n) | (x >> np.uint32(32 - int(n)))


def _quarter_round(a, b, c, d):
    a = a + b
    d = _rotl(d ^ a, 16)
    c = c + d
    b = _rotl(b ^ c, 12)
    a = a + b
    d = _rotl(d ^ a, 8)
    c = c + d
    b = _rotl(b ^ c, 7)
    return a, b, c, d


def _double_round(s):
    s = list(s)
    for ia, ib, ic, id_ in _COLUMNS:
        s[ia], s[ib], s[ic], s[id_] = _quarter_round(
            s[ia], s[ib], s[ic], s[id_])
    for ia, ib, ic, id_ in _DIAGONALS:
        s[ia], s[ib], s[ic], s[id_] = _quarter_round(
            s[ia], s[ib], s[ic], s[id_])
    return s


def _chacha_rounds(state, rounds: int, unroll: bool):
    if unroll:
        s = list(state)
        for _ in range(rounds // 2):
            s = _double_round(s)
        return s
    # Rolled form: ~10x smaller HLO (compile time), same VPU work. The carry
    # is 16 full-batch words, so each iteration is full-width vector compute.
    return list(jax.lax.fori_loop(
        0, rounds // 2, lambda _, s: tuple(_double_round(s)), tuple(state)))


def chacha_prg_words(seed_words, nonce, mul: int, rounds: int = 20,
                     unroll: bool = False):
    """SoA core: 4 seed words (each any batch shape) -> mul*4 output words.

    ``nonce`` is a length-2 uint32 sequence (scalars or arrays broadcastable
    against the seed's batch shape).
    """
    k0, k1, k2, k3 = seed_words
    const = _CONST16 if mul <= 2 else _CONST32
    zero = jnp.zeros_like(k0)
    n0 = zero + jnp.asarray(nonce[0], dtype=jnp.uint32)
    n1 = zero + jnp.asarray(nonce[1], dtype=jnp.uint32)
    state = [
        zero + const[0], zero + const[1], zero + const[2], zero + const[3],
        k0, k1, k2, k3,
        k0, k1, k2, k3,  # ExpandKey duplicates the seed (chacha.cuh:66-68)
        zero, zero, n0, n1,
    ]
    s = _chacha_rounds(state, rounds, unroll)

    # Feed-forward by XOR against the inputs (chacha.cuh:113-126).
    out1 = (s[4] ^ k0, s[5] ^ k1, s[6] ^ k2, s[7] ^ k3)
    if mul == 1:
        return (out1,)
    out0 = (s[0] ^ const[0], s[1] ^ const[1], s[2] ^ const[2], s[3] ^ const[3])
    if mul == 2:
        return (out0, out1)
    out2 = (s[8] ^ k0, s[9] ^ k1, s[10] ^ k2, s[11] ^ k3)
    out3 = (s[12], s[13], s[14] ^ n0, s[15] ^ n1)
    return (out0, out1, out2, out3)


@dataclasses.dataclass(frozen=True)
class ChaCha:
    """Batched ChaCha PRG over [..., 4] uint32 seed blocks.

    mul in {1, 2, 4}; returns a tuple of ``mul`` blocks, each [..., 4].
    """

    mul: int
    nonce: tuple  # (uint32, uint32) — process nonce, shared across instances
    rounds: int = 20
    unroll: bool = False  # unrolled rounds: bigger HLO, maybe faster on TPU

    def __post_init__(self):
        if self.mul not in (1, 2, 4):
            raise ValueError(f"mul must be 1, 2, or 4, got {self.mul}")
        if self.rounds % 2 != 0:
            raise ValueError(f"rounds must be even, got {self.rounds}")
        object.__setattr__(
            self, "nonce",
            tuple(np.uint32(int(n) & 0xFFFFFFFF) for n in self.nonce))

    def __call__(self, seed: jax.Array):
        words = blk.to_words(seed)
        outs = chacha_prg_words(words, self.nonce, self.mul, self.rounds,
                                self.unroll)
        return tuple(blk.from_words(*o) for o in outs)


def chacha_prg_reference(seed: np.ndarray, nonce, mul: int,
                         rounds: int = 20) -> np.ndarray:
    """Pure-NumPy oracle of the same PRG, for bit-exactness tests."""
    seed = np.asarray(seed, dtype=np.uint32)
    const = _CONST16 if mul <= 2 else _CONST32
    st = np.zeros(16, dtype=np.uint32)
    st[0:4] = const
    st[4:8] = seed
    st[8:12] = seed
    st[12] = 0
    st[13] = 0
    st[14] = np.uint32(int(nonce[0]) & 0xFFFFFFFF)
    st[15] = np.uint32(int(nonce[1]) & 0xFFFFFFFF)

    def rotl(x, n):
        x = int(x) & 0xFFFFFFFF
        return np.uint32(((x << n) | (x >> (32 - n))) & 0xFFFFFFFF)

    def qr(s, ia, ib, ic, id_):
        a, b, c, d = (int(s[i]) for i in (ia, ib, ic, id_))
        a = (a + b) & 0xFFFFFFFF
        d = int(rotl(d ^ a, 16))
        c = (c + d) & 0xFFFFFFFF
        b = int(rotl(b ^ c, 12))
        a = (a + b) & 0xFFFFFFFF
        d = int(rotl(d ^ a, 8))
        c = (c + d) & 0xFFFFFFFF
        b = int(rotl(b ^ c, 7))
        s[ia], s[ib], s[ic], s[id_] = (np.uint32(a), np.uint32(b),
                                       np.uint32(c), np.uint32(d))

    for _ in range(rounds // 2):
        for cols in _COLUMNS:
            qr(st, *cols)
        for diag in _DIAGONALS:
            qr(st, *diag)

    out1 = st[4:8] ^ seed
    if mul == 1:
        return out1[None]
    out0 = st[0:4] ^ np.asarray(const, dtype=np.uint32)
    if mul == 2:
        return np.stack([out0, out1])
    out2 = st[8:12] ^ seed
    out3 = st[12:16] ^ np.array(
        [0, 0, int(nonce[0]) & 0xFFFFFFFF, int(nonce[1]) & 0xFFFFFFFF],
        dtype=np.uint32)
    return np.stack([out0, out1, out2, out3])
