"""SHA-256 keyed hash (reference include/fss/hash/sha256.cuh).

Semantics carried over bit-exactly:
  - ``hash64``: SHA-256 over the 80 bytes key(16B) || msg(64B)
    (sha256.cuh:43-58);
  - ``xor_hash``: SHA-256 over the 48 bytes key || SetLsb(a, 0) || b and
    again with LSB set, concatenated to 64B (sha256.cuh:69-89).
Byte streams are the blocks' little-endian lane bytes; SHA-256 itself works
on big-endian words, so lanes are byte-swapped at the boundary.

Unlike the reference (OpenSSL EVP, host-only, device __trap()s), this runs
batched on TPU: the compression is 64 rounds of 32-bit add/xor/rotate in a
fori_loop, structure-of-arrays over the batch. This makes the VDPF
SHA-256 config fully device-capable — new capability vs the reference.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

_H0 = np.array([
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19], dtype=np.uint32)

_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2], dtype=np.uint32)


def _rotr(x, n: int):
    n = np.uint32(n)
    return (x >> n) | (x << np.uint32(32 - int(n)))


def bswap32(x):
    return ((x >> np.uint32(24))
            | ((x >> np.uint32(8)) & np.uint32(0xFF00))
            | ((x << np.uint32(8)) & np.uint32(0xFF0000))
            | (x << np.uint32(24)))


def compress_words(state, block_words, unroll=None):
    """One SHA-256 compression, SoA over any batch shape.

    state: 8 uint32 words; block_words: 16 big-endian uint32 message words.
    Returns the 8 updated state words.

    The rolled form carries the 16-word schedule window as separate loop
    carries, so the per-round shift is trace-time tuple reindexing (no
    data movement). unroll=True emits the 64 rounds straight-line —
    slightly faster standalone on TPU but with much longer XLA compiles
    inside large fused programs (and pathological on XLA:CPU).
    """
    if unroll is None:
        unroll = False
    if unroll:
        zero = jnp.zeros_like(block_words[0] + state[0])
        w = [zero + x for x in block_words]
        a, b, c, d, e, f, g, h = (zero + s for s in state)
        for t in range(64):
            if t < 16:
                wt = w[t]
            else:
                w1, w9, w14 = w[t - 15], w[t - 7], w[t - 2]
                ls0 = _rotr(w1, 7) ^ _rotr(w1, 18) ^ (w1 >> np.uint32(3))
                ls1 = (_rotr(w14, 17) ^ _rotr(w14, 19)
                       ^ (w14 >> np.uint32(10)))
                wt = w[t - 16] + ls0 + w9 + ls1
                w.append(wt)
            s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = h + s1 + ch + np.uint32(_K[t]) + wt
            s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            a, b, c, d, e, f, g, h = (t1 + s0 + maj, a, b, c, d + t1,
                                      e, f, g)
        outs = (a, b, c, d, e, f, g, h)
        return tuple(s + o for s, o in zip(state, outs))

    k = jnp.asarray(_K)
    zero = jnp.zeros_like(block_words[0] + state[0])
    wtup = tuple(zero + x for x in block_words)
    st = tuple(zero + s for s in state)

    def body(t, carry):
        a, b, c, d, e, f, g, h = carry[:8]
        w = carry[8:]
        wt = w[0]
        kt = jax.lax.dynamic_index_in_dim(k, t, 0, keepdims=False)
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + kt + wt
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = s0 + maj
        # Schedule: W[t+16] = W[t] + s0(W[t+1]) + W[t+9] + s1(W[t+14]).
        ls0 = _rotr(w[1], 7) ^ _rotr(w[1], 18) ^ (w[1] >> np.uint32(3))
        ls1 = (_rotr(w[14], 17) ^ _rotr(w[14], 19)
               ^ (w[14] >> np.uint32(10)))
        w_new = w[0] + ls0 + w[9] + ls1
        # Window shift = carry reindexing; no data movement.
        return (t1 + t2, a, b, c, t1 + d, e, f, g, *w[1:], w_new)

    out = jax.lax.fori_loop(0, 64, body, (*st, *wtup))
    return tuple(s + o for s, o in zip(state, out[:8]))


def _sha256_blocks(blocks):
    """blocks: list of 16-word lists (big-endian). Returns 8 digest words."""
    st = tuple(jnp.asarray(h) for h in _H0)
    for bw in blocks:
        st = compress_words(st, bw)
    return st


@dataclasses.dataclass(frozen=True)
class Sha256:
    """Keyed SHA-256 over blocks; key is a 16B block (4 uint32 lanes)."""

    key: tuple  # 4 python ints / uint32 (little-endian lanes)

    def __post_init__(self):
        object.__setattr__(
            self, "key",
            tuple(np.uint32(int(w) & 0xFFFFFFFF) for w in self.key))
        assert len(self.key) == 4

    def _key_words(self, zero):
        return [zero + bswap32(np.uint32(k)) for k in self.key]

    def hash64(self, msg: jax.Array) -> jax.Array:
        """SHA-256(key || msg64): msg [..., 4, 4] -> [..., 2, 4]."""
        msg = jnp.asarray(msg, dtype=jnp.uint32)
        zero = jnp.zeros_like(msg[..., 0, 0])
        kw = self._key_words(zero)
        mw = [bswap32(msg[..., i // 4, i % 4]) for i in range(16)]
        # 80 bytes -> block 1: key + msg[0:12]; block 2: msg[12:16] + pad.
        blk1 = kw + mw[:12]
        pad = [zero + np.uint32(0x80000000)] + [zero] * 9 \
            + [zero, zero + np.uint32(640)]
        blk2 = mw[12:16] + pad
        d = _sha256_blocks([blk1, blk2])
        lanes = [bswap32(x) for x in d]
        return jnp.stack([jnp.stack(lanes[0:4], axis=-1),
                          jnp.stack(lanes[4:8], axis=-1)], axis=-2)

    def xor_hash(self, a: jax.Array, b: jax.Array) -> jax.Array:
        """(a, b) [..., 4] -> [..., 4, 4]: two 48-byte keyed digests with
        a's LSB as domain separator."""
        a = jnp.asarray(a, dtype=jnp.uint32)
        b = jnp.asarray(b, dtype=jnp.uint32)
        zero = jnp.zeros_like(a[..., 0])
        kw = self._key_words(zero)
        bw = [bswap32(b[..., i]) for i in range(4)]
        # 48 bytes -> one block: 12 message words + 0x80, zero, len(=384).
        pad = [zero + np.uint32(0x80000000), zero, zero,
               zero + np.uint32(384)]

        outs = []
        for lsb in (0x0, 0x1):
            a_l = a.at[..., 3].set(
                (a[..., 3] & np.uint32(0xFFFFFFFE)) | np.uint32(lsb))
            aw = [bswap32(a_l[..., i]) for i in range(4)]
            block = kw + aw + bw + pad
            d = _sha256_blocks([block])
            lanes = [bswap32(x) for x in d]
            outs.append(jnp.stack(lanes[0:4], axis=-1))
            outs.append(jnp.stack(lanes[4:8], axis=-1))
        return jnp.stack(outs, axis=-2)
