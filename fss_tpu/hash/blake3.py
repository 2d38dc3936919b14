"""Single-compression keyed BLAKE3 (reference include/fss/hash/blake3.cuh).

Semantics carried over bit-exactly:
  - a custom 32B IV replaces BLAKE3's standard IV (keyed-hash mode);
  - flags = CHUNK_START | CHUNK_END | ROOT | KEYED_HASH = 0x1B on every
    compression, counter = 0;
  - ``hash64`` = Compress(iv, msg64, block_len=64) truncated to 32B
    (blake3.cuh:145-149);
  - ``xor_hash`` = two Compress calls over 32B-padded (a, b) inputs with LSB
    domain separation, concatenated to 64B (blake3.cuh:160-171).

BLAKE3's compression is pure 32-bit add/xor/rotate — ideal VPU work. The
implementation is structure-of-arrays: 16 uint32 words each carrying the
full batch shape; the message permutation is a static reindex (no data
movement), and the 7 rounds are unrolled.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fss_tpu import block as blk

_IV0 = (np.uint32(0x6A09E667), np.uint32(0xBB67AE85),
        np.uint32(0x3C6EF372), np.uint32(0xA54FF53A))
FLAGS = np.uint32(0x1B)  # CHUNK_START | CHUNK_END | ROOT | KEYED_HASH

# Per-round message schedule: round r uses m[_SCHEDULE[r][i]] as the i-th
# message word, which is perm applied r times (blake3.cuh:53-62).
_PERM = (2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)


def _build_schedule():
    sched = [tuple(range(16))]
    for _ in range(6):
        prev = sched[-1]
        sched.append(tuple(prev[p] for p in _PERM))
    return tuple(sched)


_SCHEDULE = _build_schedule()


def _rotr(x, n: int):
    n = np.uint32(n)
    return (x >> n) | (x << np.uint32(32 - int(n)))


def _g(a, b, c, d, x, y):
    a = a + b + x
    d = _rotr(d ^ a, 16)
    c = c + d
    b = _rotr(b ^ c, 12)
    a = a + b + y
    d = _rotr(d ^ a, 8)
    c = c + d
    b = _rotr(b ^ c, 7)
    return a, b, c, d


_DIAG = ((0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14))


def _round(v, m):
    """One BLAKE3 round: column then diagonal mixes (blake3.cuh:64-75).

    v: list of 16 words; m: list of 16 message words for this round.
    """
    for i in range(4):
        v[i], v[i + 4], v[i + 8], v[i + 12] = _g(
            v[i], v[i + 4], v[i + 8], v[i + 12], m[2 * i], m[2 * i + 1])
    for i, (ia, ib, ic, id_) in enumerate(_DIAG):
        v[ia], v[ib], v[ic], v[id_] = _g(
            v[ia], v[ib], v[ic], v[id_], m[8 + 2 * i], m[9 + 2 * i])
    return v


def compress_words(h_words, m_words, block_len: int, flags=FLAGS,
                   unroll: bool = False):
    """BLAKE3 compression, SoA over any batch shape (blake3.cuh:100-125).

    h_words: 8 chaining-value words; m_words: 16 message words (uint32
    arrays, broadcastable batch shapes). counter is fixed at 0. Returns 16
    output words.

    Rolled by default: the 7 rounds run in a fori_loop with the message
    carried as one stacked [16, ...] array permuted per round — ~7x smaller
    HLO (XLA:CPU compile time of the unrolled form is pathological), same
    VPU work.
    """
    zero = jnp.zeros_like(m_words[0] + h_words[0])
    v = [zero + w for w in h_words]
    v += [zero + c for c in _IV0]
    v += [zero, zero, zero + np.uint32(block_len), zero + flags]

    if unroll:
        m = [zero + w for w in m_words]
        for r in range(7):
            s = _SCHEDULE[r]
            v = _round(v, [m[j] for j in s])
    else:
        m_arr = jnp.stack([zero + w for w in m_words])  # [16, ...]
        perm = jnp.asarray(np.array(_PERM, dtype=np.int32))

        def body(_, carry):
            v, m_arr = carry
            v = tuple(_round(list(v), [m_arr[j] for j in range(16)]))
            # Permuting after the last round is a no-op for v.
            return v, m_arr[perm]

        (v, _) = jax.lax.fori_loop(0, 7, body, (tuple(v), m_arr))
        v = list(v)

    out = [v[i] ^ v[i + 8] for i in range(8)]
    out += [v[8 + i] ^ h_words[i] for i in range(8)]
    return out


@dataclasses.dataclass(frozen=True)
class Blake3:
    """Keyed BLAKE3 over blocks; iv is the 32B key (8 uint32 words)."""

    iv: tuple  # 8 python ints / uint32

    def __post_init__(self):
        object.__setattr__(
            self, "iv",
            tuple(np.uint32(int(w) & 0xFFFFFFFF) for w in self.iv))
        assert len(self.iv) == 8

    def hash64(self, msg: jax.Array) -> jax.Array:
        """64B -> 32B: msg [..., 4, 4] blocks -> [..., 2, 4] (H' in VDPF)."""
        msg = jnp.asarray(msg, dtype=jnp.uint32)
        m_words = [msg[..., i // 4, i % 4] for i in range(16)]
        out = compress_words(self.iv, m_words, 64)
        return jnp.stack([
            blk.from_words(*out[0:4]), blk.from_words(*out[4:8])], axis=-2)

    def xor_hash(self, a: jax.Array, b: jax.Array) -> jax.Array:
        """(a, b) blocks [..., 4] -> [..., 4, 4] 64B digest (H in VDPF).

        Two 32B-padded compressions with a's LSB as domain separator
        (blake3.cuh:160-171).
        """
        a = jnp.asarray(a, dtype=jnp.uint32)
        b = jnp.asarray(b, dtype=jnp.uint32)
        zero = jnp.zeros_like(a[..., 0])
        a0 = blk.clear_lsb(a)
        m_lo = [a0[..., i] for i in range(4)] + [b[..., i] for i in range(4)]
        m_pad = [zero] * 8
        out0 = compress_words(self.iv, m_lo + m_pad, 32)
        a1 = blk.set_lsb(a, np.uint32(1))
        m_hi = [a1[..., i] for i in range(4)] + [b[..., i] for i in range(4)]
        out1 = compress_words(self.iv, m_hi + m_pad, 32)
        return jnp.stack([
            blk.from_words(*out0[0:4]), blk.from_words(*out0[4:8]),
            blk.from_words(*out1[0:4]), blk.from_words(*out1[4:8])], axis=-2)


def compress_reference(h8, m16, block_len: int, flags=0x1B) -> np.ndarray:
    """Pure-NumPy oracle of the compression for bit-exactness tests."""
    mask = 0xFFFFFFFF
    v = [int(w) & mask for w in h8]
    v += [int(c) for c in _IV0]
    v += [0, 0, int(block_len), int(flags)]
    m = [int(w) & mask for w in m16]

    def rotr(x, n):
        return ((x >> n) | (x << (32 - n))) & mask

    def g(ia, ib, ic, id_, x, y):
        v[ia] = (v[ia] + v[ib] + x) & mask
        v[id_] = rotr(v[id_] ^ v[ia], 16)
        v[ic] = (v[ic] + v[id_]) & mask
        v[ib] = rotr(v[ib] ^ v[ic], 12)
        v[ia] = (v[ia] + v[ib] + y) & mask
        v[id_] = rotr(v[id_] ^ v[ia], 8)
        v[ic] = (v[ic] + v[id_]) & mask
        v[ib] = rotr(v[ib] ^ v[ic], 7)

    for r in range(7):
        s = _SCHEDULE[r]
        for i in range(4):
            g(i, i + 4, i + 8, i + 12, m[s[2 * i]], m[s[2 * i + 1]])
        for i, (ia, ib, ic, id_) in enumerate(
                ((0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13),
                 (3, 4, 9, 14))):
            g(ia, ib, ic, id_, m[s[8 + 2 * i]], m[s[9 + 2 * i]])

    out = [(v[i] ^ v[i + 8]) for i in range(8)]
    out += [(v[8 + i] ^ (int(h8[i]) & mask)) for i in range(8)]
    return np.array(out, dtype=np.uint32)
