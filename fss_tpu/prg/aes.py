"""AES-128 Matyas-Meyer-Oseas PRG: out_i = AES_{k_i}(seed) ^ seed.

One TPU-native implementation covering all three reference AES-MMO PRGs
bit-exactly (they compute the same function through different backends):
  - prg/aes128_mmo.cuh      (OpenSSL EVP, host-only)
  - prg/aes128_mmo_raw.cuh  (x86 AES-NI, host-only)
  - prg/aes128_mmo_soft.cuh (T-table software AES, host+device)

Design: key expansion runs once per key in NumPy at construction (keys are
static config, exactly like the reference pre-expands round keys,
aes128_mmo_raw.cuh:46-68). The batched encrypt follows the T-table
formulation (aes128_mmo_soft.cuh:124-174): state = 4 big-endian uint32
words per instance, 9 Te0-table rounds + a final S-box round. Table lookups
are `jnp.take` gathers into 256-entry VMEM-resident tables — the batch axis
is the vector axis, so each round is 16 batched gathers + XORs.

Byte-order note: the reference's 16-byte block is the int4's memory bytes
(lane 0 first, each lane little-endian); LoadBE32 of those bytes equals
byte-swapped lanes (aes128_mmo_soft.cuh:113-122).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fss_tpu import block as blk

# AES S-box (FIPS-197).
SBOX = np.array([
    0x63, 0x7c, 0x77, 0x7b, 0xf2, 0x6b, 0x6f, 0xc5, 0x30, 0x01, 0x67, 0x2b,
    0xfe, 0xd7, 0xab, 0x76, 0xca, 0x82, 0xc9, 0x7d, 0xfa, 0x59, 0x47, 0xf0,
    0xad, 0xd4, 0xa2, 0xaf, 0x9c, 0xa4, 0x72, 0xc0, 0xb7, 0xfd, 0x93, 0x26,
    0x36, 0x3f, 0xf7, 0xcc, 0x34, 0xa5, 0xe5, 0xf1, 0x71, 0xd8, 0x31, 0x15,
    0x04, 0xc7, 0x23, 0xc3, 0x18, 0x96, 0x05, 0x9a, 0x07, 0x12, 0x80, 0xe2,
    0xeb, 0x27, 0xb2, 0x75, 0x09, 0x83, 0x2c, 0x1a, 0x1b, 0x6e, 0x5a, 0xa0,
    0x52, 0x3b, 0xd6, 0xb3, 0x29, 0xe3, 0x2f, 0x84, 0x53, 0xd1, 0x00, 0xed,
    0x20, 0xfc, 0xb1, 0x5b, 0x6a, 0xcb, 0xbe, 0x39, 0x4a, 0x4c, 0x58, 0xcf,
    0xd0, 0xef, 0xaa, 0xfb, 0x43, 0x4d, 0x33, 0x85, 0x45, 0xf9, 0x02, 0x7f,
    0x50, 0x3c, 0x9f, 0xa8, 0x51, 0xa3, 0x40, 0x8f, 0x92, 0x9d, 0x38, 0xf5,
    0xbc, 0xb6, 0xda, 0x21, 0x10, 0xff, 0xf3, 0xd2, 0xcd, 0x0c, 0x13, 0xec,
    0x5f, 0x97, 0x44, 0x17, 0xc4, 0xa7, 0x7e, 0x3d, 0x64, 0x5d, 0x19, 0x73,
    0x60, 0x81, 0x4f, 0xdc, 0x22, 0x2a, 0x90, 0x88, 0x46, 0xee, 0xb8, 0x14,
    0xde, 0x5e, 0x0b, 0xdb, 0xe0, 0x32, 0x3a, 0x0a, 0x49, 0x06, 0x24, 0x5c,
    0xc2, 0xd3, 0xac, 0x62, 0x91, 0x95, 0xe4, 0x79, 0xe7, 0xc8, 0x37, 0x6d,
    0x8d, 0xd5, 0x4e, 0xa9, 0x6c, 0x56, 0xf4, 0xea, 0x65, 0x7a, 0xae, 0x08,
    0xba, 0x78, 0x25, 0x2e, 0x1c, 0xa6, 0xb4, 0xc6, 0xe8, 0xdd, 0x74, 0x1f,
    0x4b, 0xbd, 0x8b, 0x8a, 0x70, 0x3e, 0xb5, 0x66, 0x48, 0x03, 0xf6, 0x0e,
    0x61, 0x35, 0x57, 0xb9, 0x86, 0xc1, 0x1d, 0x9e, 0xe1, 0xf8, 0x98, 0x11,
    0x69, 0xd9, 0x8e, 0x94, 0x9b, 0x1e, 0x87, 0xe9, 0xce, 0x55, 0x28, 0xdf,
    0x8c, 0xa1, 0x89, 0x0d, 0xbf, 0xe6, 0x42, 0x68, 0x41, 0x99, 0x2d, 0x0f,
    0xb0, 0x54, 0xbb, 0x16,
], dtype=np.uint8)

_RCON = np.array([0x8d, 0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80,
                  0x1b, 0x36], dtype=np.uint8)


def _te0_table() -> np.ndarray:
    """Te0[i] = MixColumn-weighted S-box word (aes128_mmo_soft.cuh:55-60)."""
    s = SBOX.astype(np.uint32)
    x2 = ((s << 1) ^ (((s >> 7) & 1) * 0x1B)) & 0xFF
    x3 = s ^ x2
    return ((x2 << 24) | (s << 16) | (s << 8) | x3).astype(np.uint32)


TE0 = _te0_table()


def key_expansion(key16: bytes | np.ndarray) -> np.ndarray:
    """AES-128 key schedule -> [11, 4] big-endian uint32 round-key words."""
    key = np.frombuffer(bytes(key16), dtype=np.uint8).copy() \
        if isinstance(key16, (bytes, bytearray)) \
        else np.asarray(key16, dtype=np.uint8).copy()
    assert key.shape == (16,)
    rk = np.zeros(176, dtype=np.uint8)
    rk[:16] = key
    for i in range(4, 44):
        t = rk[(i - 1) * 4:(i - 1) * 4 + 4].copy()
        if i % 4 == 0:
            t = np.array([SBOX[t[1]], SBOX[t[2]], SBOX[t[3]], SBOX[t[0]]],
                         dtype=np.uint8)
            t[0] ^= _RCON[i // 4]
        rk[i * 4:i * 4 + 4] = rk[(i - 4) * 4:(i - 4) * 4 + 4] ^ t
    # Big-endian words, matching LoadBE32 over round-key bytes.
    be = rk.reshape(44, 4).astype(np.uint32)
    return (be[:, 0] << 24 | be[:, 1] << 16 | be[:, 2] << 8
            | be[:, 3]).reshape(11, 4)


def _bswap32(x):
    return ((x >> np.uint32(24))
            | ((x >> np.uint32(8)) & np.uint32(0xFF00))
            | ((x << np.uint32(8)) & np.uint32(0xFF0000))
            | (x << np.uint32(24)))


def _rot8(x):
    return (x << np.uint32(24)) | (x >> np.uint32(8))


def _rot16(x):
    return (x << np.uint32(16)) | (x >> np.uint32(16))


def _rot24(x):
    return (x << np.uint32(8)) | (x >> np.uint32(24))


def aes128_encrypt_words(round_keys: np.ndarray, w0, w1, w2, w3,
                         unroll: bool = False):
    """Batched AES-128 ECB over big-endian state words.

    round_keys: [11, 4] numpy uint32 (static). w0..w3: uint32 arrays of any
    batch shape (big-endian words of the 16-byte block). Returns 4 words.
    """
    te0 = jnp.asarray(TE0)
    sbox = jnp.asarray(SBOX.astype(np.uint32))
    rks = jnp.asarray(round_keys.astype(np.uint32))  # [11, 4]

    s0 = w0 ^ np.uint32(round_keys[0, 0])
    s1 = w1 ^ np.uint32(round_keys[0, 1])
    s2 = w2 ^ np.uint32(round_keys[0, 2])
    s3 = w3 ^ np.uint32(round_keys[0, 3])

    def lut(tab, x):
        return jnp.take(tab, x.astype(jnp.int32), axis=0)

    def t_round(s0, s1, s2, s3, rk):
        b = np.uint32(0xFF)
        t0 = (lut(te0, s0 >> np.uint32(24))
              ^ _rot8(lut(te0, (s1 >> np.uint32(16)) & b))
              ^ _rot16(lut(te0, (s2 >> np.uint32(8)) & b))
              ^ _rot24(lut(te0, s3 & b)) ^ rk[0])
        t1 = (lut(te0, s1 >> np.uint32(24))
              ^ _rot8(lut(te0, (s2 >> np.uint32(16)) & b))
              ^ _rot16(lut(te0, (s3 >> np.uint32(8)) & b))
              ^ _rot24(lut(te0, s0 & b)) ^ rk[1])
        t2 = (lut(te0, s2 >> np.uint32(24))
              ^ _rot8(lut(te0, (s3 >> np.uint32(16)) & b))
              ^ _rot16(lut(te0, (s0 >> np.uint32(8)) & b))
              ^ _rot24(lut(te0, s1 & b)) ^ rk[2])
        t3 = (lut(te0, s3 >> np.uint32(24))
              ^ _rot8(lut(te0, (s0 >> np.uint32(16)) & b))
              ^ _rot16(lut(te0, (s1 >> np.uint32(8)) & b))
              ^ _rot24(lut(te0, s2 & b)) ^ rk[3])
        return t0, t1, t2, t3

    if unroll:
        for r in range(1, 10):
            s0, s1, s2, s3 = t_round(s0, s1, s2, s3, rks[r])
    else:
        def body(r, s):
            return t_round(*s, jax.lax.dynamic_index_in_dim(
                rks, r, 0, keepdims=False))
        s0, s1, s2, s3 = jax.lax.fori_loop(1, 10, body, (s0, s1, s2, s3))

    # Final round: SubBytes + ShiftRows + AddRoundKey.
    b = np.uint32(0xFF)

    def sub_shift(a, bw, c, d):
        return ((lut(sbox, a >> np.uint32(24)) << np.uint32(24))
                | (lut(sbox, (bw >> np.uint32(16)) & b) << np.uint32(16))
                | (lut(sbox, (c >> np.uint32(8)) & b) << np.uint32(8))
                | lut(sbox, d & b))

    o0 = sub_shift(s0, s1, s2, s3) ^ np.uint32(round_keys[10, 0])
    o1 = sub_shift(s1, s2, s3, s0) ^ np.uint32(round_keys[10, 1])
    o2 = sub_shift(s2, s3, s0, s1) ^ np.uint32(round_keys[10, 2])
    o3 = sub_shift(s3, s0, s1, s2) ^ np.uint32(round_keys[10, 3])
    return o0, o1, o2, o3


@dataclasses.dataclass(frozen=True)
class Aes128Mmo:
    """AES-128-MMO PRG over [..., 4] uint32 seed blocks.

    ``keys`` is a tuple of ``mul`` 16-byte AES keys (bytes). Matches
    Aes128Mmo / Aes128MmoRaw / Aes128Soft in the reference bit-exactly.

    ``backend``: "auto" picks the gather-free bitsliced circuit
    (prg/aes_bitsliced.py) for batches >= 256 seeds — the only AES form
    that runs at speed on a TPU — and the T-table form otherwise;
    "table" / "bitsliced" force a path.
    """

    mul: int
    keys: tuple  # mul x bytes(16)
    unroll: bool = False
    backend: str = "auto"

    BITSLICE_MIN_BATCH = 256

    def __post_init__(self):
        if self.mul not in (1, 2, 4):
            raise ValueError(f"mul must be 1, 2, or 4, got {self.mul}")
        if self.backend not in ("auto", "table", "bitsliced"):
            raise ValueError(f"unknown backend {self.backend!r}")
        keys = tuple(bytes(k) for k in self.keys)
        if len(keys) != self.mul or any(len(k) != 16 for k in keys):
            raise ValueError(f"need {self.mul} 16-byte keys")
        object.__setattr__(self, "keys", keys)
        object.__setattr__(
            self, "_round_keys",
            tuple(key_expansion(k) for k in keys))

    def _call_table(self, seed: jax.Array):
        lanes = blk.to_words(seed)
        # Block bytes -> big-endian state words (lane i byte-swapped).
        ws = tuple(_bswap32(w) for w in lanes)
        outs = []
        for rk in self._round_keys:
            o = aes128_encrypt_words(rk, *ws, unroll=self.unroll)
            out_lanes = tuple(_bswap32(x) for x in o)
            outs.append(blk.from_words(*out_lanes) ^ seed)
        return tuple(outs)

    def _call_bitsliced(self, seed: jax.Array):
        from fss_tpu.prg import aes_bitsliced as bs

        shape = seed.shape
        flat = seed.reshape(-1, 4)
        outs = []
        for key in self.keys:
            enc = bs.aes128_encrypt_blocks(key, flat)
            outs.append((enc ^ flat).reshape(shape))
        return tuple(outs)

    def __call__(self, seed: jax.Array):
        seed = jnp.asarray(seed, dtype=jnp.uint32)
        n = int(np.prod(seed.shape[:-1])) if seed.ndim > 1 else 1
        if self.backend == "bitsliced" or (
                self.backend == "auto" and n >= self.BITSLICE_MIN_BATCH):
            return self._call_bitsliced(seed)
        return self._call_table(seed)


def aes128_encrypt_reference(key16: bytes, block16: bytes) -> bytes:
    """Pure-NumPy AES-128 ECB oracle for bit-exactness tests."""
    rks = key_expansion(key16)
    b = np.frombuffer(block16, dtype=np.uint8).astype(np.uint32)
    w = [(int(b[4 * i]) << 24) | (int(b[4 * i + 1]) << 16)
         | (int(b[4 * i + 2]) << 8) | int(b[4 * i + 3]) for i in range(4)]
    mask = 0xFFFFFFFF
    s = [w[i] ^ int(rks[0, i]) for i in range(4)]

    def te0(i):
        return int(TE0[i])

    def rot(x, n):
        return ((x << (32 - n)) | (x >> n)) & mask

    for r in range(1, 10):
        t = []
        for i in range(4):
            a, bb, c, d = s[i], s[(i + 1) % 4], s[(i + 2) % 4], s[(i + 3) % 4]
            t.append((te0(a >> 24) ^ rot(te0((bb >> 16) & 0xFF), 8)
                      ^ rot(te0((c >> 8) & 0xFF), 16) ^ rot(te0(d & 0xFF), 24)
                      ^ int(rks[r, i])) & mask)
        s = t
    o = []
    for i in range(4):
        a, bb, c, d = s[i], s[(i + 1) % 4], s[(i + 2) % 4], s[(i + 3) % 4]
        o.append(((int(SBOX[a >> 24]) << 24)
                  | (int(SBOX[(bb >> 16) & 0xFF]) << 16)
                  | (int(SBOX[(c >> 8) & 0xFF]) << 8)
                  | int(SBOX[d & 0xFF])) ^ int(rks[10, i]))
    out = bytearray(16)
    for i in range(4):
        out[4 * i] = (o[i] >> 24) & 0xFF
        out[4 * i + 1] = (o[i] >> 16) & 0xFF
        out[4 * i + 2] = (o[i] >> 8) & 0xFF
        out[4 * i + 3] = o[i] & 0xFF
    return bytes(out)
