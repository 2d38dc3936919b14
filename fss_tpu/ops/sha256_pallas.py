"""Pallas TPU kernel for the keyed SHA-256 XorHash (hash/sha256.py).

Same design as ops/blake3_pallas: the batch rides [rows, 128] uint32
word tiles, the 64-round compression runs entirely in vregs, and the
K-constant table arrives as an SMEM input in rolled mode (kernels must
not close over host arrays). The reference's SHA-256 is OpenSSL EVP and
host-only (its device code __trap()s, hash/sha256.cuh:43-58); here the
VDPF SHA-256 config runs fused on-device.

Bit-exact with hash/sha256.Sha256.xor_hash (byte-swaps at the lane
boundary included); verified by tests/test_sha256.py golden vectors via
the interpret-mode path and by scripts/verify_tpu.py's hash-kernel
family on-chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fss_tpu.hash.sha256 import _H0, _K, bswap32

LANES = 128
DEFAULT_BLOCK_ROWS = 32
_NOTONE = np.uint32(0xFFFFFFFE)


def _rotr(x, n: int):
    n = np.uint32(n)
    return (x >> n) | (x << np.uint32(32 - int(n)))


def _compress(m, k_ref, unroll: bool):
    """One SHA-256 compression of 16 message words (big-endian, [rows,
    128] tiles); returns the 8 digest words (H0-seeded)."""
    zero = jnp.zeros_like(m[0])
    init = tuple(zero + np.uint32(h) for h in _H0)

    def round_(t, a, b, c, d, e, f, g, h, wt, kt):
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + kt + wt
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        return (t1 + s0 + maj, a, b, c, d + t1, e, f, g)

    if unroll:
        w = list(m)
        st = init
        for t in range(64):
            if t >= 16:
                w1, w9, w14 = w[t - 15], w[t - 7], w[t - 2]
                ls0 = _rotr(w1, 7) ^ _rotr(w1, 18) ^ (w1 >> np.uint32(3))
                ls1 = (_rotr(w14, 17) ^ _rotr(w14, 19)
                       ^ (w14 >> np.uint32(10)))
                w.append(w[t - 16] + ls0 + w9 + ls1)
            st = round_(t, *st, w[t], np.uint32(_K[t]))
        return tuple(i + s for i, s in zip(init, st))

    def body(t, carry):
        st = carry[:8]
        w = carry[8:]
        kt = k_ref[0, t].astype(jnp.uint32)  # SMEM table is int32
        st = round_(t, *st, w[0], kt)
        ls0 = _rotr(w[1], 7) ^ _rotr(w[1], 18) ^ (w[1] >> np.uint32(3))
        ls1 = (_rotr(w[14], 17) ^ _rotr(w[14], 19)
               ^ (w[14] >> np.uint32(10)))
        w_new = w[0] + ls0 + w[9] + ls1
        return (*st, *w[1:], w_new)

    out = jax.lax.fori_loop(0, 64, body, (*init, *m))
    return tuple(i + s for i, s in zip(init, out[:8]))


def _make_xor_hash_kernel(key, unroll: bool):
    """key: 4 little-endian uint32 lanes (static). One 48-byte block per
    lsb: key || SetLsb(a, lsb) || b || pad (sha256.cuh:69-89)."""
    kw = tuple(np.uint32(int(bswap32(np.uint32(k)))) for k in key)

    def kernel(a_ref, b_ref, k_ref, o_ref):
        zero = jnp.zeros_like(a_ref[0])
        aw = [a_ref[0], a_ref[1], a_ref[2], a_ref[3]]
        bw = [bswap32(b_ref[i]) for i in range(4)]
        pad = [zero + np.uint32(0x80000000), zero, zero,
               zero + np.uint32(384)]
        for lsb in (0, 1):
            a3 = (aw[3] & _NOTONE) | np.uint32(lsb)
            m = ([zero + k for k in kw]
                 + [bswap32(aw[0]), bswap32(aw[1]), bswap32(aw[2]),
                    bswap32(a3)]
                 + bw + pad)
            d = _compress(m, k_ref, unroll)
            for i in range(8):
                o_ref[8 * lsb + i] = bswap32(d[i])

    return kernel


def _k_arr():
    return jnp.asarray(_K.astype(np.int32))[None, :]


from fss_tpu.ops.planes import untile_blocks as _untile  # noqa: E402


def _tile(words, block_rows):
    """[N, 4] -> [4, T, 128] word planes + N (planes.tile_blocks on
    single-block rows)."""
    from fss_tpu.ops.planes import tile_blocks
    return tile_blocks(words[:, None, :], block_rows)


def xor_hash_planes(a4, b4, key, block_rows: int = DEFAULT_BLOCK_ROWS,
                    interpret: bool = False):
    """Batched keyed-SHA-256 XorHash on tiled word planes: a4, b4
    [4, T, 128] -> pi planes [16, T, 128] (little-endian lanes, same
    row order as Sha256.xor_hash's [..., 4, 4])."""
    nrows = a4.shape[1]
    while nrows % block_rows:
        block_rows //= 2
    grid = (nrows // block_rows,)
    kern = _make_xor_hash_kernel(tuple(int(w) for w in key),
                                 not interpret)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((1, 64), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((16, block_rows, LANES),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, nrows, LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(a4, b4, _k_arr())


@functools.partial(jax.jit,
                   static_argnames=("key", "block_rows", "interpret"))
def xor_hash_batch(a, b, key, block_rows: int = DEFAULT_BLOCK_ROWS,
                   interpret: bool = False):
    """Batched XorHash: a, b [N, 4] -> [N, 4, 4], bit-exact with
    Sha256(key).xor_hash."""
    a4, n = _tile(jnp.asarray(a, dtype=jnp.uint32), block_rows)
    b4, _ = _tile(jnp.asarray(b, dtype=jnp.uint32), block_rows)
    out = xor_hash_planes(a4, b4, key, block_rows=block_rows,
                          interpret=interpret)
    return _untile(out, n, 4)


def sha256_key_of(fn):
    """The Sha256 key behind a bound xor_hash method, or None (the
    kernel-dispatch analog of eval_all_pallas._blake3_iv_of)."""
    from fss_tpu.hash.sha256 import Sha256
    obj = getattr(fn, "__self__", None)
    if isinstance(obj, Sha256):
        return tuple(int(w) for w in obj.key)
    return None
