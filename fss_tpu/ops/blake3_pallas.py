"""Pallas TPU kernels for the keyed BLAKE3 hash pair (hash64 / xor_hash).

SoA [rows, 128] word tiles, 7 rounds fully unrolled in-kernel — the same
treatment the ChaCha tree kernels get. Used by the VDPF/VDMPF fast paths
(per-point hashes over full domains and Merkle-fold levels), where the
rolled XLA BLAKE3 is memory-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fss_tpu.hash.blake3 import _IV0, _SCHEDULE, FLAGS

LANES = 128
DEFAULT_BLOCK_ROWS = 32
_DIAG = ((0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14))
_ONE = np.uint32(1)
_NOTONE = np.uint32(0xFFFFFFFE)


def _rotr(x, n: int):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


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


def _compress(iv, m, block_len: int, unroll: bool, perm=None):
    """iv: 8 uint32 consts; m: 16 word arrays. Returns first 8 out words.

    ``perm`` (traced [16] i32, the round-1 schedule) is required when
    unroll=False — Pallas kernels cannot capture constant arrays."""
    zero = jnp.zeros_like(m[0])
    v = [zero + np.uint32(w) for w in iv]
    v += [zero + np.uint32(c) for c in _IV0]
    v += [zero, zero, zero + np.uint32(block_len), zero + FLAGS]

    def rnd(v, msched):
        for i in range(4):
            v[i], v[i + 4], v[i + 8], v[i + 12] = _g(
                v[i], v[i + 4], v[i + 8], v[i + 12],
                msched[2 * i], msched[2 * i + 1])
        for i, (ia, ib, ic, id_) in enumerate(_DIAG):
            v[ia], v[ib], v[ic], v[id_] = _g(
                v[ia], v[ib], v[ic], v[id_],
                msched[8 + 2 * i], msched[9 + 2 * i])
        return v

    if unroll:
        for r in range(7):
            s = _SCHEDULE[r]
            v = rnd(v, [m[j] for j in s])
    else:
        m_arr = jnp.stack(m)

        def body(_, carry):
            v, m_arr = carry
            v = tuple(rnd(list(v), [m_arr[j] for j in range(16)]))
            return v, m_arr[perm]

        v, _ = jax.lax.fori_loop(0, 7, body, (tuple(v), m_arr))
        v = list(v)
    return [v[i] ^ v[i + 8] for i in range(8)]


def _make_xor_hash_kernel(iv, unroll: bool):
    def kernel(a_ref, b_ref, p_ref, o_ref):
        zero = jnp.zeros_like(a_ref[0])
        perm = None if unroll else p_ref[0, :]
        bw = [b_ref[i] for i in range(4)]
        a3 = a_ref[3]
        for lsb in (0, 1):
            a_l = [a_ref[0], a_ref[1], a_ref[2],
                   (a3 & _NOTONE) | np.uint32(lsb)]
            m = a_l + bw + [zero] * 8
            out = _compress(iv, m, 32, unroll, perm)
            for i in range(8):
                o_ref[8 * lsb + i] = out[i]

    return kernel


def _make_hash64_kernel(iv, unroll: bool):
    def kernel(m_ref, p_ref, o_ref):
        perm = None if unroll else p_ref[0, :]
        m = [m_ref[i] for i in range(16)]
        out = _compress(iv, m, 64, unroll, perm)
        for i in range(8):
            o_ref[i] = out[i]

    return kernel


def _perm_arr():
    return jnp.asarray(np.array(_SCHEDULE[1], dtype=np.int32))[None, :]


from fss_tpu.ops.planes import tile_blocks as _tile  # noqa: E402
from fss_tpu.ops.planes import untile_blocks as _untile  # noqa: E402


@functools.partial(jax.jit,
                   static_argnames=("iv", "block_rows", "interpret"))
def xor_hash_planes(a4, b4, iv, block_rows: int = DEFAULT_BLOCK_ROWS,
                    interpret: bool = False):
    """Batched XorHash on ALREADY-TILED word planes.

    a4, b4: [4, T, 128] uint32 planes (the tree kernels' native SoA
    output layout — feeding them here directly skips the SoA->row->SoA
    transpose round trip that cost VDPF eval ~2x). Returns pi planes
    [16, T, 128]; `_untile(out, n, 4)` recovers [N, 4, 4] rows."""
    nrows = a4.shape[1]
    # Callers tile with power-of-two row blocks; halve down to a divisor
    # so any upstream pack granularity (e.g. a small test batch) works.
    while nrows % block_rows:
        block_rows //= 2
    grid = (nrows // block_rows,)
    kern = _make_xor_hash_kernel(tuple(int(w) for w in iv), not interpret)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((1, 16), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((16, block_rows, LANES),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, nrows, LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(a4, b4, _perm_arr())


def xor_hash_batch(a, b, iv, block_rows: int = DEFAULT_BLOCK_ROWS,
                   interpret: bool = False):
    """Batched XorHash: a, b [N, 4] -> [N, 4, 4] (blake3.cuh:160-171)."""
    a4, n = _tile(a[:, None, :], block_rows)
    b4, _ = _tile(b[:, None, :], block_rows)
    out = xor_hash_planes(a4, b4, iv, block_rows=block_rows,
                          interpret=interpret)
    return _untile(out, n, 4)


@functools.partial(jax.jit,
                   static_argnames=("iv", "block_rows", "interpret"))
def hash64_batch(msg, iv, block_rows: int = DEFAULT_BLOCK_ROWS,
                 interpret: bool = False):
    """Batched H': msg [N, 4, 4] -> [N, 2, 4] (blake3.cuh:145-149)."""
    m16, n = _tile(msg, block_rows)
    nrows = m16.shape[1]
    grid = (nrows // block_rows,)
    kern = _make_hash64_kernel(tuple(int(w) for w in iv), not interpret)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((16, block_rows, LANES),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 16), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((8, block_rows, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, nrows, LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(m16, _perm_arr())
    return _untile(out, n, 2)
