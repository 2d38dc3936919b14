"""Pallas TPU kernel for batched Half-Tree DPF point evaluation.

Fuses the n-1 CCR-hash levels plus the last-level conversion
(half_tree_dpf.cuh:182-226) in one kernel: each level is a single ChaCha
mul=1 block on hash_key ^ node, an XOR fold of (x_bit ? node : 0) and
(t ? cw : 0), all on SoA [rows, 128] word tiles. Outputs the corrected
(high, low) leaf pair; group conversion stays outside (generic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fss_tpu.ops._chacha_core import NOTONE, ONE, chacha_block

LANES = 128
DEFAULT_BLOCK_ROWS = 32


def _make_kernel(in_bits: int, party: int, nonce, rounds: int, hash_key):
    hk = tuple(np.uint32(int(k) & 0xFFFFFFFF) for k in hash_key)
    wide = in_bits > 32  # x as 4 packed uint32 lanes

    def kernel(s_ref, c_ref, x_ref, ho_ref, lo_ref):
        n0 = s_ref[0]
        n1 = s_ref[1]
        n2 = s_ref[2]
        n3 = (s_ref[3] & NOTONE) | np.uint32(party)
        x = None if wide else x_ref[:]

        def level(i, carry):
            n0, n1, n2, n3 = carry
            t = n3 & ONE
            (h0, h1, h2, h3), = chacha_block(
                n0 ^ hk[0], n1 ^ hk[1], n2 ^ hk[2], n3 ^ hk[3],
                nonce, 1, rounds)
            pos = np.uint32(in_bits - 1) - i.astype(jnp.uint32)
            if wide:
                xb = (x_ref[pos >> np.uint32(5)]
                      >> (pos & np.uint32(31))) & ONE
            else:
                xb = (x >> pos) & ONE
            # 0/1 -> all-zeros/all-ones arithmetic masks (no vselect).
            xm = np.uint32(0) - xb
            tm = np.uint32(0) - t
            cw0 = c_ref[i, 0]
            cw1 = c_ref[i, 1]
            cw2 = c_ref[i, 2]
            cw3 = c_ref[i, 3]
            n0 = h0 ^ (n0 & xm) ^ (cw0 & tm)
            n1 = h1 ^ (n1 & xm) ^ (cw1 & tm)
            n2 = h2 ^ (n2 & xm) ^ (cw2 & tm)
            n3 = h3 ^ (n3 & xm) ^ (cw3 & tm)
            return (n0, n1, n2, n3)

        n0, n1, n2, n3 = jax.lax.fori_loop(0, in_bits - 1, level,
                                           (n0, n1, n2, n3))

        # Last level (half_tree_dpf.cuh:199-225).
        t = n3 & ONE
        x_n = (x_ref[0] if wide else x) & ONE
        n3s = (n3 & NOTONE) | x_n
        (h0, h1, h2, h3), = chacha_block(
            n0 ^ hk[0], n1 ^ hk[1], n2 ^ hk[2], n3s ^ hk[3],
            nonce, 1, rounds)
        last0 = c_ref[in_bits - 1, 0]
        last1 = c_ref[in_bits - 1, 1]
        last2 = c_ref[in_bits - 1, 2]
        last3 = c_ref[in_bits - 1, 3]
        last4 = c_ref[in_bits - 1, 4]
        lcw_xn = (last3 & ONE) ^ (x_n & ((last3 ^ last4) & ONE))
        tm = np.uint32(0) - t
        low = (h3 & ONE) ^ (t & lcw_xn)
        ho_ref[0] = h0 ^ (last0 & tm)
        ho_ref[1] = h1 ^ (last1 & tm)
        ho_ref[2] = h2 ^ (last2 & tm)
        ho_ref[3] = (h3 & NOTONE) ^ (last3 & NOTONE & tm)
        lo_ref[:] = low

    return kernel


def pack_keys(s0: jax.Array, cws: jax.Array, ocw: jax.Array, xs: jax.Array,
              in_bits: int, block_rows: int = DEFAULT_BLOCK_ROWS):
    """Stage per-instance Half-Tree keys into the SoA device layout."""
    B = xs.shape[0]
    tile = block_rows * LANES
    Bp = ((B + tile - 1) // tile) * tile
    T = Bp // LANES

    def padb(a):
        return jnp.pad(a, [(0, Bp - B)] + [(0, 0)] * (a.ndim - 1))

    seeds4 = jnp.transpose(padb(s0), (1, 0)).reshape(4, T, LANES)
    cws_t = jnp.transpose(padb(cws), (1, 2, 0)).reshape(in_bits, 8, T,
                                                        LANES)
    xsp = padb(jnp.asarray(xs, dtype=jnp.uint32))
    if xsp.ndim == 2:  # packed lanes (in_bits > 32)
        xs2 = jnp.transpose(xsp, (1, 0)).reshape(4, T, LANES)
    else:
        xs2 = xsp.reshape(T, LANES)
    return seeds4, cws_t, xs2, ocw, B


@functools.partial(jax.jit,
                   static_argnames=("in_bits", "party", "nonce",
                                    "hash_key", "rounds", "block_rows",
                                    "interpret"))
def eval_packed(seeds4, cws_t, xs2, in_bits: int, party: int, nonce,
                hash_key, rounds: int = 20,
                block_rows: int = DEFAULT_BLOCK_ROWS,
                interpret: bool = False):
    nrows = seeds4.shape[1]
    # Same wide-domain VMEM clamp as dpf_pallas.eval_packed (16.78 MB
    # cw block at in_bits=128 / block_rows=32 > Mosaic's 16 MB budget).
    from fss_tpu.ops import dpf_pallas as _dpfk
    block_rows = _dpfk.clamp_block_rows(in_bits, block_rows)
    assert nrows % block_rows == 0
    grid = (nrows // block_rows,)
    nonce = tuple(np.uint32(int(n) & 0xFFFFFFFF) for n in nonce)
    kern = _make_kernel(in_bits, party, nonce, rounds, hash_key)
    x_spec = (pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
              if in_bits > 32 else
              pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                           memory_space=pltpu.VMEM))
    ho, lo = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_bits, 8, block_rows, LANES),
                         lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM),
            x_spec,
        ],
        out_specs=[
            pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, nrows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nrows, LANES), jnp.uint32),
        ],
        # Wide-domain scoped-VMEM raise (see dpf_pallas.eval_packed:
        # the identical cw-block shape is 16.2 MB + stack at
        # in_bits=128, over Mosaic's 16 MB default).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=(32 * 2**20 if in_bits > 64 else None)),
        interpret=interpret,
    )(seeds4, cws_t, xs2)
    return ho, lo


def finalize(group, party: int, ho, lo, ocw: jax.Array,
             batch: int) -> jax.Array:
    """Group-convert (high, low) leaves to [B, 4] shares
    (half_tree_dpf.cuh:218-225)."""
    high = jnp.transpose(ho.reshape(4, -1), (1, 0))[:batch]
    low = lo.reshape(-1)[:batch]
    y = group.from_block(high)
    oc = group.from_block(jnp.broadcast_to(ocw, high.shape))
    y = jnp.where(low.astype(jnp.bool_)[:, None], group.add(y, oc), y)
    if party:
        y = group.neg(y)
    return group.into_block(y)


def eval_points(prg_nonce, group, in_bits: int, party: int, hash_key,
                s0: jax.Array, cws: jax.Array, ocw: jax.Array,
                xs: jax.Array, rounds: int = 20,
                block_rows: int = DEFAULT_BLOCK_ROWS,
                interpret: bool = False) -> jax.Array:
    hk = tuple(int(v) for v in np.asarray(hash_key, dtype=np.uint32))
    seeds4, cws_t, xs2, ocw, B = pack_keys(s0, cws, ocw, xs, in_bits,
                                           block_rows)
    ho, lo = eval_packed(seeds4, cws_t, xs2, in_bits=in_bits, party=party,
                         nonce=tuple(prg_nonce), hash_key=hk,
                         rounds=rounds, block_rows=block_rows,
                         interpret=interpret)
    return finalize(group, party, ho, lo, ocw, B)


# ---------------------------------------------------------------------------
# Fused batched Gen kernel (half_tree_dpf.cuh:68-169): both parties' CCR
# walks in-kernel, emitting the [in_bits, 5] cw rows plus the corrected
# alpha-direction leaves; the group-typed ocw is one elementwise pass
# outside (gen_finalize), keeping the kernel group-agnostic.
# ---------------------------------------------------------------------------


def _make_gen_kernel(in_bits: int, nonce, rounds: int, hash_key,
                     chacha_unroll: bool = True):
    hk = tuple(np.uint32(int(k) & 0xFFFFFFFF) for k in hash_key)

    def kernel(s_ref, a_ref, c_ref, l0_ref, l1_ref):
        n0 = [s_ref[i] for i in range(4)]
        n1 = [s_ref[4 + i] for i in range(4)]
        n0[3] &= NOTONE
        n1[3] = n1[3] | ONE
        a = a_ref[:]
        zero = jnp.zeros_like(a)

        def hashv(w):
            (h,) = chacha_block(w[0] ^ hk[0], w[1] ^ hk[1], w[2] ^ hk[2],
                                w[3] ^ hk[3], nonce, 1, rounds,
                                unroll=chacha_unroll)
            return h

        def level(i, carry):
            n0 = carry[0:4]
            n1 = carry[4:8]
            h0 = hashv(n0)
            h1 = hashv(n1)
            shift = np.uint32(in_bits - 1) - i.astype(jnp.uint32)
            ab = (a >> shift) & ONE
            nam = zero - (ab ^ ONE)  # mask: !a_bit
            cw = tuple(h0w ^ h1w ^ ((n0w ^ n1w) & nam)
                       for h0w, h1w, n0w, n1w in zip(h0, h1, n0, n1))
            c_ref[i, 0] = cw[0]
            c_ref[i, 1] = cw[1]
            c_ref[i, 2] = cw[2]
            c_ref[i, 3] = cw[3]
            c_ref[i, 4] = zero
            am = zero - ab
            t0m = zero - (n0[3] & ONE)
            t1m = zero - (n1[3] & ONE)
            n0n = tuple(hw ^ (nw & am) ^ (cww & t0m)
                        for hw, nw, cww in zip(h0, n0, cw))
            n1n = tuple(hw ^ (nw & am) ^ (cww & t1m)
                        for hw, nw, cww in zip(h1, n1, cw))
            return (*n0n, *n1n)

        out = jax.lax.fori_loop(0, in_bits - 1, level, (*n0, *n1))
        n0 = out[0:4]
        n1 = out[4:8]

        # Last level (half_tree_dpf.cuh:109-169): 4 sigma-hashes.
        a_n = a & ONE
        anm = jnp.zeros_like(a_n) - a_n
        t0 = n0[3] & ONE
        t1 = n1[3] & ONE
        h0_0 = hashv((n0[0], n0[1], n0[2], n0[3] & NOTONE))
        h0_1 = hashv((n0[0], n0[1], n0[2], n0[3] | ONE))
        h1_0 = hashv((n1[0], n1[1], n1[2], n1[3] & NOTONE))
        h1_1 = hashv((n1[0], n1[1], n1[2], n1[3] | ONE))
        # HCW = high_{!a_n}: select the 0-hashes when a_n=1.
        hcw = tuple((h0_1w ^ h1_1w) ^ (anm & ((h0_1w ^ h1_1w)
                                              ^ (h0_0w ^ h1_0w)))
                    for h0_0w, h0_1w, h1_0w, h1_1w
                    in zip(h0_0, h0_1, h1_0, h1_1))
        hcw = (hcw[0], hcw[1], hcw[2], hcw[3] & NOTONE)
        lcw_0 = (h0_0[3] & ONE) ^ (h1_0[3] & ONE) ^ a_n ^ ONE
        lcw_1 = (h0_1[3] & ONE) ^ (h1_1[3] & ONE) ^ a_n
        c_ref[in_bits - 1, 0] = hcw[0]
        c_ref[in_bits - 1, 1] = hcw[1]
        c_ref[in_bits - 1, 2] = hcw[2]
        c_ref[in_bits - 1, 3] = hcw[3] | lcw_0
        c_ref[in_bits - 1, 4] = lcw_1

        # Alpha-direction leaves with the CW correction (for ocw outside).
        lf0 = tuple(h0_0w ^ (anm & (h0_0w ^ h0_1w))
                    for h0_0w, h0_1w in zip(h0_0, h0_1))
        lf1 = tuple(h1_0w ^ (anm & (h1_0w ^ h1_1w))
                    for h1_0w, h1_1w in zip(h1_0, h1_1))
        lcw_an = lcw_0 ^ (a_n & (lcw_0 ^ lcw_1))
        leaf_cw = (hcw[0], hcw[1], hcw[2], hcw[3] | lcw_an)
        t0m = jnp.zeros_like(t0) - t0
        t1m = jnp.zeros_like(t1) - t1
        for j in range(4):
            l0_ref[j] = lf0[j] ^ (leaf_cw[j] & t0m)
            l1_ref[j] = lf1[j] ^ (leaf_cw[j] & t1m)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("in_bits", "nonce", "hash_key",
                                    "rounds", "block_rows", "interpret"))
def gen_packed(seeds8, a2, in_bits: int, nonce, hash_key,
               rounds: int = 20, block_rows: int = DEFAULT_BLOCK_ROWS,
               interpret: bool = False):
    """Fused batched Half-Tree Gen. Returns (cws_t [in_bits, 5, T, 128],
    leaf0 [4, T, 128], leaf1 [4, T, 128])."""
    nrows = seeds8.shape[1]
    assert nrows % block_rows == 0
    grid = (nrows // block_rows,)
    nonce = tuple(np.uint32(int(n) & 0xFFFFFFFF) for n in nonce)
    kern = _make_gen_kernel(in_bits, nonce, rounds, hash_key,
                            chacha_unroll=not interpret)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((in_bits, 5, block_rows, LANES),
                         lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((in_bits, 5, nrows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((4, nrows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((4, nrows, LANES), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(seeds8, a2)


def gen_batch(prg_nonce, group, in_bits: int, hash_key, s0s: jax.Array,
              alphas: jax.Array, betas: jax.Array, rounds: int = 20,
              block_rows: int = DEFAULT_BLOCK_ROWS, interpret: bool = False):
    """Batched Half-Tree key generation on the fused kernel; returns
    (cws [B, in_bits, 8], ocw [B, 4])."""
    from fss_tpu import block as blk
    from fss_tpu.ops import dpf_pallas as _dpfk

    assert in_bits >= 2, "the fused gen kernel needs in_bits >= 2"
    hk = tuple(int(v) for v in np.asarray(hash_key, dtype=np.uint32))
    seeds8, a2, B = _dpfk.pack_gen_inputs(s0s, alphas, in_bits, block_rows)
    cws_t, l0, l1 = gen_packed(seeds8, a2, in_bits=in_bits,
                               nonce=tuple(prg_nonce), hash_key=hk,
                               rounds=rounds, block_rows=block_rows,
                               interpret=interpret)
    T = cws_t.shape[2]
    rows = jnp.transpose(cws_t.reshape(in_bits, 5, T * LANES),
                         (2, 0, 1))[:B]
    pad = jnp.zeros((B, in_bits, 3), dtype=jnp.uint32)
    cws = jnp.concatenate([rows, pad], axis=-1)

    leaf0 = jnp.transpose(l0.reshape(4, -1), (1, 0))[:B]
    leaf1 = jnp.transpose(l1.reshape(4, -1), (1, 0))[:B]
    b_buf = blk.clear_lsb(jnp.asarray(betas, dtype=jnp.uint32))
    v_cw = group.add(
        group.add(group.from_block(b_buf),
                  group.neg(group.from_block(blk.clear_lsb(leaf0)))),
        group.from_block(blk.clear_lsb(leaf1)))
    v_cw = jnp.where((leaf1[:, 3] & ONE).astype(jnp.bool_)[:, None],
                     group.neg(v_cw), v_cw)
    return cws, group.into_block(v_cw)
