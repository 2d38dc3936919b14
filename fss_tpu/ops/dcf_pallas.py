"""Pallas TPU kernel for batched DCF point evaluation.

Same fused-levels SoA design as ops.dpf_pallas, with the DCF's running
value accumulated in-kernel (dcf.cuh:205-276): each level is one ChaCha
mul=4 expansion, a correction-word application, a value-CW add, and a child
select — all on [rows, 128] uint32 word tiles.

The value accumulator is group-kind-specialized: XOR for Bytes, wrapping
128-bit lane adds for Uint (word carries only travel upward, so truncating
to the group's width at finalize matches per-step group adds; the 2^127
modular group falls back to the XLA path). Party negation distributes over
the abelian group sum, so it too happens once at finalize.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fss_tpu import groups
from fss_tpu.ops._chacha_core import (FULL, NOTONE, ONE, add128,
                                      chacha_block)

LANES = 128
DEFAULT_BLOCK_ROWS = 16  # mul=4 state + cws use more VMEM than the DPF


def kernel_supports_group(group) -> bool:
    if isinstance(group, groups.Bytes):
        return True
    return isinstance(group, groups.Uint) and group.mod == 0


def _make_kernel(in_bits: int, party: int, nonce, rounds: int,
                 group_is_xor: bool):
    def acc(a, b):
        if group_is_xor:
            return tuple(x ^ y for x, y in zip(a, b))
        return add128(a, b)

    def kernel(s_ref, c_ref, x_ref, vo_ref, so_ref, t_ref):
        w = [s_ref[i] for i in range(4)]
        w[3] = w[3] & NOTONE
        t = jnp.zeros_like(w[0]) + np.uint32(party)
        x = x_ref[:]
        zero = jnp.zeros_like(w[0])
        v = (zero, zero, zero, zero)

        def level(i, carry):
            w0, w1, w2, w3, t, v0, v1, v2, v3 = carry
            o = chacha_block(w0, w1, w2, w3, nonce, 4, rounds)
            (l0, l1, l2, l3), (vl0, vl1, vl2, vl3), \
                (r0, r1, r2, r3), (vr0, vr1, vr2, vr3) = o
            tl = l3 & ONE
            l3 = l3 & NOTONE
            tr = r3 & ONE
            r3 = r3 & NOTONE
            vl3 = vl3 & NOTONE
            vr3 = vr3 & NOTONE

            cw = [c_ref[i, j] for j in range(8)]
            tl_cw = cw[3] & ONE
            tr_cw = cw[7] & ONE
            s_cw = (cw[0], cw[1], cw[2], cw[3] & NOTONE)
            v_cw = (cw[4], cw[5], cw[6], cw[7] & NOTONE)

            tm = jnp.where(t.astype(jnp.bool_), FULL, np.uint32(0))
            l0 ^= s_cw[0] & tm
            l1 ^= s_cw[1] & tm
            l2 ^= s_cw[2] & tm
            l3 ^= s_cw[3] & tm
            r0 ^= s_cw[0] & tm
            r1 ^= s_cw[1] & tm
            r2 ^= s_cw[2] & tm
            r3 ^= s_cw[3] & tm
            tl = tl ^ (t & tl_cw)
            tr = tr ^ (t & tr_cw)

            shift = np.uint32(in_bits - 1) - i.astype(jnp.uint32)
            xb = ((x >> shift) & ONE).astype(jnp.bool_)

            # v += (xb ? vr : vl) + (t ? v_cw : 0)
            step = tuple(jnp.where(xb, a, b)
                         for a, b in zip((vr0, vr1, vr2, vr3),
                                         (vl0, vl1, vl2, vl3)))
            vcm = tuple(c & tm for c in v_cw)
            v = acc(acc((v0, v1, v2, v3), step), vcm)

            w0 = jnp.where(xb, r0, l0)
            w1 = jnp.where(xb, r1, l1)
            w2 = jnp.where(xb, r2, l2)
            w3 = jnp.where(xb, r3, l3)
            t = jnp.where(xb, tr, tl)
            return (w0, w1, w2, w3, t, *v)

        w0, w1, w2, w3, t, v0, v1, v2, v3 = jax.lax.fori_loop(
            0, in_bits, level, (*w, t, *v))
        vo_ref[0] = v0
        vo_ref[1] = v1
        vo_ref[2] = v2
        vo_ref[3] = v3
        so_ref[0] = w0
        so_ref[1] = w1
        so_ref[2] = w2
        so_ref[3] = w3
        t_ref[:] = t

    return kernel


def pack_keys(s0: jax.Array, cws: jax.Array, xs: jax.Array, in_bits: int,
              block_rows: int = DEFAULT_BLOCK_ROWS):
    """Stage per-instance DCF keys into the SoA device layout. Returns
    (seeds4, cws_t, xs2, v_last [B, 4], B)."""
    B = xs.shape[0]
    tile = block_rows * LANES
    Bp = ((B + tile - 1) // tile) * tile
    T = Bp // LANES

    def padb(a):
        return jnp.pad(a, [(0, Bp - B)] + [(0, 0)] * (a.ndim - 1))

    s0p = padb(s0)
    cwsp = padb(cws)
    xsp = padb(jnp.asarray(xs, dtype=jnp.uint32))
    seeds4 = jnp.transpose(s0p, (1, 0)).reshape(4, T, LANES)
    cws_t = jnp.transpose(cwsp[:, :in_bits, :], (1, 2, 0)).reshape(
        in_bits, 8, T, LANES)
    xs2 = xsp.reshape(T, LANES)
    v_last = cws[:, in_bits, 4:8]
    return seeds4, cws_t, xs2, v_last, B


@functools.partial(jax.jit,
                   static_argnames=("in_bits", "party", "nonce", "rounds",
                                    "group_is_xor", "block_rows",
                                    "interpret"))
def eval_packed(seeds4, cws_t, xs2, in_bits: int, party: int, nonce,
                group_is_xor: bool, rounds: int = 20,
                block_rows: int = DEFAULT_BLOCK_ROWS,
                interpret: bool = False):
    nrows = seeds4.shape[1]
    assert nrows % block_rows == 0
    grid = (nrows // block_rows,)
    nonce = tuple(np.uint32(int(n) & 0xFFFFFFFF) for n in nonce)
    kern = _make_kernel(in_bits, party, nonce, rounds, group_is_xor)
    vo, so, t = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_bits, 8, block_rows, LANES),
                         lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, nrows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((4, nrows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nrows, LANES), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(seeds4, cws_t, xs2)
    return vo, so, t


def finalize(group, party: int, vo, so, t, v_last: jax.Array,
             batch: int) -> jax.Array:
    """Group-convert kernel outputs to [B, 4] shares (dcf.cuh:258-276)."""
    v_raw = jnp.transpose(vo.reshape(4, -1), (1, 0))[:batch]
    s = jnp.transpose(so.reshape(4, -1), (1, 0))[:batch]
    tb = t.reshape(-1)[:batch]
    v = group.from_block(v_raw)
    term = group.from_block(s)
    term = jnp.where(tb.astype(jnp.bool_)[:, None],
                     group.add(term, group.from_block(v_last)), term)
    y = group.add(v, term)
    if party:
        y = group.neg(y)
    return group.into_block(y)


def eval_points(prg_nonce, group, in_bits: int, party: int, s0: jax.Array,
                cws: jax.Array, xs: jax.Array, rounds: int = 20,
                block_rows: int = DEFAULT_BLOCK_ROWS,
                interpret: bool = False) -> jax.Array:
    """pack + kernel + finalize. Requires kernel_supports_group(group)."""
    assert kernel_supports_group(group)
    is_xor = isinstance(group, groups.Bytes)
    seeds4, cws_t, xs2, v_last, B = pack_keys(s0, cws, xs, in_bits,
                                              block_rows)
    vo, so, t = eval_packed(seeds4, cws_t, xs2, in_bits=in_bits,
                            party=party, nonce=tuple(prg_nonce),
                            group_is_xor=is_xor, rounds=rounds,
                            block_rows=block_rows, interpret=interpret)
    return finalize(group, party, vo, so, t, v_last, B)
