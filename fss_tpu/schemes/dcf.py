"""2-party distributed comparison function (DCF), BCG+'21.

TPU-native re-design of reference include/fss/dcf.cuh. The DCF threads a
running group value ``v`` alongside the GGM tree walk; its PRG expands each
seed into 4 blocks (s_l, v_l, s_r, v_r).

Key layout parity (dcf.cuh:91-96): cws is (in_bits + 1, 8) uint32; row i < n
is {s_cw with t_l in the clamped bit (lanes 0-3), v_cw with t_r in the
clamped bit (lanes 4-7)}; row n lanes 4-7 hold the final value CW.

Predicates: "lt" gives y = b when x < alpha, "gt" when x > alpha
(dcf.cuh:58-61).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fss_tpu import block as blk
from fss_tpu.schemes import _tree

_ONE = np.uint32(1)

PRED_LT = "lt"
PRED_GT = "gt"


def _gsel(cond, a, b):
    """cond ? a : b for group values (lane arrays)."""
    return jnp.where(
        jnp.asarray(cond, jnp.uint32).astype(jnp.bool_)[..., None], a, b)


def gen(prg4, group, in_bits: int, pred: str, s0s: jax.Array, alpha,
        beta: jax.Array) -> jax.Array:
    """Generate one DCF key pair's correction words (dcf.cuh:108-194)."""
    assert pred in (PRED_LT, PRED_GT)
    a_lanes = blk.pack_inputs(alpha, in_bits)
    a_bits = blk.input_bits_msb_first(a_lanes, in_bits)
    s0 = blk.clear_lsb(s0s[0])
    s1 = blk.clear_lsb(s0s[1])
    t0 = jnp.uint32(0)
    t1 = jnp.uint32(1)
    b_buf = blk.clear_lsb(beta)
    b_val = group.from_block(b_buf)
    v = group.zero()

    def level(carry, a_bit):
        s0, s1, t0, t1, v = carry
        o0 = prg4(s0)
        o1 = prg4(s1)
        s0l, t0l = _tree.split_seed(o0[0])
        s0r, t0r = _tree.split_seed(o0[2])
        s1l, t1l = _tree.split_seed(o1[0])
        s1r, t1r = _tree.split_seed(o1[2])
        v0l = group.from_block(blk.clear_lsb(o0[1]))
        v0r = group.from_block(blk.clear_lsb(o0[3]))
        v1l = group.from_block(blk.clear_lsb(o1[1]))
        v1r = group.from_block(blk.clear_lsb(o1[3]))

        s_cw = _tree.choose(a_bit, blk.xor(s0r, s1r), blk.xor(s0l, s1l))

        # Value CW: v_cw = -v + v1_off - v0_off (+ b on the predicate side)
        # where "off" is the off-path direction (dcf.cuh:145-153).
        v1_off = _gsel(a_bit, v1l, v1r)
        v0_off = _gsel(a_bit, v0l, v0r)
        v_cw = group.add(group.add(group.neg(v), v1_off), group.neg(v0_off))
        if pred == PRED_LT:
            add_b = a_bit  # b added when descending right (x<a side is left)
        else:
            add_b = a_bit ^ _ONE
        v_cw = _gsel(add_b, group.add(v_cw, b_val), v_cw)
        v_cw = _gsel(t1, group.neg(v_cw), v_cw)

        # Thread the running value (dcf.cuh:155-158).
        v1_on = _gsel(a_bit, v1r, v1l)
        v0_on = _gsel(a_bit, v0r, v0l)
        v = group.add(group.add(v, group.neg(v1_on)), v0_on)
        v = group.add(v, _gsel(t1, group.neg(v_cw), v_cw))

        tl_cw = t0l ^ t1l ^ a_bit ^ _ONE
        tr_cw = t0r ^ t1r ^ a_bit

        keep0 = _tree.choose(a_bit, s0l, s0r)
        keep1 = _tree.choose(a_bit, s1l, s1r)
        tk0 = _tree.choose_bit(a_bit, t0l, t0r)
        tk1 = _tree.choose_bit(a_bit, t1l, t1r)
        tcw = _tree.choose_bit(a_bit, tl_cw, tr_cw)

        s0n = blk.masked_xor(t0, keep0, s_cw)
        s1n = blk.masked_xor(t1, keep1, s_cw)
        t0n = tk0 ^ (t0 & tcw)
        t1n = tk1 ^ (t1 & tcw)

        v_row = blk.set_lsb(group.into_block(v_cw), tr_cw)
        row = jnp.concatenate([blk.set_lsb(s_cw, tl_cw), v_row], axis=-1)
        return (s0n, s1n, t0n, t1n, v), row

    (s0, s1, t0, t1, v), cw_rows = jax.lax.scan(
        level, (s0, s1, t0, t1, v), a_bits)

    # Final CW (dcf.cuh:191-193): v_cw_{n+1} = s1 - s0 - v, negated if t1.
    v_last = group.add(
        group.add(group.from_block(s1), group.neg(group.from_block(s0))),
        group.neg(v))
    v_last = _gsel(t1, group.neg(v_last), v_last)
    last = jnp.concatenate(
        [jnp.zeros(4, dtype=jnp.uint32), group.into_block(v_last)], axis=-1)
    return jnp.concatenate([cw_rows, last[None, :]], axis=0)


def _unpack_dcf_row(group, row: jax.Array):
    s_cw_raw = row[..., 0:4]
    tl_cw = blk.get_lsb(s_cw_raw)
    s_cw = blk.clear_lsb(s_cw_raw)
    v_cw_raw = row[..., 4:8]
    tr_cw = blk.get_lsb(v_cw_raw)
    v_cw = group.from_block(blk.clear_lsb(v_cw_raw))
    return s_cw, tl_cw, tr_cw, v_cw


def eval_points(prg4, group, in_bits: int, pred: str, party: int,
                s0: jax.Array, cws: jax.Array, xs) -> jax.Array:
    """Batched point evaluation (dcf.cuh:205-276).

    Shapes as in dpf.eval_points. ``pred`` affects only gen; eval is
    predicate-agnostic (the CW placement encodes it).
    """
    del pred
    x_lanes = blk.pack_inputs(xs, in_bits)
    x_bits = blk.input_bits_msb_first(x_lanes, in_bits)
    batch_shape = x_bits.shape[:-1]

    s0 = jnp.broadcast_to(s0, (*batch_shape, 4))
    cws = jnp.broadcast_to(cws, (*batch_shape, in_bits + 1, 8))

    s = blk.clear_lsb(s0)
    t = jnp.full(batch_shape, np.uint32(party), dtype=jnp.uint32)
    v = group.zero(batch_shape)

    cw_levels = jnp.moveaxis(cws[..., :in_bits, :], -2, 0)
    bit_levels = jnp.moveaxis(x_bits, -1, 0)

    def level(carry, inputs):
        s, t, v = carry
        cw_row, x_bit = inputs
        s_cw, tl_cw, tr_cw, v_cw = _unpack_dcf_row(group, cw_row)

        o = prg4(s)
        sl, tl = _tree.split_seed(o[0])
        sr, tr = _tree.split_seed(o[2])
        vl = group.from_block(blk.clear_lsb(o[1]))
        vr = group.from_block(blk.clear_lsb(o[3]))

        sl, tl, sr, tr = _tree.correct_children(
            sl, tl, sr, tr, t, s_cw, tl_cw, tr_cw)

        # Accumulate the path value (dcf.cuh:244-252).
        v_step = _gsel(x_bit, vr, vl)
        v_step = group.add(v_step, _gsel(t, v_cw, group.zero(batch_shape)))
        if party:
            v_step = group.neg(v_step)
        v = group.add(v, v_step)

        s = _tree.choose(x_bit, sl, sr)
        t = _tree.choose_bit(x_bit, tl, tr)
        return (s, t, v), None

    (s, t, v), _ = jax.lax.scan(level, (s, t, v), (cw_levels, bit_levels))

    v_last = group.from_block(cws[..., in_bits, 4:8])
    term = group.from_block(s)
    term = group.add(term, _gsel(t, v_last, group.zero(batch_shape)))
    if party:
        term = group.neg(term)
    v = group.add(v, term)
    return group.into_block(v)


def expand_level(prg4, group, party: int, s, t, v, cw_row):
    """One breadth-first DCF doubling step: [M] nodes -> [2M] nodes,
    threading the partial value v (dcf.cuh:294-385)."""
    s_cw, tl_cw, tr_cw, v_cw = _unpack_dcf_row(group, cw_row)
    o = prg4(s)
    sl, tl = _tree.split_seed(o[0])
    sr, tr = _tree.split_seed(o[2])
    vl = group.from_block(blk.clear_lsb(o[1]))
    vr = group.from_block(blk.clear_lsb(o[3]))
    sl, tl, sr, tr = _tree.correct_children(
        sl, tl, sr, tr, t, s_cw, tl_cw, tr_cw)

    zero = group.zero(t.shape)
    vl = group.add(vl, _gsel(t, v_cw, zero))
    vr = group.add(vr, _gsel(t, v_cw, zero))
    if party:
        vl = group.neg(vl)
        vr = group.neg(vr)
    vl = group.add(vl, v)
    vr = group.add(vr, v)

    m = s.shape[0]
    s = jnp.stack([sl, sr], axis=1).reshape(2 * m, 4)
    t = jnp.stack([tl, tr], axis=1).reshape(2 * m)
    v = jnp.stack([vl, vr], axis=1).reshape(2 * m, 4)
    return s, t, v


def finalize_leaves(group, in_bits: int, party: int, s, t, v,
                    cws: jax.Array) -> jax.Array:
    """Convert expanded DCF leaves to output shares (dcf.cuh:365-384)."""
    v_last = group.from_block(cws[in_bits, 4:8])
    term = group.from_block(s)
    term = group.add(term, _gsel(t, jnp.broadcast_to(v_last, term.shape),
                                 group.zero(t.shape)))
    if party:
        term = group.neg(term)
    return group.into_block(group.add(v, term))


def eval_all(prg4, group, in_bits: int, party: int, s0: jax.Array,
             cws: jax.Array) -> jax.Array:
    """Full-domain evaluation via breadth-first doubling (dcf.cuh:294-385).

    The per-node partial value v is carried as a dense [M, 4] lane array and
    duplicated to both children each level, exactly the recursion's
    value-threading but as vector ops.
    """
    s = blk.clear_lsb(s0)[None, :]
    t = jnp.full((1,), np.uint32(party), dtype=jnp.uint32)
    v = group.zero((1,))
    for i in range(in_bits):
        s, t, v = expand_level(prg4, group, party, s, t, v, cws[i])
    return finalize_leaves(group, in_bits, party, s, t, v, cws)
