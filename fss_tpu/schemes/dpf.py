"""2-party distributed point function (DPF), BGI'16.

TPU-native re-design of reference include/fss/dpf.cuh. Semantics are
bit-exact: for keys generated from the same seeds, Gen produces the same
correction words and Eval the same output shares as the reference.

Design notes (vs. the reference's recursion/OpenMP/CUDA-thread model):
  - ``gen`` is a ``lax.scan`` over levels (inherently sequential per key) and
    vmaps over a key batch.
  - ``eval_points`` is batched-first: arrays of seeds/keys/inputs, one scan
    over levels; each level is one PRG call over the whole batch (the
    one-CUDA-thread-per-key loop of bench_gpu.cu:83-93 becomes full-width
    VPU ops).
  - ``eval_all`` replaces the OpenMP recursion (dpf.cuh:244-297) with
    breadth-first level doubling: [2^i, 4] -> [2^{i+1}, 4] dense arrays.

Key layout parity: ``cws`` is a (in_bits+1, 8) uint32 array; row i < n is
{s_cw with tl_cw in the clamped bit, tr_cw in lane 4}; row n lanes 0-3 hold
the output correction word (dpf.cuh:150-152; fss_crypto/dpf.py:53-57).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fss_tpu import block as blk
from fss_tpu.schemes import _tree

_ONE = np.uint32(1)


def gen(prg2, group, in_bits: int, s0s: jax.Array, alpha,
        beta: jax.Array) -> jax.Array:
    """Generate one DPF key pair's correction words.

    Args:
      prg2: PRG with mul=2 (seed block -> (left, right) blocks).
      group: output group (fss_tpu.groups).
      in_bits: input domain bit size.
      s0s: [2, 4] uint32 initial seeds.
      alpha: python int, or [4] uint32 lanes.
      beta: [4] uint32 output block (will be clamped).

    Returns:
      cws: [in_bits + 1, 8] uint32.
    """
    a_lanes = blk.pack_inputs(alpha, in_bits)
    a_bits = blk.input_bits_msb_first(a_lanes, in_bits)  # [n] MSB first
    s0 = blk.clear_lsb(s0s[0])
    s1 = blk.clear_lsb(s0s[1])
    t0 = jnp.uint32(0)
    t1 = jnp.uint32(1)
    b_buf = blk.clear_lsb(beta)

    def level(carry, a_bit):
        s0, s1, t0, t1 = carry
        s0l, s0t0r = prg2(s0)
        s1l, s1t1r = prg2(s1)
        s0l, t0l = _tree.split_seed(s0l)
        s0r, t0r = _tree.split_seed(s0t0r)
        s1l, t1l = _tree.split_seed(s1l)
        s1r, t1r = _tree.split_seed(s1t1r)

        # Off-path sibling seeds define the CW (dpf.cuh:117-122).
        s_cw = _tree.choose(a_bit, blk.xor(s0r, s1r), blk.xor(s0l, s1l))
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

        return (s0n, s1n, t0n, t1n), _tree.pack_cw_row(s_cw, tl_cw, tr_cw)

    (s0, s1, t0, t1), cw_rows = jax.lax.scan(
        level, (s0, s1, t0, t1), a_bits)

    v_cw = group.add(
        group.add(group.from_block(b_buf), group.neg(group.from_block(s0))),
        group.from_block(s1))
    v_cw = jnp.where((t1 & _ONE).astype(jnp.bool_), group.neg(v_cw), v_cw)
    last = jnp.concatenate(
        [group.into_block(v_cw), jnp.zeros(4, dtype=jnp.uint32)], axis=-1)
    return jnp.concatenate([cw_rows, last[None, :]], axis=0)


def eval_points(prg2, group, in_bits: int, party: int, s0: jax.Array,
                cws: jax.Array, xs) -> jax.Array:
    """Batched point evaluation.

    Args:
      party: 0 or 1 (static).
      s0: [..., 4] seeds (one per instance) or [4] broadcast.
      cws: [..., in_bits + 1, 8] keys or [in_bits + 1, 8] broadcast.
      xs: inputs — python ints, uint32 array [...], or lanes [..., 4].

    Returns: [..., 4] uint32 output shares.
    """
    x_lanes = blk.pack_inputs(xs, in_bits)
    x_bits = blk.input_bits_msb_first(x_lanes, in_bits)  # [..., n]
    batch_shape = x_bits.shape[:-1]

    s0 = jnp.broadcast_to(s0, (*batch_shape, 4))
    cws = jnp.broadcast_to(cws, (*batch_shape, in_bits + 1, 8))

    s = blk.clear_lsb(s0)
    t = jnp.full(batch_shape, np.uint32(party), dtype=jnp.uint32)

    # Move the level axis to the front for the scan.
    cw_levels = jnp.moveaxis(cws[..., :in_bits, :], -2, 0)  # [n, ..., 8]
    bit_levels = jnp.moveaxis(x_bits, -1, 0)  # [n, ...]

    def level(carry, inputs):
        s, t = carry
        cw_row, x_bit = inputs
        s_cw, tl_cw, tr_cw = _tree.unpack_cw_row(cw_row)
        sl_raw, sr_raw = prg2(s)
        sl, tl = _tree.split_seed(sl_raw)
        sr, tr = _tree.split_seed(sr_raw)
        sl, tl, sr, tr = _tree.correct_children(
            sl, tl, sr, tr, t, s_cw, tl_cw, tr_cw)
        s = _tree.choose(x_bit, sl, sr)
        t = _tree.choose_bit(x_bit, tl, tr)
        return (s, t), None

    (s, t), _ = jax.lax.scan(level, (s, t), (cw_levels, bit_levels))

    y = group.from_block(s)
    ocw = group.from_block(cws[..., in_bits, 0:4])
    y = jnp.where(t.astype(jnp.bool_)[..., None], group.add(y, ocw), y)
    if party:
        y = group.neg(y)
    return group.into_block(y)


def eval_all(prg2, group, in_bits: int, party: int, s0: jax.Array,
             cws: jax.Array) -> jax.Array:
    """Full-domain evaluation: [2^in_bits, 4] output shares.

    Breadth-first doubling replaces the reference's recursive OpenMP tasks
    (dpf.cuh:226-297); for the sharded multi-chip variant see
    fss_tpu.parallel.
    """
    s = blk.clear_lsb(s0)[None, :]
    t = jnp.full((1,), np.uint32(party), dtype=jnp.uint32)
    for i in range(in_bits):
        s_cw, tl_cw, tr_cw = _tree.unpack_cw_row(cws[i])
        s, t = _tree.expand_level(prg2, s, t, s_cw, tl_cw, tr_cw)
    return finalize_leaves(group, in_bits, party, s, t, cws)


def finalize_leaves(group, in_bits: int, party: int, s: jax.Array,
                    t: jax.Array, cws: jax.Array) -> jax.Array:
    """Group-convert expanded leaves (shared with the sharded eval_all)."""
    y = group.from_block(s)
    ocw = group.from_block(cws[in_bits, 0:4])
    y = jnp.where(t.astype(jnp.bool_)[..., None], group.add(y, ocw), y)
    if party:
        y = group.neg(y)
    return group.into_block(y)
