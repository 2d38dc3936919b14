"""Half-Tree DPF (Guo+'23): one CCR-hash call per node instead of two.

TPU-native re-design of reference include/fss/half_tree_dpf.cuh. The scheme
uses a mul=1 correlation-robust hash H(hash_key ^ node) and derives the right
child for free as ``right = left ^ parent``, halving PRG work for full-domain
expansion. The implementation follows the reference's *corrected* formulas
(doc/half_tree_dpf_spec_correction.md): the level CW uses
(1 - alpha_i) * delta,
HCW uses the !alpha_n direction, and LCW_0 carries !alpha_n.

Key layout parity (half_tree_dpf.cuh:47-57): ``cws`` is an (in_bits, 8)
uint32 array; rows 0..n-2 hold the level CW in lanes 0-3; row n-1 holds
SetLsb(HCW, LCW_0) in lanes 0-3 and LCW_1 in lane 4. The output correction
word ``ocw`` is a separate [4] block.

Parallel structure: ``gen``/``eval`` scan over levels (sequential per key,
vmap over key batches); ``eval_all`` replaces the OpenMP recursion
(half_tree_dpf.cuh:279-311) with breadth-first doubling to level n-1, then
one batched last-level conversion producing two leaves per node
(half_tree_dpf.cuh:320-349) — the backward in-place loop becomes a dense
vector op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fss_tpu import block as blk

_ONE = np.uint32(1)


def _hash(prg1, hash_key, node):
    """CCR hash: H(k ^ x) via the mul=1 PRG (half_tree_dpf.cuh:78-79)."""
    return prg1(jnp.bitwise_xor(hash_key, node))[0]


def gen(prg1, group, in_bits: int, hash_key: jax.Array, s0s: jax.Array,
        alpha, beta: jax.Array):
    """Generate one Half-Tree key pair (half_tree_dpf.cuh:68-170).

    Returns:
      cws: [in_bits, 8] uint32; ocw: [4] uint32.
    """
    a_lanes = blk.pack_inputs(alpha, in_bits)
    a_bits = blk.input_bits_msb_first(a_lanes, in_bits)  # [n], MSB first
    b_buf = blk.clear_lsb(beta)

    node0 = blk.set_lsb(s0s[0], np.uint32(0))
    node1 = blk.set_lsb(s0s[1], np.uint32(1))

    def level(carry, a_bit):
        node0, node1 = carry
        h0 = _hash(prg1, hash_key, node0)
        h1 = _hash(prg1, hash_key, node1)
        delta = jnp.bitwise_xor(node0, node1)
        # CW = h0 ^ h1 ^ (!a_bit ? delta : 0)   (corrected formula)
        cw = jnp.bitwise_xor(h0, h1)
        cw = blk.masked_xor(a_bit ^ _ONE, cw, delta)
        t0 = blk.get_lsb(node0)
        t1 = blk.get_lsb(node1)
        # node_b = h_b ^ (a_bit ? node_b : 0) ^ (t_b ? cw : 0)
        node0n = blk.masked_xor(t0, blk.masked_xor(a_bit, h0, node0), cw)
        node1n = blk.masked_xor(t1, blk.masked_xor(a_bit, h1, node1), cw)
        row = jnp.concatenate([cw, jnp.zeros(4, dtype=jnp.uint32)], axis=-1)
        return (node0n, node1n), row

    if in_bits > 1:
        (node0, node1), cw_rows = jax.lax.scan(
            level, (node0, node1), a_bits[: in_bits - 1])
    else:
        cw_rows = jnp.zeros((0, 8), dtype=jnp.uint32)

    # Last level (half_tree_dpf.cuh:109-169).
    a_n = a_bits[in_bits - 1]
    t0 = blk.get_lsb(node0)
    t1 = blk.get_lsb(node1)
    h0_0 = _hash(prg1, hash_key, blk.clear_lsb(node0))
    h0_1 = _hash(prg1, hash_key, blk.set_lsb(node0, _ONE))
    h1_0 = _hash(prg1, hash_key, blk.clear_lsb(node1))
    h1_1 = _hash(prg1, hash_key, blk.set_lsb(node1, _ONE))

    high0_0, low0_0 = blk.clear_lsb(h0_0), blk.get_lsb(h0_0)
    high0_1, low0_1 = blk.clear_lsb(h0_1), blk.get_lsb(h0_1)
    high1_0, low1_0 = blk.clear_lsb(h1_0), blk.get_lsb(h1_0)
    high1_1, low1_1 = blk.clear_lsb(h1_1), blk.get_lsb(h1_1)

    # HCW = high_{!a_n,0} ^ high_{!a_n,1}
    hcw = blk.select(a_n, jnp.bitwise_xor(high0_0, high1_0),
                     jnp.bitwise_xor(high0_1, high1_1))
    lcw_0 = low0_0 ^ low1_0 ^ a_n ^ _ONE
    lcw_1 = low0_1 ^ low1_1 ^ a_n

    last_row = jnp.concatenate([
        blk.set_lsb(hcw, lcw_0),
        (lcw_1 & _ONE)[None],
        jnp.zeros(3, dtype=jnp.uint32),
    ], axis=-1)
    cws = jnp.concatenate([cw_rows, last_row[None, :]], axis=0)

    # Leaves in the alpha direction, with the CW correction applied.
    leaf0 = blk.select(a_n, blk.set_lsb(high0_1, low0_1),
                       blk.set_lsb(high0_0, low0_0))
    leaf1 = blk.select(a_n, blk.set_lsb(high1_1, low1_1),
                       blk.set_lsb(high1_0, low1_0))
    lcw_an = jnp.where(a_n.astype(jnp.bool_), lcw_1, lcw_0)
    leaf_cw = blk.set_lsb(hcw, lcw_an)
    leaf0 = blk.masked_xor(t0, leaf0, leaf_cw)
    leaf1 = blk.masked_xor(t1, leaf1, leaf_cw)

    v_cw = group.add(
        group.add(group.from_block(b_buf),
                  group.neg(group.from_block(blk.clear_lsb(leaf0)))),
        group.from_block(blk.clear_lsb(leaf1)))
    v_cw = jnp.where(blk.get_lsb(leaf1).astype(jnp.bool_)[..., None],
                     group.neg(v_cw), v_cw)
    return cws, group.into_block(v_cw)


def eval_points(prg1, group, in_bits: int, party: int,
                hash_key: jax.Array, s0: jax.Array, cws: jax.Array,
                ocw: jax.Array, xs) -> jax.Array:
    """Batched point evaluation (half_tree_dpf.cuh:182-226).

    s0: [..., 4] or [4]; cws: [..., in_bits, 8] or [in_bits, 8];
    ocw: [..., 4] or [4]; xs: ints / uint32 array / packed lanes.
    Returns [..., 4] output shares.
    """
    x_lanes = blk.pack_inputs(xs, in_bits)
    x_bits = blk.input_bits_msb_first(x_lanes, in_bits)
    batch_shape = x_bits.shape[:-1]

    s0 = jnp.broadcast_to(s0, (*batch_shape, 4))
    cws = jnp.broadcast_to(cws, (*batch_shape, in_bits, 8))
    ocw = jnp.broadcast_to(ocw, (*batch_shape, 4))

    node = blk.set_lsb(s0, np.uint32(party))

    if in_bits > 1:
        cw_levels = jnp.moveaxis(cws[..., : in_bits - 1, 0:4], -2, 0)
        bit_levels = jnp.moveaxis(x_bits[..., : in_bits - 1], -1, 0)

        def level(node, inputs):
            cw, x_bit = inputs
            t = blk.get_lsb(node)
            h = _hash(prg1, hash_key, node)
            node = blk.masked_xor(t, blk.masked_xor(x_bit, h, node), cw)
            return node, None

        node, _ = jax.lax.scan(level, node, (cw_levels, bit_levels))

    # Last level (half_tree_dpf.cuh:199-225).
    x_n = x_bits[..., in_bits - 1]
    t = blk.get_lsb(node)
    h = _hash(prg1, hash_key, blk.set_lsb(node, x_n))
    last = cws[..., in_bits - 1, :]
    hcw = blk.clear_lsb(last[..., 0:4])
    lcw_xn = jnp.where(x_n.astype(jnp.bool_), last[..., 4] & _ONE,
                       blk.get_lsb(last[..., 0:4]))
    high = blk.clear_lsb(h)
    low = blk.get_lsb(h)
    high = blk.masked_xor(t, high, hcw)
    low = low ^ (t & lcw_xn)

    y = group.from_block(high)
    oc = group.from_block(ocw)
    y = jnp.where(low.astype(jnp.bool_)[..., None], group.add(y, oc), y)
    if party:
        y = group.neg(y)
    return group.into_block(y)


def expand_to_last(prg1, in_bits: int, party: int, hash_key: jax.Array,
                   s0: jax.Array, cws: jax.Array) -> jax.Array:
    """Breadth-first expansion to the 2^(n-1) level-(n-1) nodes.

    Replaces the recursive phase 1 of EvalAll (half_tree_dpf.cuh:279-311):
    left = H(k ^ parent) ^ (t ? cw : 0); right = left ^ parent.
    """
    node = blk.set_lsb(s0, np.uint32(party))[None, :]
    for i in range(in_bits - 1):
        t = blk.get_lsb(node)
        h = _hash(prg1, hash_key, node)
        left = blk.masked_xor(t, h, cws[i, 0:4])
        right = jnp.bitwise_xor(left, node)
        m = node.shape[0]
        node = jnp.stack([left, right], axis=1).reshape(2 * m, 4)
    return node


def convert_last_level(prg1, group, in_bits: int, party: int,
                       hash_key: jax.Array, nodes: jax.Array,
                       cws: jax.Array, ocw: jax.Array) -> jax.Array:
    """Batched last-level conversion: [M, 4] parents -> [2M, 4] outputs
    (half_tree_dpf.cuh:320-349)."""
    last = cws[in_bits - 1]
    hcw = blk.clear_lsb(last[0:4])
    lcw_0 = blk.get_lsb(last[0:4])
    lcw_1 = last[4] & _ONE
    oc = group.from_block(ocw)

    t = blk.get_lsb(nodes)
    h0 = _hash(prg1, hash_key, blk.clear_lsb(nodes))
    h1 = _hash(prg1, hash_key, blk.set_lsb(nodes, _ONE))

    def convert(h, lcw):
        high = blk.clear_lsb(h)
        low = blk.get_lsb(h)
        high = blk.masked_xor(t, high, hcw)
        low = low ^ (t & lcw)
        y = group.from_block(high)
        y = jnp.where(low.astype(jnp.bool_)[..., None],
                      group.add(y, jnp.broadcast_to(oc, y.shape)), y)
        if party:
            y = group.neg(y)
        return group.into_block(y)

    y0 = convert(h0, lcw_0)
    y1 = convert(h1, lcw_1)
    m = nodes.shape[0]
    return jnp.stack([y0, y1], axis=1).reshape(2 * m, 4)


def eval_all(prg1, group, in_bits: int, party: int, hash_key: jax.Array,
             s0: jax.Array, cws: jax.Array, ocw: jax.Array) -> jax.Array:
    """Full-domain evaluation: [2^in_bits, 4] shares
    (half_tree_dpf.cuh:241-276)."""
    nodes = expand_to_last(prg1, in_bits, party, hash_key, s0, cws)
    return convert_last_level(prg1, group, in_bits, party, hash_key, nodes,
                              cws, ocw)
