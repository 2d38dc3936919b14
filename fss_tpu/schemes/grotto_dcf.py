"""Grotto DCF: comparison over F2 from a plain DPF (Storrier+'23).

TPU-native re-design of reference include/fss/grotto_dcf.cuh. Key
generation is DPF Gen with beta = 0; the comparison emerges from the prefix
parity of the DPF control bits: share_0 XOR share_1 = 1[alpha <= x]
(grotto_dcf.cuh:15-17).

Replacements for the reference's sequential phases:
  - the running-XOR prefix scan of EvalAll (grotto_dcf.cuh:160-162) becomes
    ``jax.lax.associative_scan`` over the leaf control bits;
  - the bottom-up parity segment tree build (grotto_dcf.cuh:101-103) becomes
    log2(N) vectorized pairwise-XOR reductions;
  - the O(log N) pointer-chasing Eval (grotto_dcf.cuh:116-135) becomes a
    batched gather walk over the level-order tree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fss_tpu import block as blk
from fss_tpu.schemes import _tree, dpf

_ONE = np.uint32(1)


def gen(prg2, group_bytes, in_bits: int, s0s: jax.Array, alpha) -> jax.Array:
    """DPF Gen with beta = 0 (grotto_dcf.cuh:63-67)."""
    beta = jnp.zeros(4, dtype=jnp.uint32)
    return dpf.gen(prg2, group_bytes, in_bits, s0s, alpha, beta)


def expand_control_bits(prg2, in_bits: int, party: int, s0: jax.Array,
                        cws: jax.Array) -> jax.Array:
    """Expand the DPF tree and return the [2^n] leaf control bits."""
    s = blk.clear_lsb(s0)[None, :]
    t = jnp.full((1,), np.uint32(party), dtype=jnp.uint32)
    for i in range(in_bits):
        s_cw, tl_cw, tr_cw = _tree.unpack_cw_row(cws[i])
        s, t = _tree.expand_level(prg2, s, t, s_cw, tl_cw, tr_cw)
    return t


class ParityTree(NamedTuple):
    """Level-order parity segment tree (grotto_dcf.cuh:78-81).

    levels[i] is a [2^i] uint32 0/1 array; levels[0] is the root,
    levels[in_bits] the leaf control bits. (Stored per-level rather than as
    one 2N-1 array so each level keeps a dense, shardable layout.)
    """

    levels: tuple
    party: int

    @property
    def in_bits(self) -> int:
        return len(self.levels) - 1


def build_parity_tree(leaf: jax.Array, party: int) -> ParityTree:
    """Bottom-up parity levels from the leaf control bits
    (grotto_dcf.cuh:94-104), as log2(N) vector reductions."""
    in_bits = int(np.log2(leaf.shape[0]))
    levels = [leaf]
    cur = leaf
    for _ in range(in_bits):
        cur = cur[0::2] ^ cur[1::2]
        levels.append(cur)
    levels.reverse()
    return ParityTree(levels=tuple(levels), party=party)


def preprocess(prg2, in_bits: int, party: int, s0: jax.Array,
               cws: jax.Array) -> ParityTree:
    """Expand the tree and build all parity levels."""
    leaf = expand_control_bits(prg2, in_bits, party, s0, cws)
    return build_parity_tree(leaf, party)


def eval_points(pt: ParityTree, xs) -> jax.Array:
    """Batched prefix-parity queries: share of 1[alpha <= x]
    (grotto_dcf.cuh:116-135).

    Walks the endpoint e = x + 1 top-down; whenever e's bit goes right the
    left child's parity is folded in. Batched as one gather per level.
    """
    in_bits = pt.in_bits
    n = 1 << in_bits
    x_lanes = blk.pack_inputs(xs, in_bits)
    # e = x + 1 can reach N, needing in_bits + 1 bits of precision.
    e_lanes = _incr_lanes(x_lanes)
    e_bits = blk.input_bits_msb_first(e_lanes, in_bits)  # low in_bits, MSB 1st
    e_is_n = _eq_const(e_lanes, n)
    # e == 0 (wrap) also means the whole domain.
    e_is_zero = (e_lanes[..., 0] | e_lanes[..., 1]
                 | e_lanes[..., 2] | e_lanes[..., 3]) == 0
    full_domain = e_is_n | e_is_zero

    batch_shape = e_bits.shape[:-1]
    pi = jnp.zeros(batch_shape, dtype=jnp.uint32)
    cur = jnp.zeros(batch_shape, dtype=jnp.uint32)  # node index within level
    for i in range(in_bits):
        bit = e_bits[..., i]
        level = pt.levels[i + 1]  # children of the current level's nodes
        left = level[2 * cur]
        pi = pi ^ (bit & left)
        cur = 2 * cur + bit
    root = pt.levels[0][0]
    return jnp.where(full_domain, jnp.broadcast_to(root, batch_shape), pi)


def eval_all(prg2, in_bits: int, party: int, s0: jax.Array,
             cws: jax.Array) -> jax.Array:
    """Full-domain shares of 1[alpha <= x] for all x
    (grotto_dcf.cuh:151-163): tree expansion + prefix-XOR scan."""
    t = expand_control_bits(prg2, in_bits, party, s0, cws)
    return jax.lax.associative_scan(jnp.bitwise_xor, t)


class PrefixTable(NamedTuple):
    """Bit-packed full-domain prefix parities: bit j of words[w] is the
    party's share of 1[alpha <= 32w + j].

    The TPU-native answer to the reference's post-preprocess point query
    (grotto_dcf.cuh:116-135): per-level tree walks are in_bits dependent
    gathers per query — the worst access pattern for a TPU — while the
    full prefix array is one dense eval_all (the fast path) and each
    query becomes a single word gather + bit select. Memory is N bits,
    half the reference's 2N-1 byte tree.
    """

    words: jax.Array  # [max(N // 32, 1)] uint32
    party: int
    in_bits: int


def build_prefix_table(prefix_bits: jax.Array, party: int) -> PrefixTable:
    """Pack the [N] 0/1 prefix-parity array (= eval_all output)."""
    n = prefix_bits.shape[0]
    in_bits = int(np.log2(n))
    if n < 32:
        prefix_bits = jnp.pad(prefix_bits, (0, 32 - n))
    w = prefix_bits.reshape(-1, 32).astype(jnp.uint32)
    weights = jnp.asarray(np.uint32(1) << np.arange(32, dtype=np.uint32))
    words = jnp.sum(w * weights, axis=1, dtype=jnp.uint32)  # disjoint bits
    return PrefixTable(words=words, party=party, in_bits=in_bits)


def preprocess_prefix(prg2, in_bits: int, party: int, s0: jax.Array,
                      cws: jax.Array) -> PrefixTable:
    return build_prefix_table(eval_all(prg2, in_bits, party, s0, cws),
                              party)


def eval_prefix(table: PrefixTable, xs) -> jax.Array:
    """Point queries against the packed prefix table: one gather each."""
    xs = jnp.asarray(xs, dtype=jnp.uint32)
    w = table.words[xs >> np.uint32(5)]
    return (w >> (xs & np.uint32(31))) & np.uint32(1)


def _incr_lanes(x_lanes: jax.Array) -> jax.Array:
    """128-bit increment of [..., 4] uint32 lanes."""
    l0 = x_lanes[..., 0] + _ONE
    c0 = (l0 == 0).astype(jnp.uint32)
    l1 = x_lanes[..., 1] + c0
    c1 = c0 & (l1 == 0).astype(jnp.uint32)
    l2 = x_lanes[..., 2] + c1
    c2 = c1 & (l2 == 0).astype(jnp.uint32)
    l3 = x_lanes[..., 3] + c2
    return jnp.stack([l0, l1, l2, l3], axis=-1)


def _eq_const(lanes: jax.Array, value: int) -> jax.Array:
    target = blk.pack_int(value)
    eq = jnp.ones(lanes.shape[:-1], dtype=jnp.bool_)
    for i in range(4):
        eq = eq & (lanes[..., i] == np.uint32(target[i]))
    return eq
