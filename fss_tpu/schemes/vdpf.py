"""Verifiable DPF (de Castro-Polychroniadou, EUROCRYPT'22).

TPU-native re-design of reference include/fss/vdpf.cuh. Eval produces both
an output share and a corrected 64B per-point hash pi~ = H(x, s_leaf) ^
(t ? cs : 0); Prove folds the pi~s into one proof; Verify is 64B equality.

Key layout parity: cws is (in_bits, 8) uint32 (no n+1 row, vdpf.cuh:88-91);
the check seed ``cs`` is a [4, 4] uint32 (64B) array and ``ocw`` a [4]
block, both separate outputs of Gen (vdpf.cuh:101-102).

Gen retry semantics under vmap (vdpf.cuh:167): instead of returning an int,
``gen`` returns a ``fail`` uint32 flag (1 when t0 == t1 at the end, meaning
the caller must resample seeds and re-run) so a batch of Gens can report
per-key failures as a mask.

The proof fold (vdpf.cuh:253-263) is order-dependent (pi feeds the next H'
input), so ``prove`` is a lax.scan in canonical index order — both parties
fold in the same order, which is all Verify needs. Sharded full-domain
proving keeps canonical order per shard and folds shard proofs in shard
order (documented framework variant; see parallel.vdpf_eval_all_sharded).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fss_tpu import block as blk
from fss_tpu.schemes import _tree

_ONE = np.uint32(1)


def gen(prg2, xor_hash, group, in_bits: int, s0s: jax.Array, alpha,
        beta: jax.Array):
    """Generate one VDPF key pair (vdpf.cuh:101-175).

    Returns (cws [in_bits, 8], cs [4, 4], ocw [4], fail uint32-scalar).
    On fail == 1 the caller must resample s0s and retry; cs/ocw are then
    garbage (but well-defined values, so this vmaps).
    """
    a_lanes = blk.pack_inputs(alpha, in_bits)
    a_bits = blk.input_bits_msb_first(a_lanes, in_bits)
    s0 = blk.clear_lsb(s0s[0])
    s1 = blk.clear_lsb(s0s[1])
    t0 = jnp.uint32(0)
    t1 = jnp.uint32(1)
    b_buf = blk.clear_lsb(beta)

    def level(carry, a_bit):
        s0, s1, t0, t1 = carry
        s0l, s0r = prg2(s0)
        s1l, s1r = prg2(s1)
        s0l, t0l = _tree.split_seed(s0l)
        s0r, t0r = _tree.split_seed(s0r)
        s1l, t1l = _tree.split_seed(s1l)
        s1r, t1r = _tree.split_seed(s1r)

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

    (s0, s1, t0, t1), cw_rows = jax.lax.scan(level, (s0, s1, t0, t1), a_bits)

    # Check seed: cs = H(a, s0_leaf) ^ H(a, s1_leaf) (vdpf.cuh:162-164).
    pi0 = xor_hash(a_lanes, s0)
    pi1 = xor_hash(a_lanes, s1)
    cs = jnp.bitwise_xor(pi0, pi1)

    fail = ((t0 ^ t1) ^ _ONE) & _ONE  # 1 iff t0 == t1 (vdpf.cuh:167)

    v_cw = group.add(
        group.add(group.from_block(b_buf), group.neg(group.from_block(s0))),
        group.from_block(s1))
    v_cw = jnp.where((t1 & _ONE).astype(jnp.bool_), group.neg(v_cw), v_cw)
    return cw_rows, cs, group.into_block(v_cw), fail


def eval_points(prg2, xor_hash, group, in_bits: int, party: int,
                s0: jax.Array, cws: jax.Array, cs: jax.Array,
                ocw: jax.Array, xs):
    """Batched point evaluation (vdpf.cuh:189-242).

    Returns (ys [..., 4], pi_tildes [..., 4, 4]).
    """
    x_lanes = blk.pack_inputs(xs, in_bits)
    x_bits = blk.input_bits_msb_first(x_lanes, in_bits)
    batch_shape = x_bits.shape[:-1]

    s0 = jnp.broadcast_to(s0, (*batch_shape, 4))
    cws = jnp.broadcast_to(cws, (*batch_shape, in_bits, 8))
    cs = jnp.broadcast_to(cs, (*batch_shape, 4, 4))
    ocw = jnp.broadcast_to(ocw, (*batch_shape, 4))

    s = blk.clear_lsb(s0)
    t = jnp.full(batch_shape, np.uint32(party), dtype=jnp.uint32)

    cw_levels = jnp.moveaxis(cws, -2, 0)
    bit_levels = jnp.moveaxis(x_bits, -1, 0)

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
    y = jnp.where(t.astype(jnp.bool_)[..., None],
                  group.add(y, group.from_block(ocw)), y)
    if party:
        y = group.neg(y)

    pi_tilde = xor_hash(x_lanes, s)
    pi_tilde = jnp.where(t.astype(jnp.bool_)[..., None, None],
                         jnp.bitwise_xor(pi_tilde, cs), pi_tilde)
    return group.into_block(y), pi_tilde


def prove(hash64, pi_tildes: jax.Array, cs: jax.Array) -> jax.Array:
    """Fold corrected per-point hashes into one proof (vdpf.cuh:253-263).

    pi_tildes: [N, 4, 4]; cs: [4, 4]. Sequential in index order: pi starts
    at cs; each step pi[:2] ^= H'(pi ^ pi_tilde_i). Returns [4, 4].
    """
    def step(pi, pt):
        h_in = jnp.bitwise_xor(pi, pt)
        h = hash64(h_in)  # [2, 4]
        pi = pi.at[0:2].set(jnp.bitwise_xor(pi[0:2], h))
        return pi, None

    pi, _ = jax.lax.scan(step, cs, pi_tildes)
    return pi


def prove_chunked(hash64, pi_tildes: jax.Array, cs: jax.Array,
                  chunk: int = 256) -> jax.Array:
    """Two-level proof fold: chain each chunk in index order (seeded at
    cs), then chain the chunk proofs in chunk order (seeded at cs).

    A documented framework variant of the reference's flat chain
    (vdpf.cuh:253-263): the flat chain is inherently sequential in the
    number of points, which caps full-domain proving at the latency of
    2^n dependent hashes; the chunked chain runs the inner folds as one
    vmapped batch. Both parties compute the identical structure from
    public data, which is all Verify requires. NOT byte-compatible with
    ``prove`` — do not mix folds across parties.

    pi_tildes: [N, 4, 4] with N divisible by ``chunk``.
    """
    n = pi_tildes.shape[0]
    assert n % chunk == 0, "N must be divisible by chunk"
    chunks = pi_tildes.reshape(n // chunk, chunk, 4, 4)
    chunk_pis = jax.vmap(lambda pts: prove(hash64, pts, cs))(chunks)
    return prove(hash64, chunk_pis, cs)


def prove_tree(hash64, pi_tildes: jax.Array, cs: jax.Array) -> jax.Array:
    """Merkle-style proof fold: log-depth, fully batched.

    Documented framework variant for full-domain proving: leaf digests
    h_i = H'(pi~_i); internal nodes H'(left || right) (H' maps 64B -> 32B,
    exactly two child digests); the proof is [root(32B) || cs[2:4]].
    Every level is ONE batched hash64 call, so 2^n points take n batched
    hashes instead of 2^n dependent ones. Both parties compute the same
    tree; NOT byte-compatible with ``prove``/``prove_chunked``.

    pi_tildes: [N, 4, 4] with N a power of two.
    """
    n = pi_tildes.shape[0]
    assert n & (n - 1) == 0, "N must be a power of two"
    h = hash64(pi_tildes)  # [N, 2, 4]
    while h.shape[0] > 1:
        m = h.shape[0] // 2
        pairs = h.reshape(m, 4, 4)  # (left, right) digests -> 64B input
        h = hash64(pairs)
    return jnp.concatenate([h[0], cs[2:4]], axis=0)


def verify(pi0: jax.Array, pi1: jax.Array) -> jax.Array:
    """64B proof equality (vdpf.cuh:270-275)."""
    return jnp.all(pi0 == pi1)


def eval_all(prg2, xor_hash, hash64, group, in_bits: int, party: int,
             s0: jax.Array, cws: jax.Array, cs: jax.Array, ocw: jax.Array):
    """Full-domain evaluation + proof (vdpf.cuh:296-344).

    Returns (ys [2^n, 4], pi [4, 4]). The tree phase is breadth-first
    doubling; outputs and per-point hashes are computed as one dense batch;
    only the proof fold itself is sequential (as in the reference's phase 2).
    """
    s = blk.clear_lsb(s0)[None, :]
    t = jnp.full((1,), np.uint32(party), dtype=jnp.uint32)
    for i in range(in_bits):
        s_cw, tl_cw, tr_cw = _tree.unpack_cw_row(cws[i])
        s, t = _tree.expand_level(prg2, s, t, s_cw, tl_cw, tr_cw)

    n = 1 << in_bits
    y = group.from_block(s)
    y = jnp.where(t.astype(jnp.bool_)[..., None],
                  group.add(y, jnp.broadcast_to(group.from_block(ocw),
                                                y.shape)), y)
    if party:
        y = group.neg(y)
    ys = group.into_block(y)

    xs = jnp.arange(n, dtype=jnp.uint32)
    x_lanes = blk.pack_inputs(xs, min(in_bits, 32))
    pi_tildes = xor_hash(x_lanes, s)  # [n, 4, 4], one dense batch
    pi_tildes = jnp.where(t.astype(jnp.bool_)[..., None, None],
                          jnp.bitwise_xor(pi_tildes, cs), pi_tildes)
    pi = prove(hash64, pi_tildes, cs)
    return ys, pi
