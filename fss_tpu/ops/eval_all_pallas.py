"""Pallas TPU kernel for DPF full-domain evaluation (EvalAll).

Hybrid decomposition of the breadth-first expansion (dpf.cuh:226-297):

  1. XLA expands the first ``n - 13`` levels to 2^(n-13) subtree roots
     (cheap: a vanishing fraction of total nodes).
  2. The kernel grid covers tiles of 128 roots; each cell expands 6 more
     levels entirely in VMEM: a [rows, 128] node tile doubles its row
     count per level (children interleaved row-wise), every ChaCha running
     full-width on the VPU. 8192 leaves per cell, one HBM write each.
  3. One XLA relayout pass puts leaves in sequential x order and applies
     the group conversion.

Correction words ride in SMEM (a [6, 8] scalar table — per-level scalars,
exactly the reference's __constant__-memory staging of key material,
bench_gpu.cu:23-35).

Layout algebra: phase-1 roots are in sequential prefix order; root
r = (tile << 7) | lane; the kernel's row index after 6 interleaved
doublings equals the 6-bit MSB-first path suffix p, so the leaf for
x = (r << 6) | p sits at [tile, p, lane] — sequential after one
[rows, lanes] transpose per tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fss_tpu import block as blk
from fss_tpu.ops._chacha_core import NOTONE, ONE, chacha_block
from fss_tpu.schemes import _tree

LANES = 128
KERNEL_LEVELS = 6


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False
ROWS = 1 << KERNEL_LEVELS  # 64 leaf rows per tile
MIN_BITS = 7 + KERNEL_LEVELS  # structural floor for the kernel path
# Below this the XLA prefix dominates and plain breadth-first XLA wins.
KERNEL_WORTHWHILE_BITS = 18


def _make_kernel(nonce, rounds: int, unroll: bool = True):
    def kernel(r_ref, c_ref, so_ref, t_ref):
        n0 = r_ref[0, 0]  # [1, 128] root row (t in the clamped bit)
        n1 = r_ref[1, 0]
        n2 = r_ref[2, 0]
        n3 = r_ref[3, 0]

        for lvl in range(KERNEL_LEVELS):
            t = n3 & ONE
            s3 = n3 & NOTONE
            (l0, l1, l2, l3), (q0, q1, q2, q3) = chacha_block(
                n0, n1, n2, s3, nonce, 2, rounds, unroll=unroll)
            cw0 = c_ref[lvl, 0]
            cw1 = c_ref[lvl, 1]
            cw2 = c_ref[lvl, 2]
            cw3r = c_ref[lvl, 3]
            cw4 = c_ref[lvl, 4]
            tl_cw = cw3r & ONE
            cw3 = cw3r & NOTONE
            tr_cw = cw4 & ONE
            tm = np.uint32(0) - t
            # Children keep their t in the clamped bit (packed node form).
            ltv = (l3 & ONE) ^ (t & tl_cw)
            rtv = (q3 & ONE) ^ (t & tr_cw)
            l0 ^= cw0 & tm
            l1 ^= cw1 & tm
            l2 ^= cw2 & tm
            l3 = ((l3 ^ (cw3 & tm)) & NOTONE) | ltv
            q0 ^= cw0 & tm
            q1 ^= cw1 & tm
            q2 ^= cw2 & tm
            q3 = ((q3 ^ (cw3 & tm)) & NOTONE) | rtv
            # Interleave children row-wise: rows [2i], [2i+1].
            m = n0.shape[0]
            n0 = jnp.stack([l0, q0], axis=1).reshape(2 * m, LANES)
            n1 = jnp.stack([l1, q1], axis=1).reshape(2 * m, LANES)
            n2 = jnp.stack([l2, q2], axis=1).reshape(2 * m, LANES)
            n3 = jnp.stack([l3, q3], axis=1).reshape(2 * m, LANES)

        so_ref[0, 0] = n0
        so_ref[1, 0] = n1
        so_ref[2, 0] = n2
        so_ref[3, 0] = n3 & NOTONE
        t_ref[0] = n3 & ONE

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("in_bits", "nonce", "rounds",
                                    "interpret"))
def _expand_packed(roots4, cw_table, in_bits: int, nonce, rounds: int = 20,
                   interpret: bool = False):
    """roots4: [4, ntiles, 1, 128] packed (s,t) root rows; cw_table: [6, 8]
    uint32 (the last KERNEL_LEVELS cw rows). Returns
    (so [4, ntiles, ROWS, 128], t [ntiles, ROWS, 128])."""
    ntiles = roots4.shape[1]
    nonce = tuple(np.uint32(int(n) & 0xFFFFFFFF) for n in nonce)
    kern = _make_kernel(nonce, rounds, unroll=not interpret)
    return pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((4, 1, 1, LANES), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KERNEL_LEVELS, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((4, 1, ROWS, LANES), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, ntiles, ROWS, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((ntiles, ROWS, LANES), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(roots4, cw_table)


def _make_dcf_kernel(nonce, rounds: int, group_is_xor: bool,
                     unroll: bool = True):
    """DCF expansion with value threading (dcf.cuh:294-385): node state is
    (s||t packed, v raw); children interleave row-wise; the per-level value
    step accumulates XOR (Bytes) or wrapping 128-bit lane adds (Uint) with
    party negation deferred to the finalize (abelian sum)."""
    from fss_tpu.ops._chacha_core import add128

    def acc(a, b):
        if group_is_xor:
            return tuple(x ^ y for x, y in zip(a, b))
        return add128(a, b)

    def kernel(r_ref, c_ref, so_ref, vo_ref, t_ref):
        n = [r_ref[i, 0] for i in range(4)]    # s with t in clamped bit
        v = [r_ref[4 + i, 0] for i in range(4)]  # raw deferred value

        for lvl in range(KERNEL_LEVELS):
            t = n[3] & ONE
            s3 = n[3] & NOTONE
            o = chacha_block(n[0], n[1], n[2], s3, nonce, 4, rounds,
                             unroll=unroll)
            (l0, l1, l2, l3), (vl0, vl1, vl2, vl3), \
                (q0, q1, q2, q3), (vr0, vr1, vr2, vr3) = o
            cw = [c_ref[lvl, j] for j in range(8)]
            tl_cw = cw[3] & ONE
            tr_cw = cw[7] & ONE
            s_cw = (cw[0], cw[1], cw[2], cw[3] & NOTONE)
            v_cw = (cw[4], cw[5], cw[6], cw[7] & NOTONE)
            tm = np.uint32(0) - t

            ltv = (l3 & ONE) ^ (t & tl_cw)
            rtv = (q3 & ONE) ^ (t & tr_cw)
            l = [l0 ^ (s_cw[0] & tm), l1 ^ (s_cw[1] & tm),
                 l2 ^ (s_cw[2] & tm),
                 ((l3 ^ (s_cw[3] & tm)) & NOTONE) | ltv]
            q = [q0 ^ (s_cw[0] & tm), q1 ^ (s_cw[1] & tm),
                 q2 ^ (s_cw[2] & tm),
                 ((q3 ^ (s_cw[3] & tm)) & NOTONE) | rtv]

            vcm = tuple(c & tm for c in v_cw)
            v_l = acc(acc(v, (vl0, vl1, vl2, vl3 & NOTONE)), vcm)
            v_r = acc(acc(v, (vr0, vr1, vr2, vr3 & NOTONE)), vcm)

            m = n[0].shape[0]
            n = [jnp.stack([a, b], axis=1).reshape(2 * m, LANES)
                 for a, b in zip(l, q)]
            v = [jnp.stack([a, b], axis=1).reshape(2 * m, LANES)
                 for a, b in zip(v_l, v_r)]

        for i in range(4):
            so_ref[i, 0] = n[i] if i < 3 else (n[3] & NOTONE)
            vo_ref[i, 0] = v[i]
        t_ref[0] = n[3] & ONE

    return kernel


def dcf_eval_all(prg4, group, in_bits: int, party: int, s0: jax.Array,
                 cws: jax.Array, rounds: int = 20,
                 interpret: bool = False,
                 force_kernel: bool = False) -> jax.Array:
    """DCF full-domain evaluation via the hybrid kernel; [2^in_bits, 4].

    Supported groups: Bytes and wrapping Uint (value accumulation defers
    masking/negation to the finalize); others fall back to the XLA path.
    ``force_kernel`` lowers the dispatch threshold to the structural floor
    (used by scripts/verify_tpu.py to byte-check the kernel at golden-case
    domain sizes that would normally take the XLA path).
    """
    from fss_tpu import groups as _groups
    from fss_tpu.schemes import dcf as _dcf

    group_ok = isinstance(group, _groups.Bytes) or (
        isinstance(group, _groups.Uint) and group.mod == 0)
    threshold = (MIN_BITS if (interpret or force_kernel)
                 else KERNEL_WORTHWHILE_BITS)
    if (in_bits < threshold or not group_ok
            or (not interpret and not _on_tpu())):
        return _dcf.eval_all(prg4, group, in_bits, party, s0, cws)

    is_xor = isinstance(group, _groups.Bytes)
    k = in_bits - MIN_BITS + 7

    # Raw-value prefix expansion (party negation deferred).
    from fss_tpu.groups import _add128

    def raw_acc(a, b):
        return jnp.bitwise_xor(a, b) if is_xor else _add128(a, b)

    s = blk.clear_lsb(s0)[None, :]
    t = jnp.full((1,), np.uint32(party), dtype=jnp.uint32)
    v = jnp.zeros((1, 4), dtype=jnp.uint32)
    for i in range(k):
        row = cws[i]
        s_cw = blk.clear_lsb(row[0:4])
        tl_cw = blk.get_lsb(row[0:4])
        tr_cw = blk.get_lsb(row[4:8])
        v_cw = blk.clear_lsb(row[4:8])
        o = prg4(s)
        sl, tl = _tree.split_seed(o[0])
        sr, tr = _tree.split_seed(o[2])
        sl, tl, sr, tr = _tree.correct_children(sl, tl, sr, tr, t, s_cw,
                                                tl_cw, tr_cw)
        vcm = jnp.where(t.astype(jnp.bool_)[:, None],
                        jnp.broadcast_to(v_cw, (s.shape[0], 4)),
                        jnp.zeros((s.shape[0], 4), dtype=jnp.uint32))
        v_l = raw_acc(raw_acc(v, blk.clear_lsb(o[1])), vcm)
        v_r = raw_acc(raw_acc(v, blk.clear_lsb(o[3])), vcm)
        m = s.shape[0]
        s = jnp.stack([blk.set_lsb(sl, tl), blk.set_lsb(sr, tr)],
                      axis=1).reshape(2 * m, 4)
        t = blk.get_lsb(s)
        s = blk.clear_lsb(s)
        v = jnp.stack([v_l, v_r], axis=1).reshape(2 * m, 4)

    ntiles = (1 << k) // LANES
    packed = blk.set_lsb(s, t)
    roots8 = jnp.concatenate([
        jnp.transpose(packed, (1, 0)).reshape(4, ntiles, 1, LANES),
        jnp.transpose(v, (1, 0)).reshape(4, ntiles, 1, LANES)], axis=0)
    cw_table = cws[k:in_bits, :].astype(jnp.uint32)
    nonce = tuple(np.uint32(int(x) & 0xFFFFFFFF) for x in prg4.nonce)
    kern = _make_dcf_kernel(nonce, rounds, is_xor, unroll=not interpret)
    so, vo, tb = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((8, 1, 1, LANES), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KERNEL_LEVELS, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((4, 1, ROWS, LANES), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 1, ROWS, LANES), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, ntiles, ROWS, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((4, ntiles, ROWS, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((ntiles, ROWS, LANES), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(roots8, cw_table)

    s_leaves = jnp.transpose(so, (1, 3, 2, 0)).reshape(1 << in_bits, 4)
    v_leaves = jnp.transpose(vo, (1, 3, 2, 0)).reshape(1 << in_bits, 4)
    t_leaves = jnp.transpose(tb, (0, 2, 1)).reshape(1 << in_bits)

    vv = group.from_block(v_leaves)
    term = group.from_block(s_leaves)
    v_last = group.from_block(cws[in_bits, 4:8])
    term = jnp.where(t_leaves.astype(jnp.bool_)[:, None],
                     group.add(term, jnp.broadcast_to(v_last, term.shape)),
                     term)
    y = group.add(vv, term)
    if party:
        y = group.neg(y)
    return group.into_block(y)


def _make_ht_kernel(nonce, rounds: int, hash_key, unroll: bool = True):
    """Half-Tree expansion + last-level conversion
    (half_tree_dpf.cuh:241-349): 5 interleaved doublings with
    right = left ^ parent, then one conversion level emitting the
    corrected (high, low) leaf pair — 2 leaves per node, row-interleaved.
    Nodes carry t in the clamped bit throughout."""
    hk = tuple(np.uint32(int(k) & 0xFFFFFFFF) for k in hash_key)

    def kernel(r_ref, c_ref, ho_ref, lo_ref):
        n0 = r_ref[0, 0]
        n1 = r_ref[1, 0]
        n2 = r_ref[2, 0]
        n3 = r_ref[3, 0]

        for lvl in range(KERNEL_LEVELS - 1):
            t = n3 & ONE
            (h0, h1, h2, h3), = chacha_block(
                n0 ^ hk[0], n1 ^ hk[1], n2 ^ hk[2], n3 ^ hk[3],
                nonce, 1, rounds, unroll=unroll)
            tm = np.uint32(0) - t
            l0 = h0 ^ (c_ref[lvl, 0] & tm)
            l1 = h1 ^ (c_ref[lvl, 1] & tm)
            l2 = h2 ^ (c_ref[lvl, 2] & tm)
            l3 = h3 ^ (c_ref[lvl, 3] & tm)
            q0 = l0 ^ n0
            q1 = l1 ^ n1
            q2 = l2 ^ n2
            q3 = l3 ^ n3
            m = n0.shape[0]
            n0 = jnp.stack([l0, q0], axis=1).reshape(2 * m, LANES)
            n1 = jnp.stack([l1, q1], axis=1).reshape(2 * m, LANES)
            n2 = jnp.stack([l2, q2], axis=1).reshape(2 * m, LANES)
            n3 = jnp.stack([l3, q3], axis=1).reshape(2 * m, LANES)

        # Conversion level (half_tree_dpf.cuh:320-349).
        t = n3 & ONE
        tm = np.uint32(0) - t
        hcw0 = c_ref[KERNEL_LEVELS - 1, 0]
        hcw1 = c_ref[KERNEL_LEVELS - 1, 1]
        hcw2 = c_ref[KERNEL_LEVELS - 1, 2]
        hcw3r = c_ref[KERNEL_LEVELS - 1, 3]
        lcw_0 = hcw3r & ONE
        hcw3 = hcw3r & NOTONE
        lcw_1 = c_ref[KERNEL_LEVELS - 1, 4] & ONE
        outs = []
        for sigma, lcw in ((0, lcw_0), (1, lcw_1)):
            n3s = (n3 & NOTONE) | np.uint32(sigma)
            (h0, h1, h2, h3), = chacha_block(
                n0 ^ hk[0], n1 ^ hk[1], n2 ^ hk[2], n3s ^ hk[3],
                nonce, 1, rounds, unroll=unroll)
            low = (h3 & ONE) ^ (t & lcw)
            outs.append(((h0 ^ (hcw0 & tm), h1 ^ (hcw1 & tm),
                          h2 ^ (hcw2 & tm),
                          (h3 & NOTONE) ^ (hcw3 & tm)), low))
        (a, la), (b, lb) = outs
        m = n0.shape[0]
        for i in range(4):
            ho_ref[i, 0] = jnp.stack([a[i], b[i]], axis=1).reshape(
                2 * m, LANES)
        lo_ref[0] = jnp.stack([la, lb], axis=1).reshape(2 * m, LANES)

    return kernel


def ht_eval_all(prg1, group, in_bits: int, party: int, hash_key,
                s0: jax.Array, cws: jax.Array, ocw: jax.Array,
                rounds: int = 20, interpret: bool = False,
                force_kernel: bool = False) -> jax.Array:
    """Half-Tree full-domain evaluation via the hybrid kernel."""
    from fss_tpu.schemes import half_tree_dpf as _ht

    threshold = (MIN_BITS if (interpret or force_kernel)
                 else KERNEL_WORTHWHILE_BITS)
    if in_bits < threshold or (not interpret and not _on_tpu()):
        return _ht.eval_all(prg1, group, in_bits, party,
                            jnp.asarray(hash_key, dtype=jnp.uint32), s0,
                            cws, ocw)

    hk = jnp.asarray(hash_key, dtype=jnp.uint32)
    k = in_bits - MIN_BITS + 7
    node = blk.set_lsb(s0, np.uint32(party))[None, :]
    for i in range(k):
        t = blk.get_lsb(node)
        h = prg1(jnp.bitwise_xor(hk, node))[0]
        left = blk.masked_xor(t, h, cws[i, 0:4])
        right = jnp.bitwise_xor(left, node)
        m = node.shape[0]
        node = jnp.stack([left, right], axis=1).reshape(2 * m, 4)

    ntiles = (1 << k) // LANES
    roots4 = jnp.transpose(node, (1, 0)).reshape(4, ntiles, 1, LANES)
    cw_table = cws[k:in_bits, :].astype(jnp.uint32)
    nonce = tuple(np.uint32(int(n) & 0xFFFFFFFF) for n in prg1.nonce)
    hk_t = tuple(int(v) for v in np.asarray(hash_key, dtype=np.uint32))
    kern = _make_ht_kernel(nonce, rounds, hk_t, unroll=not interpret)
    ho, lo = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((4, 1, 1, LANES), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KERNEL_LEVELS, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((4, 1, ROWS, LANES), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, ntiles, ROWS, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((ntiles, ROWS, LANES), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(roots4, cw_table)

    high = jnp.transpose(ho, (1, 3, 2, 0)).reshape(1 << in_bits, 4)
    low = jnp.transpose(lo, (0, 2, 1)).reshape(1 << in_bits)
    y = group.from_block(high)
    oc = group.from_block(jnp.broadcast_to(jnp.asarray(ocw), high.shape))
    y = jnp.where(low.astype(jnp.bool_)[:, None], group.add(y, oc), y)
    if party:
        y = group.neg(y)
    return group.into_block(y)


def expand_leaves(prg2, in_bits: int, party: int, s0: jax.Array,
                  cws: jax.Array, rounds: int = 20,
                  interpret: bool = False):
    """Hybrid expansion to the leaf layer: (s_leaves [2^n, 4],
    t_leaves [2^n]) in sequential x order. Shared by DPF EvalAll, Grotto
    (control bits only) and VDPF EvalAll."""
    k = in_bits - MIN_BITS + 7  # prefix levels -> 2^k roots, 128/tile
    s = blk.clear_lsb(s0)[None, :]
    t = jnp.full((1,), np.uint32(party), dtype=jnp.uint32)
    for i in range(k):
        s_cw, tl_cw, tr_cw = _tree.unpack_cw_row(cws[i])
        s, t = _tree.expand_level(prg2, s, t, s_cw, tl_cw, tr_cw)

    ntiles = (1 << k) // LANES
    packed = blk.set_lsb(s, t)  # [2^k, 4]
    roots4 = jnp.transpose(packed, (1, 0)).reshape(4, ntiles, 1, LANES)
    cw_table = cws[k:in_bits, :].astype(jnp.uint32)

    so, tb = _expand_packed(roots4, cw_table, in_bits=in_bits,
                            nonce=prg2.nonce, rounds=rounds,
                            interpret=interpret)

    # [4, tiles, p(rows), l(lanes)] -> x = (tile, l, p) sequential order.
    s_leaves = jnp.transpose(so, (1, 3, 2, 0)).reshape(1 << in_bits, 4)
    t_leaves = jnp.transpose(tb, (0, 2, 1)).reshape(1 << in_bits)
    return s_leaves, t_leaves


def eval_all(prg2, group, in_bits: int, party: int, s0: jax.Array,
             cws: jax.Array, rounds: int = 20,
             interpret: bool = False,
             force_kernel: bool = False) -> jax.Array:
    """Full-domain DPF evaluation via the hybrid kernel; [2^in_bits, 4].

    ``prg2`` must be the ChaCha PRG whose nonce/rounds drive the kernel
    (also used for the XLA prefix so the two phases agree). Small domains
    use the plain XLA path.
    """
    from fss_tpu.schemes import dpf as _dpf

    threshold = (MIN_BITS if (interpret or force_kernel)
                 else KERNEL_WORTHWHILE_BITS)
    if in_bits < threshold or (not interpret and not _on_tpu()):
        return _dpf.eval_all(prg2, group, in_bits, party, s0, cws)
    s_leaves, t_leaves = expand_leaves(prg2, in_bits, party, s0, cws,
                                       rounds, interpret)
    return _dpf.finalize_leaves(group, in_bits, party, s_leaves, t_leaves,
                                cws)


def vdpf_eval_all_chunked(prg2, xor_hash, hash64, group, in_bits: int,
                          party: int, s0: jax.Array, cws: jax.Array,
                          cs: jax.Array, ocw: jax.Array, rounds: int = 20,
                          chunk: int = 256, interpret: bool = False,
                          fold: str = "tree", force_kernel: bool = False):
    """VDPF full-domain evaluation with a batched proof fold:
    hybrid-kernel tree expansion, batched output conversion and per-point
    hashes, then ``fold`` = "tree" (log-depth Merkle fold, default) or
    "chunked" (two-level chain), both documented variants in
    schemes.vdpf. Returns (ys [2^n, 4], pi [4, 4]); both parties must use
    the same path.
    """
    from fss_tpu.schemes import vdpf as _vdpf

    n = 1 << in_bits
    threshold = (MIN_BITS if (interpret or force_kernel)
                 else KERNEL_WORTHWHILE_BITS)
    if in_bits >= threshold and (interpret or _on_tpu()):
        s_leaves, t_leaves = expand_leaves(prg2, in_bits, party, s0,
                                           cws[:in_bits], rounds,
                                           interpret)
    else:
        s = blk.clear_lsb(s0)[None, :]
        t = jnp.full((1,), np.uint32(party), dtype=jnp.uint32)
        for i in range(in_bits):
            s_cw, tl_cw, tr_cw = _tree.unpack_cw_row(cws[i])
            s, t = _tree.expand_level(prg2, s, t, s_cw, tl_cw, tr_cw)
        s_leaves, t_leaves = s, t

    y = group.from_block(s_leaves)
    y = jnp.where(t_leaves.astype(jnp.bool_)[:, None],
                  group.add(y, jnp.broadcast_to(group.from_block(ocw),
                                                y.shape)), y)
    if party:
        y = group.neg(y)
    ys = group.into_block(y)

    xs = jnp.arange(n, dtype=jnp.uint32)
    x_lanes = blk.pack_inputs(xs, min(in_bits, 32))

    # BLAKE3 hashes route through the fused Pallas hash kernels; other
    # hash configs (e.g. SHA-256) use their jnp implementations.
    iv = _blake3_iv_of(xor_hash)
    if iv is not None and not interpret and _on_tpu():
        from fss_tpu.ops import blake3_pallas as _b3
        pts = _b3.xor_hash_batch(
            x_lanes, s_leaves, iv)
        hash64_fast = lambda m: _b3.hash64_batch(m, iv)
    else:
        pts = xor_hash(x_lanes, s_leaves)
        hash64_fast = None
    pts = jnp.where(t_leaves.astype(jnp.bool_)[:, None, None],
                    jnp.bitwise_xor(pts, cs), pts)
    if fold == "tree":
        if hash64_fast is not None:
            pi = _prove_tree_batched(hash64_fast, pts, cs)
        else:
            pi = _vdpf.prove_tree(hash64, pts, cs)
    else:
        pi = _vdpf.prove_chunked(hash64, pts, cs, chunk=min(chunk, n))
    return ys, pi


def _blake3_iv_of(fn):
    from fss_tpu.hash.blake3 import Blake3
    obj = getattr(fn, "__self__", None)
    if isinstance(obj, Blake3):
        return tuple(int(w) for w in obj.iv)
    return None


def _prove_tree_batched(hash64_batch_fn, pts, cs):
    """schemes.vdpf.prove_tree with a batched (kernel) hash64: identical
    structure and bytes, every level one kernel call."""
    h = hash64_batch_fn(pts)  # [N, 2, 4]
    while h.shape[0] > 1:
        h = hash64_batch_fn(h.reshape(h.shape[0] // 2, 4, 4))
    return jnp.concatenate([h[0], cs[2:4]], axis=0)


def grotto_eval_all(prg2, in_bits: int, party: int, s0: jax.Array,
                    cws: jax.Array, rounds: int = 20,
                    interpret: bool = False,
                    force_kernel: bool = False) -> jax.Array:
    """Grotto full-domain comparison shares via the hybrid kernel:
    leaf control bits + prefix-XOR scan (grotto_dcf.cuh:151-163)."""
    from fss_tpu.schemes import grotto_dcf as _gr

    threshold = (MIN_BITS if (interpret or force_kernel)
                 else KERNEL_WORTHWHILE_BITS)
    if in_bits < threshold or (not interpret and not _on_tpu()):
        return _gr.eval_all(prg2, in_bits, party, s0, cws)
    _, t_leaves = expand_leaves(prg2, in_bits, party, s0, cws, rounds,
                                interpret)
    return jax.lax.associative_scan(jnp.bitwise_xor, t_leaves)
