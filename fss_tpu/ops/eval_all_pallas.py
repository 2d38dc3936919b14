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
from fss_tpu.ops._chacha_core import FULL, NOTONE, ONE, chacha_block
from fss_tpu.schemes import _tree

LANES = 128
KERNEL_LEVELS = 6
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
            tm = jnp.where(t.astype(jnp.bool_), FULL, np.uint32(0))
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
             interpret: bool = False) -> jax.Array:
    """Full-domain DPF evaluation via the hybrid kernel; [2^in_bits, 4].

    ``prg2`` must be the ChaCha PRG whose nonce/rounds drive the kernel
    (also used for the XLA prefix so the two phases agree). Small domains
    use the plain XLA path.
    """
    from fss_tpu.schemes import dpf as _dpf

    threshold = MIN_BITS if interpret else KERNEL_WORTHWHILE_BITS
    if in_bits < threshold:
        return _dpf.eval_all(prg2, group, in_bits, party, s0, cws)
    s_leaves, t_leaves = expand_leaves(prg2, in_bits, party, s0, cws,
                                       rounds, interpret)
    return _dpf.finalize_leaves(group, in_bits, party, s_leaves, t_leaves,
                                cws)


def grotto_eval_all(prg2, in_bits: int, party: int, s0: jax.Array,
                    cws: jax.Array, rounds: int = 20,
                    interpret: bool = False) -> jax.Array:
    """Grotto full-domain comparison shares via the hybrid kernel:
    leaf control bits + prefix-XOR scan (grotto_dcf.cuh:151-163)."""
    from fss_tpu.schemes import grotto_dcf as _gr

    threshold = MIN_BITS if interpret else KERNEL_WORTHWHILE_BITS
    if in_bits < threshold:
        return _gr.eval_all(prg2, in_bits, party, s0, cws)
    _, t_leaves = expand_leaves(prg2, in_bits, party, s0, cws, rounds,
                                interpret)
    return jax.lax.associative_scan(jnp.bitwise_xor, t_leaves)
