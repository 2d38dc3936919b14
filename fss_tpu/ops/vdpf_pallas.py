"""VDPF batched point evaluation on the fused DPF tree kernel.

The VDPF eval tree walk (vdpf.cuh:189-225) is identical to the DPF's, so
the fused Pallas kernel from ops.dpf_pallas does the heavy lifting; the
output share and the corrected per-point hash pi~ = H(x, s) ^ (t ? cs : 0)
are one cheap XLA pass over the kernel's (seed, t) outputs (the BLAKE3 /
SHA-256 hash is rolled jnp — a single compression per point, a small
fraction of the in_bits ChaCha blocks the kernel already did).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fss_tpu import block as blk
from fss_tpu.ops import dpf_pallas

LANES = dpf_pallas.LANES


def pack_keys(s0: jax.Array, cws: jax.Array, xs: jax.Array, in_bits: int,
              block_rows: int = dpf_pallas.DEFAULT_BLOCK_ROWS):
    """Like dpf_pallas.pack_keys but for VDPF's (in_bits, 8) key rows
    (no output-CW row; vdpf.cuh:88-91)."""
    B = xs.shape[0]
    tile = block_rows * LANES
    Bp = ((B + tile - 1) // tile) * tile
    T = Bp // LANES

    def padb(a):
        return jnp.pad(a, [(0, Bp - B)] + [(0, 0)] * (a.ndim - 1))

    seeds4 = jnp.transpose(padb(s0), (1, 0)).reshape(4, T, LANES)
    cws_t = jnp.transpose(padb(cws), (1, 2, 0)).reshape(in_bits, 8, T,
                                                        LANES)
    xs2 = padb(jnp.asarray(xs, dtype=jnp.uint32)).reshape(T, LANES)
    return seeds4, cws_t, xs2, B


def eval_points(prg_nonce, xor_hash, group, in_bits: int, party: int,
                s0: jax.Array, cws: jax.Array, cs: jax.Array,
                ocw: jax.Array, xs: jax.Array, rounds: int = 20,
                block_rows: int = dpf_pallas.DEFAULT_BLOCK_ROWS,
                interpret: bool = False):
    """Returns (ys [B, 4], pi_tildes [B, 4, 4]); bit-exact with
    schemes.vdpf.eval_points."""
    xs = jnp.asarray(xs, dtype=jnp.uint32)
    seeds4, cws_t, xs2, B = pack_keys(s0, cws, xs, in_bits, block_rows)
    so, t = dpf_pallas.eval_packed(seeds4, cws_t, xs2, in_bits=in_bits,
                                   party=party, nonce=tuple(prg_nonce),
                                   rounds=rounds, block_rows=block_rows,
                                   interpret=interpret)
    s = jnp.transpose(so.reshape(4, -1), (1, 0))[:B]
    tb = t.reshape(-1)[:B]

    cs = jnp.broadcast_to(jnp.asarray(cs), (B, 4, 4))
    ocw = jnp.broadcast_to(jnp.asarray(ocw), (B, 4))
    y = group.from_block(s)
    y = jnp.where(tb.astype(jnp.bool_)[:, None],
                  group.add(y, group.from_block(ocw)), y)
    if party:
        y = group.neg(y)

    x_lanes = blk.pack_inputs(xs, in_bits)
    pi = xor_hash(x_lanes, s)
    pi = jnp.where(tb.astype(jnp.bool_)[:, None, None],
                   jnp.bitwise_xor(pi, cs), pi)
    return group.into_block(y), pi
