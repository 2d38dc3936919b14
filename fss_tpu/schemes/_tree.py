"""Shared level-step primitives for GGM-tree FSS schemes.

The BGI-style tree step is identical across DPF (dpf.cuh:169-199), VDPF
(vdpf.cuh:195-225) and Grotto (grotto_dcf.cuh:190-237): one PRG expansion,
clamped-bit extraction, and a conditional correction-word XOR gated by the
party's control bit. Everything here is batched over arbitrary leading dims
and built from uint32 lane ops only (VPU-friendly, no gathers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fss_tpu import block as blk

_ONE = np.uint32(1)


def split_seed(s_raw: jax.Array):
    """Extract the control bit and clear it: (s, t) from a raw PRG output."""
    t = blk.get_lsb(s_raw)
    return blk.clear_lsb(s_raw), t


def correct_children(sl, tl, sr, tr, t, s_cw, tl_cw, tr_cw):
    """Apply the correction word to both children when t is set.

    All t/cw-bit args are uint32 0/1 arrays of the batch shape.
    """
    tb = t.astype(jnp.bool_)
    sl = jnp.where(tb[..., None], jnp.bitwise_xor(sl, s_cw), sl)
    sr = jnp.where(tb[..., None], jnp.bitwise_xor(sr, s_cw), sr)
    tl = tl ^ (t & tl_cw)
    tr = tr ^ (t & tr_cw)
    return sl, tl, sr, tr


def choose(bit, left, right):
    """bit ? right : left, for block ([..., 4]) operands."""
    return jnp.where(bit.astype(jnp.bool_)[..., None], right, left)


def choose_bit(bit, left, right):
    """bit ? right : left, for uint32 0/1 scalars/arrays."""
    return jnp.where(bit.astype(jnp.bool_), right, left)


def unpack_cw_row(row: jax.Array):
    """A (..., 8) uint32 cw row -> (s_cw cleared, tl_cw, tr_cw).

    Layout parity with the reference's 32-byte Cw struct (dpf.cuh:76-81):
    lanes 0-3 hold s (tl in its clamped bit), lane 4 holds tr.
    """
    s_cw_raw = row[..., 0:4]
    tl_cw = blk.get_lsb(s_cw_raw)
    s_cw = blk.clear_lsb(s_cw_raw)
    tr_cw = row[..., 4] & _ONE
    return s_cw, tl_cw, tr_cw


def pack_cw_row(s_cw: jax.Array, tl_cw, tr_cw) -> jax.Array:
    s = blk.set_lsb(s_cw, tl_cw)
    tr = (jnp.asarray(tr_cw, dtype=jnp.uint32) & _ONE)[..., None]
    pad = jnp.zeros((*s.shape[:-1], 3), dtype=jnp.uint32)
    return jnp.concatenate([s, tr, pad], axis=-1)


def expand_level(prg2, s, t, s_cw, tl_cw, tr_cw):
    """One breadth-first doubling step: [M] nodes -> [2M] nodes.

    s: [M, 4]; t: [M]; cw args are per-level scalars (or [M]-broadcast).
    Children are interleaved (left, right) to preserve index order.
    """
    sl_raw, sr_raw = prg2(s)
    sl, tl = split_seed(sl_raw)
    sr, tr = split_seed(sr_raw)
    sl, tl, sr, tr = correct_children(
        sl, tl, sr, tr, t, s_cw, tl_cw, tr_cw)
    m = s.shape[0]
    s_next = jnp.stack([sl, sr], axis=1).reshape(2 * m, 4)
    t_next = jnp.stack([tl, tr], axis=1).reshape(2 * m)
    return s_next, t_next
