"""Pallas TPU kernel for batched DCF point evaluation.

Same fused-levels SoA design as ops.dpf_pallas, with the DCF's running
value accumulated in-kernel (dcf.cuh:205-276): each level is one ChaCha
mul=4 expansion, a correction-word application, a value-CW add, and a child
select — all on [rows, 128] uint32 word tiles.

The value accumulator is group-kind-specialized (group/uint.cuh:27-93 is
generic over the same kinds), one mode per algebra:

  xor     Bytes — plane XOR.
  wrap    Uint with mod == 0 or a power-of-two mod, bits <= 64: wrapping
          128-bit lane adds. Word carries only travel upward and every
          group-relevant modulus divides 2^128, so masking once at
          finalize equals per-step group adds.
  mod64   Uint with a non-power-of-two mod, bits <= 64: contributions
          are masked to the group width before the add, so the lane
          accumulator holds the EXACT integer sum (<= 2^(bits+7) fits
          128 bits); finalize long-divides it by mod once.
  mod128  Uint bits == 128 with a power-of-two mod (<= 2^127,
          groups.Uint.__post_init__): contributions are decoded out of
          the clamped-bit block encoding (value bits 96..126 live in
          word-3 bits 1..31) before the add; finalize masks the wrapped
          sum to the modulus width.
  mod128np  Uint bits == 128 with a NON-power-of-two mod: decoded
          contributions (< 2^127 each, <= 2*in_bits + 1 of them) are
          accumulated EXACTLY in a 5-word 160-bit lane accumulator
          (sum < 2^135); finalize long-divides the low 128 bits once
          and folds the high word with a static ``2^128 mod m``
          double-and-add (8 steps — the high word is < 2^8). This is
          the generalization sketched in docs/design.md; reference
          group/uint.cuh:59-81 is generic over the same Uint<u128, mod>.

Party negation distributes over the abelian group sum, so it happens
once at finalize.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fss_tpu import groups
from fss_tpu.ops import dpf_pallas
from fss_tpu.ops._chacha_core import (FULL, NOTONE, ONE, add128,
                                      chacha_block)

LANES = 128
DEFAULT_BLOCK_ROWS = 16  # mul=4 state + cws use more VMEM than the DPF


def _group_mode(group) -> str | None:
    """Accumulator mode for the in-kernel value thread (module docstring),
    or None when the group needs the XLA fallback."""
    if isinstance(group, groups.Bytes):
        return "xor"
    if not isinstance(group, groups.Uint):
        return None
    if group.bits == 128:
        return "mod128" if group._mod_is_pow2 else "mod128np"
    if group.mod == 0 or group._mod_is_pow2:
        return "wrap"
    return "mod64"


def _value_mask(group) -> tuple:
    """Per-word mask applied to each value contribution before the add
    (static kernel constants)."""
    mode = _group_mode(group)
    if mode in ("xor", "wrap"):
        return (FULL, FULL, FULL, FULL)  # finalize masks (pow2 algebra)
    if mode in ("mod128", "mod128np"):
        return (FULL, FULL, FULL, NOTONE)  # clamped t bit, then decode
    bits = group.bits
    return tuple(
        FULL if bits >= 32 * (wi + 1)
        else np.uint32((1 << (bits - 32 * wi)) - 1) if bits > 32 * wi
        else np.uint32(0)
        for wi in range(4))


def kernel_supports_group(group) -> bool:
    return _group_mode(group) is not None


def acc_words(group_mode: str) -> int:
    """Value-accumulator lane words: 5 (160-bit exact sum) for the
    non-pow2 128-bit mode, 4 otherwise."""
    return 5 if group_mode == "mod128np" else 4


def _make_kernel(in_bits: int, party: int, nonce, rounds: int,
                 group_mode: str, vmask: tuple):
    wide = in_bits > 32  # x as 4 packed uint32 lanes
    nacc = acc_words(group_mode)

    def acc(a, b):
        if group_mode == "xor":
            return tuple(x ^ y for x, y in zip(a, b))
        if group_mode == "mod128np":
            # 160-bit carry-chain add; b is a 4-word contribution.
            out, c = [], None
            for i in range(5):
                s = a[i] + (b[i] if i < 4 else np.uint32(0))
                cn = (s < a[i]).astype(jnp.uint32)
                if c is not None:
                    sc = s + c
                    cn = cn + (sc < s).astype(jnp.uint32)
                    s = sc
                out.append(s)
                c = cn
            return tuple(out)
        return add128(a, b)

    def vfix(c):
        """Mask (and for 128-bit groups decode) a value contribution so
        the lane accumulator tracks group-exact sums."""
        if group_mode in ("xor", "wrap"):
            return c
        c = tuple(w & m for w, m in zip(c, vmask))
        if group_mode in ("mod128", "mod128np"):
            c = (c[0], c[1], c[2], c[3] >> np.uint32(1))
        return c

    def kernel(s_ref, c_ref, x_ref, vo_ref, so_ref, t_ref):
        w = [s_ref[i] for i in range(4)]
        w[3] = w[3] & NOTONE
        t = jnp.zeros_like(w[0]) + np.uint32(party)
        x = None if wide else x_ref[:]
        zero = jnp.zeros_like(w[0])
        v = (zero,) * nacc

        def level(i, carry):
            w0, w1, w2, w3, t = carry[:5]
            v0, v1, v2, v3 = carry[5:9]
            vhi = carry[9:]
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

            tm = np.uint32(0) - t  # 0/1 -> arithmetic mask, no vselect
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

            pos = np.uint32(in_bits - 1) - i.astype(jnp.uint32)
            if wide:
                xb = ((x_ref[pos >> np.uint32(5)]
                       >> (pos & np.uint32(31))) & ONE).astype(jnp.bool_)
            else:
                xb = ((x >> pos) & ONE).astype(jnp.bool_)

            # v += (xb ? vr : vl) + (t ? v_cw : 0)
            step = tuple(jnp.where(xb, a, b)
                         for a, b in zip((vr0, vr1, vr2, vr3),
                                         (vl0, vl1, vl2, vl3)))
            vcm = tuple(c & tm for c in v_cw)
            v = acc(acc((v0, v1, v2, v3, *vhi), vfix(step)), vfix(vcm))

            w0 = jnp.where(xb, r0, l0)
            w1 = jnp.where(xb, r1, l1)
            w2 = jnp.where(xb, r2, l2)
            w3 = jnp.where(xb, r3, l3)
            t = jnp.where(xb, tr, tl)
            return (w0, w1, w2, w3, t, *v)

        out = jax.lax.fori_loop(0, in_bits, level, (*w, t, *v))
        w0, w1, w2, w3, t = out[:5]
        for k in range(nacc):
            vo_ref[k] = out[5 + k]
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
    if xsp.ndim == 2:  # packed lanes (in_bits > 32)
        xs2 = jnp.transpose(xsp, (1, 0)).reshape(4, T, LANES)
    else:
        xs2 = xsp.reshape(T, LANES)
    v_last = cws[:, in_bits, 4:8]
    return seeds4, cws_t, xs2, v_last, B


@functools.partial(jax.jit,
                   static_argnames=("in_bits", "party", "nonce", "rounds",
                                    "group_mode", "vmask", "block_rows",
                                    "interpret"))
def eval_packed(seeds4, cws_t, xs2, in_bits: int, party: int, nonce,
                group_mode: str = "wrap",
                vmask: tuple = (FULL, FULL, FULL, FULL),
                rounds: int = 20,
                block_rows: int = DEFAULT_BLOCK_ROWS,
                interpret: bool = False):
    nrows = seeds4.shape[1]
    # Same wide-domain VMEM clamp as dpf_pallas.eval_packed: the cw
    # block is 16.78 MB at in_bits=128 / block_rows=32 (> Mosaic's
    # 16 MB scoped budget).
    block_rows = dpf_pallas.clamp_block_rows(in_bits, block_rows)
    assert nrows % block_rows == 0
    grid = (nrows // block_rows,)
    nonce = tuple(np.uint32(int(n) & 0xFFFFFFFF) for n in nonce)
    kern = _make_kernel(in_bits, party, nonce, rounds, group_mode, vmask)
    nacc = acc_words(group_mode)
    x_spec = (pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
              if in_bits > 32 else
              pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                           memory_space=pltpu.VMEM))
    vo, so, t = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_bits, 8, block_rows, LANES),
                         lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM),
            x_spec,
        ],
        out_specs=[
            pl.BlockSpec((nacc, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nacc, nrows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((4, nrows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nrows, LANES), jnp.uint32),
        ],
        # Wide-domain scoped-VMEM raise (see dpf_pallas.eval_packed —
        # this kernel is strictly larger: mul=4 state + value thread).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=(32 * 2**20 if in_bits > 64 else None)),
        interpret=interpret,
    )(seeds4, cws_t, xs2)
    return vo, so, t


def _acc_to_value(group, v_raw: jax.Array) -> jax.Array:
    """Convert the kernel's value accumulator to group value lanes."""
    mode = _group_mode(group)
    if mode in ("xor", "wrap"):
        return group.from_block(v_raw)
    if mode == "mod128":
        # Lanes are already decoded values; the wrapped sum's residue
        # mod a power of two dividing 2^128 is exact.
        return groups._mask_to_bits(v_raw, group.mod.bit_length() - 1)
    if mode == "mod128np":
        # v_raw [B, 5] is the EXACT 160-bit sum (< 2^135). Reduce the
        # low 128 bits by long division, then fold the high word with a
        # static 2^128 mod m via 8-step double-and-add (high word
        # < 2^8; every intermediate stays < 2^128 because m <= 2^127).
        m = jnp.asarray(group._mod_lanes())
        c128 = (1 << 128) % group.mod
        c128_l = jnp.asarray(np.array(
            [(c128 >> (32 * i)) & 0xFFFFFFFF for i in range(4)],
            dtype=np.uint32))

        def _cond_sub(s):
            ge = groups._ge128(s, m)
            return jnp.where(ge[..., None], groups._sub128(s, m), s)

        lo = groups._mod_reduce(v_raw[..., :4], group._mod_lanes(), 128)
        hi = v_raw[..., 4]
        r2 = jnp.zeros_like(lo)
        for b in range(7, -1, -1):
            r2 = _cond_sub(groups._add128(r2, r2))
            bit = ((hi >> np.uint32(b)) & np.uint32(1)).astype(jnp.bool_)
            addend = jnp.where(bit[..., None], c128_l,
                               jnp.zeros_like(c128_l))
            r2 = _cond_sub(groups._add128(r2, addend))
        return _cond_sub(groups._add128(lo, r2))
    # mod64: v_raw is the exact sum of <= 2*128 masked terms, each
    # < 2^bits, so it fits in bits+8 bits.
    return groups._mod_reduce(v_raw, group._mod_lanes(),
                              min(group.bits + 8, 128))


def finalize(group, party: int, vo, so, t, v_last: jax.Array,
             batch: int) -> jax.Array:
    """Group-convert kernel outputs to [B, 4] shares (dcf.cuh:258-276)."""
    v_raw = jnp.transpose(vo.reshape(vo.shape[0], -1), (1, 0))[:batch]
    s = jnp.transpose(so.reshape(4, -1), (1, 0))[:batch]
    tb = t.reshape(-1)[:batch]
    v = _acc_to_value(group, v_raw)
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
    mode = _group_mode(group)
    assert mode is not None
    seeds4, cws_t, xs2, v_last, B = pack_keys(s0, cws, xs, in_bits,
                                              block_rows)
    vo, so, t = eval_packed(seeds4, cws_t, xs2, in_bits=in_bits,
                            party=party, nonce=tuple(prg_nonce),
                            group_mode=mode, vmask=_value_mask(group),
                            rounds=rounds,
                            block_rows=block_rows, interpret=interpret)
    return finalize(group, party, vo, so, t, v_last, B)


# ---------------------------------------------------------------------------
# Fused batched Gen kernel (dcf.cuh:108-194): both parties' tree walks and
# the group value thread run in-kernel; emits complete (in_bits+1, 8) key
# rows. Group support matches the eval kernel: Bytes (XOR) and wrapping
# Uint up to 64 bits (mod groups take the XLA path).
# ---------------------------------------------------------------------------


def _group_ops(group):
    """(add, neg, into_mask) for in-kernel group arithmetic."""
    from fss_tpu.ops._chacha_core import neg128

    if isinstance(group, groups.Bytes):
        return (lambda a, b: tuple(x ^ y for x, y in zip(a, b)),
                lambda a: a, (FULL, FULL, FULL, FULL))
    assert isinstance(group, groups.Uint) and group.mod == 0
    bits = group.bits
    mask = [np.uint32(0)] * 4
    for wi in range(4):
        lo = 32 * wi
        if bits > lo:
            mask[wi] = FULL if bits >= lo + 32 else \
                np.uint32((1 << (bits - lo)) - 1)
    return add128, neg128, tuple(mask)


def gen_kernel_supports_group(group) -> bool:
    if isinstance(group, groups.Bytes):
        return True
    return isinstance(group, groups.Uint) and group.mod == 0


def _bitsel(m, a, b):
    """Per-word bitwise select: m ? a : b with m a 0/~0 mask."""
    return tuple(bw ^ (m & (aw ^ bw)) for aw, bw in zip(a, b))


def _make_gen_kernel(in_bits: int, nonce, rounds: int, pred_lt: bool,
                     group, chacha_unroll: bool = True):
    g_add, g_neg, into_mask = _group_ops(group)

    def g_sub(a, b):
        return g_add(a, g_neg(b))

    def kernel(s_ref, a_ref, b_ref, c_ref):
        s0 = [s_ref[i] for i in range(4)]
        s1 = [s_ref[4 + i] for i in range(4)]
        s0[3] &= NOTONE
        s1[3] &= NOTONE
        zero = jnp.zeros_like(s0[0])
        t0 = zero
        t1 = zero + ONE
        v = (zero, zero, zero, zero)
        # Clamped beta as a group value (From applies the width mask).
        b_val = tuple((b_ref[i] & into_mask[i]) if i < 3
                      else ((b_ref[3] & NOTONE) & into_mask[3])
                      for i in range(4))
        a = a_ref[:]

        def level(i, carry):
            s0w0, s0w1, s0w2, s0w3, s1w0, s1w1, s1w2, s1w3, t0, t1, \
                v0, v1, v2, v3 = carry
            v = (v0, v1, v2, v3)
            o0 = chacha_block(s0w0, s0w1, s0w2, s0w3, nonce, 4, rounds,
                              unroll=chacha_unroll)
            o1 = chacha_block(s1w0, s1w1, s1w2, s1w3, nonce, 4, rounds,
                              unroll=chacha_unroll)
            (l0w), (v0l), (r0w), (v0r) = o0
            (l1w), (v1l), (r1w), (v1r) = o1
            t0l = l0w[3] & ONE
            t0r = r0w[3] & ONE
            t1l = l1w[3] & ONE
            t1r = r1w[3] & ONE
            l0w = (l0w[0], l0w[1], l0w[2], l0w[3] & NOTONE)
            r0w = (r0w[0], r0w[1], r0w[2], r0w[3] & NOTONE)
            l1w = (l1w[0], l1w[1], l1w[2], l1w[3] & NOTONE)
            r1w = (r1w[0], r1w[1], r1w[2], r1w[3] & NOTONE)
            # Value blocks: clamp then From (width mask).
            fr = lambda wds: tuple(
                (wds[j] & into_mask[j]) if j < 3
                else ((wds[3] & NOTONE) & into_mask[3]) for j in range(4))
            v0l, v0r, v1l, v1r = fr(v0l), fr(v0r), fr(v1l), fr(v1r)

            shift = np.uint32(in_bits - 1) - i.astype(jnp.uint32)
            ab = (a >> shift) & ONE
            abm = zero - ab  # 0/~0

            s_cw = _bitsel(abm,
                           tuple(x ^ y for x, y in zip(l0w, l1w)),
                           tuple(x ^ y for x, y in zip(r0w, r1w)))
            tl_cw = t0l ^ t1l ^ ab ^ ONE
            tr_cw = t0r ^ t1r ^ ab

            # v_cw = -v + (off-path side: ab ? l : r) v1 - v0 [+ beta]
            v1o = _bitsel(abm, v1l, v1r)
            v0o = _bitsel(abm, v0l, v0r)
            v_cw = g_add(g_neg(v), g_sub(v1o, v0o))
            # beta joins when the off-path side is the predicate's side:
            # kLt adds on the left (ab=1), kGt on the right (ab=0).
            bm = abm if pred_lt else ~abm
            v_cw = g_add(v_cw, tuple(w & bm for w in b_val))
            t1m = zero - t1
            v_cw = _bitsel(t1m, g_neg(v_cw), v_cw)

            # v += (kept side) v0 - v1, then +/- v_cw by t1.
            v0k = _bitsel(abm, v0r, v0l)
            v1k = _bitsel(abm, v1r, v1l)
            v = g_add(v, g_sub(v0k, v1k))
            v = g_add(v, _bitsel(t1m, g_neg(v_cw), v_cw))

            c_ref[i, 0] = s_cw[0]
            c_ref[i, 1] = s_cw[1]
            c_ref[i, 2] = s_cw[2]
            c_ref[i, 3] = s_cw[3] | tl_cw
            vb = tuple(w & m for w, m in zip(v_cw, into_mask))
            c_ref[i, 4] = vb[0]
            c_ref[i, 5] = vb[1]
            c_ref[i, 6] = vb[2]
            c_ref[i, 7] = vb[3] | tr_cw

            tcw = jnp.where(ab.astype(jnp.bool_), tr_cw, tl_cw)
            tm0 = zero - t0
            tm1 = zero - t1
            k0 = _bitsel(abm, r0w, l0w)
            k1 = _bitsel(abm, r1w, l1w)
            n0 = tuple(kw ^ (cw & tm0) for kw, cw in zip(k0, s_cw))
            n1 = tuple(kw ^ (cw & tm1) for kw, cw in zip(k1, s_cw))
            nt0 = jnp.where(ab.astype(jnp.bool_), t0r, t0l) ^ (t0 & tcw)
            nt1 = jnp.where(ab.astype(jnp.bool_), t1r, t1l) ^ (t1 & tcw)
            return (*n0, *n1, nt0, nt1, *v)

        out = jax.lax.fori_loop(
            0, in_bits, level, (*s0, *s1, t0, t1, *v))
        s0f = out[0:4]
        s1f = out[4:8]
        t1f = out[9]
        v = out[10:14]

        fr = lambda wds: tuple(w & m for w, m in zip(wds, into_mask))
        v_np1 = g_add(g_sub(fr(s1f), fr(s0f)), g_neg(v))
        t1m = jnp.zeros_like(t1f) - t1f
        v_np1 = _bitsel(t1m, g_neg(v_np1), v_np1)
        vb = tuple(w & m for w, m in zip(v_np1, into_mask))
        zero = jnp.zeros_like(vb[0])
        c_ref[in_bits, 0] = zero
        c_ref[in_bits, 1] = zero
        c_ref[in_bits, 2] = zero
        c_ref[in_bits, 3] = zero
        c_ref[in_bits, 4] = vb[0]
        c_ref[in_bits, 5] = vb[1]
        c_ref[in_bits, 6] = vb[2]
        c_ref[in_bits, 7] = vb[3]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("in_bits", "nonce", "rounds", "pred",
                                    "group", "block_rows", "interpret"))
def gen_packed(seeds8, a2, b4, in_bits: int, nonce, pred: str, group,
               rounds: int = 20, block_rows: int = DEFAULT_BLOCK_ROWS,
               interpret: bool = False):
    # interpret mode rolls the ChaCha rounds (XLA:CPU compile pathology).
    """Fused batched DCF Gen; returns cws_t [in_bits+1, 8, T, 128]."""
    nrows = seeds8.shape[1]
    assert nrows % block_rows == 0
    grid = (nrows // block_rows,)
    nonce = tuple(np.uint32(int(n) & 0xFFFFFFFF) for n in nonce)
    kern = _make_gen_kernel(in_bits, nonce, rounds, pred == "lt", group,
                            chacha_unroll=not interpret)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((in_bits + 1, 8, block_rows, LANES),
                               lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((in_bits + 1, 8, nrows, LANES),
                                       jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(seeds8, a2, b4)


def gen_batch(prg_nonce, group, in_bits: int, pred: str, s0s: jax.Array,
              alphas: jax.Array, betas: jax.Array, rounds: int = 20,
              block_rows: int = DEFAULT_BLOCK_ROWS,
              interpret: bool = False) -> jax.Array:
    """Batched DCF key generation on the fused kernel; returns the
    standard [B, in_bits+1, 8] cws layout (alphas must fit uint32)."""
    from fss_tpu import block as blk
    from fss_tpu.ops import dpf_pallas as _dpfk

    seeds8, a2, B = _dpfk.pack_gen_inputs(s0s, alphas, in_bits, block_rows)
    tile = block_rows * LANES
    Bp = ((B + tile - 1) // tile) * tile
    T = Bp // LANES
    bpad = jnp.pad(blk.clear_lsb(jnp.asarray(betas, dtype=jnp.uint32)),
                   ((0, Bp - B), (0, 0)))
    b4 = jnp.transpose(bpad, (1, 0)).reshape(4, T, LANES)
    cws_t = gen_packed(seeds8, a2, b4, in_bits=in_bits,
                       nonce=tuple(prg_nonce), pred=pred, group=group,
                       rounds=rounds, block_rows=block_rows,
                       interpret=interpret)
    rows = jnp.transpose(cws_t.reshape(in_bits + 1, 8, T * LANES),
                         (2, 0, 1))[:B]
    return rows
