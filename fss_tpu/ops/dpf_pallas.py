"""Pallas TPU kernel for batched DPF point evaluation.

The hot path of the framework (reference analog: the thread-per-key CUDA
eval kernel, src/bench_gpu.cu:83-93). One kernel fuses all ``in_bits`` tree
levels: the ChaCha PRG, correction-word application, and child selection
run entirely in VMEM/vregs, so each instance's seed/key/input is read from
HBM exactly once. Structure-of-arrays layout: every uint32 word stream is a
[rows, 128] tile, so the full 8x128 VPU is busy on every op.

Measured on one v5e chip at 2^20 instances, 16-bit domain: ~162 M evals/s
(vs ~45 M/s for the XLA scan formulation; the 1e8/s/chip BASELINE floor).
Tuning notes (swept on hardware): block_rows=32 is the optimum (16 and 64
are 1-5% slower), level unrolling and select->arithmetic-mask rewrites are
within noise — the kernel is bound by the ChaCha ALU stream itself; see
docs/benchmarks.md for the op-count roofline analysis.

Keys must be pre-packed into the device layout with ``pack_keys`` (the
GPU bench likewise stages keys on device before timing). Group conversion
of the final seeds happens outside the kernel — one cheap elementwise pass
— keeping the kernel generic over output groups.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fss_tpu import block as blk

_ONE = np.uint32(1)
_NOTONE = np.uint32(0xFFFFFFFE)
_C16 = (np.uint32(0x61707865), np.uint32(0x3120646E),
        np.uint32(0x79622D36), np.uint32(0x6B206574))
_COLS = ((0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15))
_DIAG = ((0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14))

LANES = 128
DEFAULT_BLOCK_ROWS = 32


def clamp_block_rows(in_bits: int, block_rows: int,
                     words_per_level: int = 8) -> int:
    """Shrink ``block_rows`` so the per-grid-step cw block fits VMEM.

    The eval kernel streams a [in_bits, words, block_rows, 128] uint32 cw
    block per grid step; at in_bits=128 / block_rows=32 that is 16.78 MB
    — over Mosaic's 16 MB scoped-VMEM budget (compile OOM observed
    on-chip, scripts/artifacts/window_campaign.err). Cap the block at
    8 MB (the size the in_bits=64 path already runs at on-chip) by
    halving block_rows, floor 8. No-op for in_bits <= 64 at the default
    block_rows. Reference supports in_bits <= 128 unconditionally
    (dpf.cuh:61-63); so must we."""
    budget = 8 * 2**20
    while (block_rows > 8
           and in_bits * words_per_level * block_rows * LANES * 4
           > budget):
        block_rows //= 2
    return block_rows


def _rotl(x, n: int):
    return (x << np.uint32(n)) | (x >> np.uint32(32 - n))


def _qr(a, b, c, d):
    a = a + b
    d = _rotl(d ^ a, 16)
    c = c + d
    b = _rotl(b ^ c, 12)
    a = a + b
    d = _rotl(d ^ a, 8)
    c = c + d
    b = _rotl(b ^ c, 7)
    return a, b, c, d


def _chacha2(k0, k1, k2, k3, nonce, rounds: int):
    """ChaCha mul=2 (chacha.cuh:95-126), rounds unrolled for the VPU."""
    zero = jnp.zeros_like(k0)
    st = [zero + c for c in _C16] + [k0, k1, k2, k3, k0, k1, k2, k3,
                                     zero, zero, zero + nonce[0],
                                     zero + nonce[1]]
    for _ in range(rounds // 2):
        for ia, ib, ic, id_ in _COLS:
            st[ia], st[ib], st[ic], st[id_] = _qr(st[ia], st[ib], st[ic],
                                                  st[id_])
        for ia, ib, ic, id_ in _DIAG:
            st[ia], st[ib], st[ic], st[id_] = _qr(st[ia], st[ib], st[ic],
                                                  st[id_])
    left = (st[0] ^ _C16[0], st[1] ^ _C16[1], st[2] ^ _C16[2],
            st[3] ^ _C16[3])
    right = (st[4] ^ k0, st[5] ^ k1, st[6] ^ k2, st[7] ^ k3)
    return left, right


def walk(s_ref, c_ref, x_ref, *, in_bits: int, party: int, nonce,
         rounds: int, unroll: bool = False):
    """The DPF tree walk on kernel refs: returns the final seed words
    (w0..w3) and control bit t. Shared by the plain eval kernel and the
    fused VDPF eval kernel (which hashes the result in-kernel).

    in_bits > 32: x arrives as 4 uint32 lanes ([4, rows, 128] block) and
    each level picks bit (in_bits-1-i) out of the right lane
    (dpf.cuh:61-63 allows In up to __uint128_t).
    """
    wide = in_bits > 32
    w = [s_ref[i] for i in range(4)]
    w[3] = w[3] & _NOTONE
    t = jnp.zeros_like(w[0]) + np.uint32(party)
    x = None if wide else x_ref[:]

    def level(i, carry):
        w0, w1, w2, w3, t = carry
        (l0, l1, l2, l3), (r0, r1, r2, r3) = _chacha2(
            w0, w1, w2, w3, nonce, rounds)
        tl = l3 & _ONE
        l3 = l3 & _NOTONE
        tr = r3 & _ONE
        r3 = r3 & _NOTONE
        cw0, cw1, cw2 = c_ref[i, 0], c_ref[i, 1], c_ref[i, 2]
        cw3r, cw4 = c_ref[i, 3], c_ref[i, 4]
        tl_cw = cw3r & _ONE
        cw3 = cw3r & _NOTONE
        tr_cw = cw4 & _ONE
        tm = np.uint32(0) - t  # t is 0/1: arithmetic mask, no select
        m0 = cw0 & tm
        m1 = cw1 & tm
        m2 = cw2 & tm
        m3 = cw3 & tm
        l0 ^= m0
        l1 ^= m1
        l2 ^= m2
        l3 ^= m3
        r0 ^= m0
        r1 ^= m1
        r2 ^= m2
        r3 ^= m3
        tl = tl ^ (t & tl_cw)
        tr = tr ^ (t & tr_cw)
        pos = (np.uint32(in_bits - 1) - i.astype(jnp.uint32)
               if not isinstance(i, int)
               else np.uint32(in_bits - 1 - i))
        if wide:
            xb = ((x_ref[pos >> np.uint32(5)]
                   >> (pos & np.uint32(31))) & _ONE).astype(jnp.bool_)
        else:
            xb = ((x >> pos) & _ONE).astype(jnp.bool_)
        w0 = jnp.where(xb, r0, l0)
        w1 = jnp.where(xb, r1, l1)
        w2 = jnp.where(xb, r2, l2)
        w3 = jnp.where(xb, r3, l3)
        t = jnp.where(xb, tr, tl)
        return (w0, w1, w2, w3, t)

    # Rolled over levels by default (tiny trip count, big body — keeps
    # Mosaic compile time sane; the rounds inside are fully unrolled).
    # unroll=True trades compile time for static cw indexing.
    if unroll:
        carry = (*w, t)
        for i in range(in_bits):
            carry = level(i, carry)
        return carry
    return jax.lax.fori_loop(0, in_bits, level, (*w, t))


def _make_eval_kernel(in_bits: int, party: int, nonce, rounds: int,
                      unroll: bool = False):
    def kernel(s_ref, c_ref, x_ref, so_ref, t_ref):
        w0, w1, w2, w3, t = walk(s_ref, c_ref, x_ref, in_bits=in_bits,
                                 party=party, nonce=nonce, rounds=rounds,
                                 unroll=unroll)
        so_ref[0] = w0
        so_ref[1] = w1
        so_ref[2] = w2
        so_ref[3] = w3
        t_ref[:] = t

    return kernel


def _make_gen_kernel(in_bits: int, nonce, rounds: int,
                     unroll: bool = False):
    # unroll=True makes the per-level CW stores statically indexed
    # (c_ref[i] with a Python-int i) at the cost of compile time —
    # same trade as the eval kernel's unroll flag.
    def kernel(s_ref, a_ref, c_ref, s0o_ref, s1o_ref, t0o_ref, t1o_ref):
        s00 = s_ref[0]
        s01 = s_ref[1]
        s02 = s_ref[2]
        s03 = s_ref[3] & _NOTONE
        s10 = s_ref[4]
        s11 = s_ref[5]
        s12 = s_ref[6]
        s13 = s_ref[7] & _NOTONE
        t0 = jnp.zeros_like(s00)
        t1 = jnp.zeros_like(s00) + _ONE
        a = a_ref[:]

        def level(i, carry):
            s00, s01, s02, s03, s10, s11, s12, s13, t0, t1 = carry
            (l00, l01, l02, l03), (r00, r01, r02, r03) = _chacha2(
                s00, s01, s02, s03, nonce, rounds)
            (l10, l11, l12, l13), (r10, r11, r12, r13) = _chacha2(
                s10, s11, s12, s13, nonce, rounds)
            t0l = l03 & _ONE
            t0r = r03 & _ONE
            t1l = l13 & _ONE
            t1r = r13 & _ONE
            l03 &= _NOTONE
            r03 &= _NOTONE
            l13 &= _NOTONE
            r13 &= _NOTONE

            shift = (np.uint32(in_bits - 1 - i) if isinstance(i, int)
                     else np.uint32(in_bits - 1) - i.astype(jnp.uint32))
            ab = (a >> shift) & _ONE
            abb = ab.astype(jnp.bool_)

            # Off-path sibling XOR is the CW (dpf.cuh:117-122).
            cw0 = jnp.where(abb, l00 ^ l10, r00 ^ r10)
            cw1 = jnp.where(abb, l01 ^ l11, r01 ^ r11)
            cw2 = jnp.where(abb, l02 ^ l12, r02 ^ r12)
            cw3 = jnp.where(abb, l03 ^ l13, r03 ^ r13)
            tl_cw = t0l ^ t1l ^ ab ^ _ONE
            tr_cw = t0r ^ t1r ^ ab

            c_ref[i, 0] = cw0
            c_ref[i, 1] = cw1
            c_ref[i, 2] = cw2
            c_ref[i, 3] = cw3 | tl_cw
            c_ref[i, 4] = tr_cw

            tcw = jnp.where(abb, tr_cw, tl_cw)
            tm0 = np.uint32(0) - t0
            tm1 = np.uint32(0) - t1
            n00 = jnp.where(abb, r00, l00) ^ (cw0 & tm0)
            n01 = jnp.where(abb, r01, l01) ^ (cw1 & tm0)
            n02 = jnp.where(abb, r02, l02) ^ (cw2 & tm0)
            n03 = jnp.where(abb, r03, l03) ^ (cw3 & tm0)
            n10 = jnp.where(abb, r10, l10) ^ (cw0 & tm1)
            n11 = jnp.where(abb, r11, l11) ^ (cw1 & tm1)
            n12 = jnp.where(abb, r12, l12) ^ (cw2 & tm1)
            n13 = jnp.where(abb, r13, l13) ^ (cw3 & tm1)
            nt0 = jnp.where(abb, t0r, t0l) ^ (t0 & tcw)
            nt1 = jnp.where(abb, t1r, t1l) ^ (t1 & tcw)
            return (n00, n01, n02, n03, n10, n11, n12, n13, nt0, nt1)

        if unroll:
            carry = (s00, s01, s02, s03, s10, s11, s12, s13, t0, t1)
            for i in range(in_bits):
                carry = level(i, carry)
            (s00, s01, s02, s03, s10, s11, s12, s13, t0, t1) = carry
        else:
            (s00, s01, s02, s03, s10, s11, s12, s13, t0, t1) = \
                jax.lax.fori_loop(0, in_bits, level,
                                  (s00, s01, s02, s03, s10, s11, s12, s13,
                                   t0, t1))
        s0o_ref[0] = s00
        s0o_ref[1] = s01
        s0o_ref[2] = s02
        s0o_ref[3] = s03
        s1o_ref[0] = s10
        s1o_ref[1] = s11
        s1o_ref[2] = s12
        s1o_ref[3] = s13
        t0o_ref[:] = t0
        t1o_ref[:] = t1

    return kernel


def pack_gen_inputs(s0s: jax.Array, alphas: jax.Array, in_bits: int,
                    block_rows: int = DEFAULT_BLOCK_ROWS):
    """s0s [B, 2, 4], alphas [B] uint32 -> kernel layout. Returns
    (seeds8 [8, T, 128], a2 [T, 128], B)."""
    B = alphas.shape[0]
    tile = block_rows * LANES
    Bp = ((B + tile - 1) // tile) * tile
    T = Bp // LANES

    def padb(a):
        return jnp.pad(a, [(0, Bp - B)] + [(0, 0)] * (a.ndim - 1))

    seeds8 = jnp.transpose(padb(s0s).reshape(Bp, 8), (1, 0)).reshape(
        8, T, LANES)
    a2 = padb(jnp.asarray(alphas, dtype=jnp.uint32)).reshape(T, LANES)
    return seeds8, a2, B


@functools.partial(jax.jit,
                   static_argnames=("in_bits", "nonce", "rounds",
                                    "block_rows", "interpret", "unroll"))
def gen_packed(seeds8, a2, in_bits: int, nonce, rounds: int = 20,
               block_rows: int = DEFAULT_BLOCK_ROWS,
               interpret: bool = False, unroll: bool = False):
    """Fused batched Gen kernel: all levels of the BGI Gen loop
    (dpf.cuh:93-153) for a batch of keys, two ChaCha expansions per level.

    Returns (cws_t [in_bits, 5, T, 128], s0f [4, T, 128],
    s1f [4, T, 128], t0 [T, 128], t1 [T, 128]); feed to
    ``gen_finalize`` (t0 is used by the VDPF gen fast path's fail mask).
    """
    nrows = seeds8.shape[1]
    assert nrows % block_rows == 0
    grid = (nrows // block_rows,)
    nonce = tuple(np.uint32(int(n) & 0xFFFFFFFF) for n in nonce)
    kern = _make_gen_kernel(in_bits, nonce, rounds, unroll=unroll)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((in_bits, 5, block_rows, LANES),
                         lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((in_bits, 5, nrows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((4, nrows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((4, nrows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nrows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nrows, LANES), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(seeds8, a2)


def output_cw(group, s0f, s1f, t1, betas: jax.Array,
              batch: int) -> jax.Array:
    """The group-typed final CW from the gen kernel's leaf outputs
    (dpf.cuh:150-152): ocw = +-(beta - s0 + s1), negated when t1 is
    set. The single implementation behind the wire and packed layouts
    (key layouts are load-bearing — CLAUDE.md)."""
    s0 = jnp.transpose(s0f.reshape(4, -1), (1, 0))[:batch]
    s1 = jnp.transpose(s1f.reshape(4, -1), (1, 0))[:batch]
    t1b = t1.reshape(-1)[:batch]
    b_buf = blk.clear_lsb(betas)
    v_cw = group.add(
        group.add(group.from_block(b_buf),
                  group.neg(group.from_block(s0))),
        group.from_block(s1))
    v_cw = jnp.where((t1b & _ONE).astype(jnp.bool_)[:, None],
                     group.neg(v_cw), v_cw)
    return group.into_block(v_cw)


def wire_rows(in_bits: int, cws_t, ocw: jax.Array,
              batch: int) -> jax.Array:
    """Assemble the standard [B, in_bits+1, 8] wire rows from packed cw
    planes + output CW (the one wire-layout assembly, shared with
    api.PackedDpfKeys.to_wire)."""
    T = cws_t.shape[2]
    rows = jnp.transpose(cws_t.reshape(in_bits, 5, T * LANES),
                         (2, 0, 1))[:batch]  # [B, n, 5]
    pad = jnp.zeros((batch, in_bits, 3), dtype=jnp.uint32)
    rows = jnp.concatenate([rows, pad], axis=-1)
    last = jnp.concatenate(
        [ocw, jnp.zeros((batch, 4), dtype=jnp.uint32)], axis=-1)
    return jnp.concatenate([rows, last[:, None, :]], axis=1)


def gen_finalize(group, in_bits: int, cws_t, s0f, s1f, t1,
                 betas: jax.Array, batch: int) -> jax.Array:
    """Assemble the standard [B, in_bits+1, 8] key layout from kernel
    outputs plus the group-typed final CW (dpf.cuh:150-152)."""
    return wire_rows(in_bits, cws_t,
                     output_cw(group, s0f, s1f, t1, betas, batch), batch)


def gen_batch(prg_nonce, group, in_bits: int, s0s: jax.Array,
              alphas: jax.Array, betas: jax.Array, rounds: int = 20,
              block_rows: int = DEFAULT_BLOCK_ROWS,
              interpret: bool = False) -> jax.Array:
    """Batched key generation through the fused kernel; returns the
    standard [B, in_bits+1, 8] cws layout (alphas must fit uint32)."""
    seeds8, a2, B = pack_gen_inputs(s0s, alphas, in_bits, block_rows)
    cws_t, s0f, s1f, _t0, t1 = gen_packed(
        seeds8, a2, in_bits=in_bits, nonce=tuple(prg_nonce),
        rounds=rounds, block_rows=block_rows, interpret=interpret)
    return gen_finalize(group, in_bits, cws_t, s0f, s1f, t1, betas, B)


def gen_batch_packed(prg_nonce, group, in_bits: int, s0s: jax.Array,
                     alphas: jax.Array, betas: jax.Array,
                     rounds: int = 20,
                     block_rows: int = DEFAULT_BLOCK_ROWS,
                     interpret: bool = False):
    """Batched Gen emitting the PACKED key layout the eval kernel
    consumes directly: (cws_t [in_bits, 5, T, 128], ocw [B, 4], B).

    Skips the wire-format row assembly (~15% of gen: the word<->plane
    transpose, scripts/artifacts/gen_sweep.out) AND lets eval stream
    5/8 of the wire cw bytes. Use for same-process gen->eval pipelines;
    keys that cross a process/network boundary need ``gen_batch``'s
    wire layout (the reference always materializes wire keys,
    bench_gpu.cu:70-93 — this shortcut is TPU-first-only). Convert with
    ``pack_keys``/``unpack`` paths if interop is needed later."""
    seeds8, a2, B = pack_gen_inputs(s0s, alphas, in_bits, block_rows)
    cws_t, s0f, s1f, _t0, t1 = gen_packed(
        seeds8, a2, in_bits=in_bits, nonce=tuple(prg_nonce),
        rounds=rounds, block_rows=block_rows, interpret=interpret)
    return cws_t, output_cw(group, s0f, s1f, t1, betas, B), B


def eval_points_packedkey(prg_nonce, group, in_bits: int, party: int,
                          s0: jax.Array, cws_t: jax.Array,
                          ocw: jax.Array, xs: jax.Array,
                          rounds: int = 20,
                          interpret: bool = False) -> jax.Array:
    """Eval against a ``gen_batch_packed`` key: s0 [B, 4] (this party's
    seeds), cws_t [in_bits, 5, T, 128], ocw [B, 4], xs [B] (or [B, 4]
    packed lanes). Bit-exact with the wire-format path."""
    T = cws_t.shape[2]
    Bp = T * LANES
    B = xs.shape[0]
    assert B <= Bp, (B, Bp)

    def padb(a):
        return jnp.pad(a, [(0, Bp - B)] + [(0, 0)] * (a.ndim - 1))

    seeds4 = jnp.transpose(padb(s0), (1, 0)).reshape(4, T, LANES)
    xsp = padb(jnp.asarray(xs, dtype=jnp.uint32))
    if xsp.ndim == 2:
        xs2 = jnp.transpose(xsp, (1, 0)).reshape(4, T, LANES)
    else:
        xs2 = xsp.reshape(T, LANES)
    so, t = eval_packed(seeds4, cws_t, xs2, in_bits=in_bits, party=party,
                        nonce=tuple(prg_nonce), rounds=rounds,
                        interpret=interpret)
    return finalize(group, party, so, t, ocw, B)


def pack_keys(s0: jax.Array, cws: jax.Array, xs: jax.Array, in_bits: int,
              block_rows: int = DEFAULT_BLOCK_ROWS):
    """Stage per-instance keys into the kernel's SoA device layout.

    s0: [B, 4]; cws: [B, in_bits+1, 8]; xs: [B] uint32, or [B, 4] packed
    uint32 lanes for in_bits > 32. Pads B up to a multiple of
    block_rows*128. Returns (seeds4 [4, T, 128], cws_t [in_bits, 8, T,
    128], xs2 [T, 128] (or [4, T, 128] wide), ocw [B, 4], B).
    """
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
    if xsp.ndim == 2:  # packed lanes (wide domains)
        xs2 = jnp.transpose(xsp, (1, 0)).reshape(4, T, LANES)
    else:
        xs2 = xsp.reshape(T, LANES)
    ocw = cws[:, in_bits, 0:4]
    return seeds4, cws_t, xs2, ocw, B


@functools.partial(jax.jit,
                   static_argnames=("in_bits", "party", "nonce", "rounds",
                                    "block_rows", "interpret", "unroll"))
def eval_packed(seeds4, cws_t, xs2, in_bits: int, party: int, nonce,
                rounds: int = 20, block_rows: int = DEFAULT_BLOCK_ROWS,
                interpret: bool = False, unroll: bool = False):
    """Run the fused eval kernel on pre-packed inputs.

    Returns (seed words [4, T, 128], control bits [T, 128]) — feed to
    ``finalize`` for the group conversion.
    """
    nrows = seeds4.shape[1]
    # The kernel reads 5 cw words per level; wire-format keys stream the
    # full 8-word rows ([in_bits, 8, T, 128]), the packed-pipeline key
    # layout (gen_packed's native output, see api.PackedDpfKeys) streams
    # only the 5 used words — 37.5% less cw HBM traffic.
    cw_words = cws_t.shape[1]
    assert cw_words in (5, 8), cw_words
    block_rows = clamp_block_rows(in_bits, block_rows, cw_words)
    while nrows % block_rows:  # rows tiled at a finer granularity
        block_rows //= 2
    assert block_rows >= 1
    grid = (nrows // block_rows,)
    nonce = tuple(np.uint32(int(n) & 0xFFFFFFFF) for n in nonce)
    kern = _make_eval_kernel(in_bits, party, nonce, rounds, unroll)
    x_spec = (pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
              if in_bits > 32 else
              pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                           memory_space=pltpu.VMEM))
    so, t = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_bits, cw_words, block_rows, LANES),
                         lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM),
            x_spec,
        ],
        out_specs=[
            pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, nrows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nrows, LANES), jnp.uint32),
        ],
        # Wide domains keep the whole [in_bits, 8, R, 128] key table
        # VMEM-resident; at in_bits=128 the block + kernel stack is
        # 16.2 MB, just over Mosaic's default 16 MB scoped limit
        # (compile OOM observed on-chip 2026-08-19). v5e has 128 MB of
        # VMEM — raise the per-kernel cap for >64-bit domains.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=(32 * 2**20 if in_bits > 64 else None)),
        interpret=interpret,
    )(seeds4, cws_t, xs2)
    return so, t


def finalize(group, party: int, so: jax.Array, t: jax.Array,
             ocw: jax.Array, batch: int) -> jax.Array:
    """Group-convert kernel outputs to [B, 4] shares (dpf.cuh:200-207)."""
    s = jnp.transpose(so.reshape(4, -1), (1, 0))[:batch]  # [B, 4]
    tb = t.reshape(-1)[:batch]
    y = group.from_block(s)
    y = jnp.where(tb.astype(jnp.bool_)[:, None],
                  group.add(y, group.from_block(ocw)), y)
    if party:
        y = group.neg(y)
    return group.into_block(y)


def eval_points(prg_nonce, group, in_bits: int, party: int, s0: jax.Array,
                cws: jax.Array, xs: jax.Array, rounds: int = 20,
                block_rows: int = DEFAULT_BLOCK_ROWS,
                interpret: bool = False) -> jax.Array:
    """Convenience wrapper: pack + kernel + finalize in one call.

    For repeated evals over the same keys, use pack_keys once and
    eval_packed per batch instead.
    """
    seeds4, cws_t, xs2, ocw, B = pack_keys(s0, cws, xs, in_bits, block_rows)
    so, t = eval_packed(seeds4, cws_t, xs2, in_bits=in_bits, party=party,
                        nonce=tuple(prg_nonce), rounds=rounds,
                        block_rows=block_rows, interpret=interpret)
    return finalize(group, party, so, t, ocw, B)
