"""VDPF batched point evaluation on the fused DPF tree kernel.

The VDPF eval tree walk (vdpf.cuh:189-225) is identical to the DPF's, so
the fused Pallas kernel from ops.dpf_pallas does the heavy lifting; the
output share and the corrected per-point hash pi~ = H(x, s) ^ (t ? cs : 0)
are one cheap XLA pass over the kernel's (seed, t) outputs (the BLAKE3 /
SHA-256 hash is rolled jnp — a single compression per point, a small
fraction of the in_bits ChaCha blocks the kernel already did).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fss_tpu import block as blk
from fss_tpu.ops import dpf_pallas

LANES = dpf_pallas.LANES


def _make_fused_eval_kernel(in_bits: int, party: int, nonce, rounds: int,
                            hash_kind: str, hash_const, unroll: bool,
                            hash_unroll: bool):
    """DPF walk + the two XorHash compressions in ONE kernel
    (vdpf.cuh:189-242 is the same per-point fusion): the walk's final
    seed words feed the hash straight from vregs — no intermediate HBM
    round trip, no second dispatch. ``hash_kind``: "blake3" (hash_const
    = 8 iv words; p_ref = round-1 schedule SMEM when rolled) or
    "sha256" (hash_const = 4 key words; p_ref = the K table SMEM when
    rolled)."""
    from fss_tpu.ops import blake3_pallas as _b3
    from fss_tpu.ops import sha256_pallas as _sh
    wide = in_bits > 32

    def kernel(s_ref, c_ref, x_ref, p_ref, so_ref, t_ref, pi_ref):
        w0, w1, w2, w3, t = dpf_pallas.walk(
            s_ref, c_ref, x_ref, in_bits=in_bits, party=party,
            nonce=nonce, rounds=rounds, unroll=unroll)
        so_ref[0] = w0
        so_ref[1] = w1
        so_ref[2] = w2
        so_ref[3] = w3
        t_ref[:] = t

        zero = jnp.zeros_like(w0)
        if wide:
            a0, a1, a2, a3 = (x_ref[0], x_ref[1], x_ref[2], x_ref[3])
        else:
            a0, a1, a2, a3 = x_ref[:], zero, zero, zero
        if hash_kind == "blake3":
            perm = None if hash_unroll else p_ref[0, :]
            bw = [w0, w1, w2, w3]
            for lsb in (0, 1):
                a_l = [a0, a1, a2,
                       (a3 & dpf_pallas._NOTONE) | np.uint32(lsb)]
                m = a_l + bw + [zero] * 8
                out = _b3._compress(hash_const, m, 32, hash_unroll, perm)
                for k in range(8):
                    pi_ref[8 * lsb + k] = out[k]
        else:  # sha256 (ops/sha256_pallas block layout, 48-byte msg)
            from fss_tpu.hash.sha256 import bswap32
            kw = tuple(np.uint32(int(bswap32(np.uint32(k))))
                       for k in hash_const)
            bw = [bswap32(w0), bswap32(w1), bswap32(w2), bswap32(w3)]
            pad = [zero + np.uint32(0x80000000), zero, zero,
                   zero + np.uint32(384)]
            for lsb in (0, 1):
                a3l = (a3 & dpf_pallas._NOTONE) | np.uint32(lsb)
                m = ([zero + k for k in kw]
                     + [bswap32(a0), bswap32(a1), bswap32(a2),
                        bswap32(a3l)]
                     + bw + pad)
                d = _sh._compress(m, p_ref, hash_unroll)
                for k in range(8):
                    pi_ref[8 * lsb + k] = bswap32(d[k])

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("in_bits", "party", "nonce", "rounds",
                                    "hash_kind", "hash_const",
                                    "block_rows", "interpret", "unroll"))
def fused_eval_packed(seeds4, cws_t, xs2, in_bits: int, party: int,
                      nonce, hash_const, hash_kind: str = "blake3",
                      rounds: int = 20,
                      block_rows: int = dpf_pallas.DEFAULT_BLOCK_ROWS,
                      interpret: bool = False, unroll: bool = False):
    """Fused walk+hash on pre-packed inputs. Returns (so [4, T, 128],
    t [T, 128], pi planes [16, T, 128])."""
    from fss_tpu.ops import blake3_pallas as _b3
    from fss_tpu.ops import sha256_pallas as _sh
    nrows = seeds4.shape[1]
    block_rows = dpf_pallas.clamp_block_rows(in_bits, block_rows)
    while nrows % block_rows:
        block_rows //= 2
    grid = (nrows // block_rows,)
    nonce = tuple(np.uint32(int(n) & 0xFFFFFFFF) for n in nonce)
    kern = _make_fused_eval_kernel(in_bits, party, nonce, rounds,
                                   hash_kind,
                                   tuple(int(w) for w in hash_const),
                                   unroll, hash_unroll=not interpret)
    aux = _b3._perm_arr() if hash_kind == "blake3" else _sh._k_arr()
    x_spec = (pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
              if in_bits > 32 else
              pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                           memory_space=pltpu.VMEM))
    so, t, pi = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_bits, 8, block_rows, LANES),
                         lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM),
            x_spec,
            pl.BlockSpec((1, aux.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((4, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, nrows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nrows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((16, nrows, LANES), jnp.uint32),
        ],
        # Same wide-domain scoped-VMEM raise as dpf_pallas.eval_packed
        # (the fused kernel streams the identical cw block plus hash
        # state; 16.2 MB > the 16 MB default at in_bits=128).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=(32 * 2**20 if in_bits > 64 else None)),
        interpret=interpret,
    )(seeds4, cws_t, xs2, aux)
    return so, t, pi


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
    xsp = padb(jnp.asarray(xs, dtype=jnp.uint32))
    if xsp.ndim == 2:  # packed lanes (in_bits > 32)
        xs2 = jnp.transpose(xsp, (1, 0)).reshape(4, T, LANES)
    else:
        xs2 = xsp.reshape(T, LANES)
    return seeds4, cws_t, xs2, B


def gen_batch(prg_nonce, xor_hash, group, in_bits: int, s0s: jax.Array,
              alphas: jax.Array, betas: jax.Array, rounds: int = 20,
              block_rows: int = dpf_pallas.DEFAULT_BLOCK_ROWS,
              interpret: bool = False):
    """Batched VDPF Gen on the fused Gen kernel (vdpf.cuh:101-175).

    The level loop is identical to DPF Gen, so the kernel does it; the
    check-seed cs = H(a, s0_f) ^ H(a, s1_f), the fail mask t0 == t1, and
    the group-typed output CW are one XLA pass over the kernel outputs.
    Returns (cws [B, in_bits, 8], cs [B, 4, 4], ocw [B, 4],
    fail [B] uint32).
    """
    alphas = jnp.asarray(alphas, dtype=jnp.uint32)
    B = alphas.shape[0]
    seeds8, a2, _ = dpf_pallas.pack_gen_inputs(s0s, alphas, in_bits,
                                               block_rows)
    cws_t, s0f, s1f, t0, t1 = dpf_pallas.gen_packed(
        seeds8, a2, in_bits=in_bits, nonce=tuple(prg_nonce),
        rounds=rounds, block_rows=block_rows, interpret=interpret)

    T = cws_t.shape[2]
    rows = jnp.transpose(cws_t.reshape(in_bits, 5, T * LANES),
                         (2, 0, 1))[:B]
    pad = jnp.zeros((B, in_bits, 3), dtype=jnp.uint32)
    cws = jnp.concatenate([rows, pad], axis=-1)

    s0 = jnp.transpose(s0f.reshape(4, -1), (1, 0))[:B]
    s1 = jnp.transpose(s1f.reshape(4, -1), (1, 0))[:B]
    t0b = t0.reshape(-1)[:B] & np.uint32(1)
    t1b = t1.reshape(-1)[:B] & np.uint32(1)

    a_lanes = blk.pack_inputs(alphas, in_bits)
    pi0 = xor_hash(a_lanes, s0)
    pi1 = xor_hash(a_lanes, s1)
    cs = jnp.bitwise_xor(pi0, pi1)
    fail = (t0b ^ t1b) ^ np.uint32(1)  # 1 iff t0 == t1 (vdpf.cuh:167)

    b_buf = blk.clear_lsb(jnp.asarray(betas))
    v_cw = group.add(
        group.add(group.from_block(b_buf),
                  group.neg(group.from_block(s0))),
        group.from_block(s1))
    v_cw = jnp.where(t1b.astype(jnp.bool_)[:, None], group.neg(v_cw),
                     v_cw)
    return cws, cs, group.into_block(v_cw), fail


def eval_points(prg_nonce, xor_hash, group, in_bits: int, party: int,
                s0: jax.Array, cws: jax.Array, cs: jax.Array,
                ocw: jax.Array, xs: jax.Array, rounds: int = 20,
                block_rows: int = dpf_pallas.DEFAULT_BLOCK_ROWS,
                interpret: bool = False):
    """Returns (ys [B, 4], pi_tildes [B, 4, 4]); bit-exact with
    schemes.vdpf.eval_points."""
    xs = jnp.asarray(xs, dtype=jnp.uint32)
    seeds4, cws_t, xs2, B = pack_keys(s0, cws, xs, in_bits, block_rows)

    # pi~ = H(x, s) ^ (t ? cs : 0). With a BLAKE3 hash the walk AND both
    # hash compressions run in ONE fused kernel — the final seed words
    # feed the compression from vregs, with no intermediate HBM round
    # trip or second dispatch (the two-dispatch plane-kernel version
    # measured 133.5 M/s, the rolled-jnp glue before it 91.9, vs the
    # bare walk's 207; vdpf.cuh:189-242 fuses eval->pi per point the
    # same way).
    from fss_tpu.ops import sha256_pallas as _sh
    from fss_tpu.ops.eval_all_pallas import _blake3_iv_of
    iv = _blake3_iv_of(xor_hash)
    skey = _sh.sha256_key_of(xor_hash)
    if iv is not None or skey is not None:
        from fss_tpu.ops.planes import untile_blocks
        kind, const = (("blake3", iv) if iv is not None
                       else ("sha256", skey))
        so, t, pi_planes = fused_eval_packed(
            seeds4, cws_t, xs2, in_bits=in_bits, party=party,
            nonce=tuple(prg_nonce), hash_kind=kind,
            hash_const=tuple(int(w) for w in const),
            rounds=rounds, block_rows=block_rows, interpret=interpret)
        pi = untile_blocks(pi_planes, B, 4)
    else:
        so, t = dpf_pallas.eval_packed(
            seeds4, cws_t, xs2, in_bits=in_bits, party=party,
            nonce=tuple(prg_nonce), rounds=rounds,
            block_rows=block_rows, interpret=interpret)
        pi = None
    s = jnp.transpose(so.reshape(4, -1), (1, 0))[:B]
    tb = t.reshape(-1)[:B]

    cs = jnp.broadcast_to(jnp.asarray(cs), (B, 4, 4))
    ocw = jnp.broadcast_to(jnp.asarray(ocw), (B, 4))
    y = group.from_block(s)
    y = jnp.where(tb.astype(jnp.bool_)[:, None],
                  group.add(y, group.from_block(ocw)), y)
    if party:
        y = group.neg(y)

    if pi is None:
        x_lanes = blk.pack_inputs(xs, in_bits)
        pi = xor_hash(x_lanes, s)
    pi = jnp.where(tb.astype(jnp.bool_)[:, None, None],
                   jnp.bitwise_xor(pi, cs), pi)
    return group.into_block(y), pi
