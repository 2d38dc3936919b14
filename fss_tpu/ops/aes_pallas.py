"""Fused Pallas TPU kernel for DPF point evaluation with the AES-MMO PRG.

The reference's GPU answer to software AES is shared-memory T-tables
(aes128_mmo_soft.cuh, 50.3 M evals/s on an A6000); table gathers are
~serial on TPU, so here the WHOLE eval — tree walk included — runs in the
bitsliced plane domain: each of the 128 state bits is a plane of packed
instance bits (32 instances per uint32 word), AES is the tower-field
boolean circuit from prg/aes_bitsliced.py, and correction-word application
/ child selection are plane-wise masked XORs. Converting between word and
plane domains costs five shift/mask passes per 32-bit group, so the word
<-> plane transposes happen exactly once at the batch boundary instead of
twice per tree level (which is what capped the jnp path at ~4 M evals/s).

Plane layout: plane index p = 16*bit + byte (bit-major, byte-minor), so
each bit's 16 bytes form one contiguous [16, R, 128] slice in VMEM.
Arrays are [planes, T, 128] with T = ceil(B/32)/128 row-tiles; the grid is
(T/block_rows, in_bits) with the level dimension innermost and the walk
state carried in VMEM scratch across level steps — correction words
stream level-by-level, keeping VMEM flat regardless of in_bits.

Cost: ~2.9k vector ops per AES (tower S-box), 2 AES per level; a 16-bit
eval is ~49k uint32 word-ops per instance, a ~80 M evals/s/chip VPU
ceiling at the 3.9e12 ops/s envelope (cf. docs/benchmarks.md).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fss_tpu.prg.aes_bitsliced import (
    _round_key_bytes,
    _sbox_planes,
    _transpose32,
    _XTIME_MAT,
)

LANES = 128
DEFAULT_BLOCK_ROWS = 8

_FULL = np.uint32(0xFFFFFFFF)

# State bit-values are shaped [4, 4, R, 128] = [col, row, sublanes, lanes]
# (byte index = 4*col + row, matching the block's byte memory order), so
# ShiftRows and the MixColumns byte rotations are slice+concatenate rolls
# and no gather or captured index array ever enters the kernel.


def _shift_rows(bits):
    """out[c, r] = in[(c + r) % 4, r] (row r rotates left r columns)."""
    out = []
    for v in bits:
        rows = []
        for r in range(4):
            col = v[:, r]
            rows.append(col if r == 0 else
                        jnp.concatenate([col[r:], col[:r]], axis=0))
        out.append(jnp.stack(rows, axis=1))
    return out


def _rot_rows(v, k: int):
    """out[c, r] = v[c, (r + k) % 4] (within-column byte rotation)."""
    return jnp.concatenate([v[:, k:], v[:, :k]], axis=1)


def _xtime_bits(bits):
    out = []
    for i in range(8):
        m = _XTIME_MAT[i]
        acc = None
        for j in range(8):
            if (m >> j) & 1:
                acc = bits[j] if acc is None else acc ^ bits[j]
        out.append(acc)
    return out


def _mix_columns(bits):
    xt = _xtime_bits(bits)
    return [xt[b] ^ _rot_rows(xt[b] ^ bits[b], 1)
            ^ _rot_rows(bits[b], 2) ^ _rot_rows(bits[b], 3)
            for b in range(8)]


def _byte_iota():
    """[4, 4, 1, 1] uint32 byte indices (4*col + row), built in-kernel."""
    c = jax.lax.broadcasted_iota(jnp.uint32, (4, 4, 1, 1), 0)
    r = jax.lax.broadcasted_iota(jnp.uint32, (4, 4, 1, 1), 1)
    return c * np.uint32(4) + r


def _pattern_mask(byte_idx, pattern: int):
    """0/~0 mask per byte from a 16-bit scalar pattern."""
    return (np.uint32(0) - ((np.uint32(pattern) >> byte_idx)
                            & np.uint32(1)))


def _key_patterns(rk_bytes):
    """[11, 16] uint8 round keys -> [11][8] 16-bit scalar patterns
    (which bytes have bit b set); zero patterns are skipped at trace."""
    pats = []
    for r in range(11):
        per_bit = []
        for b in range(8):
            pat = 0
            for c in range(16):
                if (int(rk_bytes[r, c]) >> b) & 1:
                    pat |= 1 << c
            per_bit.append(pat)
        pats.append(per_bit)
    return pats


def _aes_bits(bits, key_pats, byte_idx):
    """AES-128 on 8 bit-values of shape [4, 4, R, L]; round keys folded
    in as iota-derived constant masks (Mosaic constant-folds them)."""

    def keyadd(x, r):
        return [x[b] ^ _pattern_mask(byte_idx, key_pats[r][b])
                if key_pats[r][b] else x[b] for b in range(8)]

    x = keyadd(bits, 0)
    for r in range(1, 10):
        x = _sbox_planes(x)
        x = _shift_rows(x)
        x = _mix_columns(x)
        x = keyadd(x, r)
    x = _sbox_planes(x)
    x = _shift_rows(x)
    return keyadd(x, 10)


def _make_eval_kernel(in_bits: int, party: int, key_pats):
    """key_pats: tuple of 2 per-key round-key pattern structures."""

    def kernel(sp_ref, cw_ref, xp_ref, so_ref, to_ref, st_ref, t_ref):
        i = pl.program_id(1)
        byte_idx = _byte_iota()
        # Clears the clamped bit's plane: bit 0 of byte 12 = (c=3, r=0).
        mask96 = ~_pattern_mask(byte_idx, 1 << 12)

        @pl.when(i == 0)
        def _init():
            st_ref[...] = sp_ref[...]
            # Plane index 12 = bit 0 of byte 12 (the clamped bit).
            st_ref[12] = jnp.zeros_like(st_ref[12])
            t_ref[...] = jnp.full(
                t_ref.shape, _FULL if party else np.uint32(0),
                dtype=jnp.uint32)

        R, L = st_ref.shape[1], st_ref.shape[2]
        s_bits = [st_ref[16 * b:16 * (b + 1)].reshape(4, 4, R, L)
                  for b in range(8)]
        t = t_ref[...]

        # MMO per key: child = AES_k(s) ^ s (aes128_mmo.cuh:79-89).
        children = []
        for k in range(2):
            e = _aes_bits(s_bits, key_pats[k], byte_idx)
            children.append([e[b] ^ s_bits[b] for b in range(8)])
        l_bits, r_bits = children

        tl = l_bits[0][3, 0]
        tr = r_bits[0][3, 0]
        l_bits[0] = l_bits[0] & mask96
        r_bits[0] = r_bits[0] & mask96

        cw = cw_ref[0]  # [130, R, L]; s_cw plane 12 pre-zeroed at pack
        for b in range(8):
            cwb = cw[16 * b:16 * (b + 1)].reshape(4, 4, R, L) & t[None]
            l_bits[b] = l_bits[b] ^ cwb
            r_bits[b] = r_bits[b] ^ cwb
        tl = tl ^ (t & cw[128])
        tr = tr ^ (t & cw[129])

        xb = xp_ref[0]
        out_bits = [l_bits[b] ^ (xb[None] & (l_bits[b] ^ r_bits[b]))
                    for b in range(8)]
        t_ref[...] = tl ^ (xb & (tl ^ tr))
        st_ref[...] = jnp.concatenate(
            [v.reshape(16, R, L) for v in out_bits], axis=0)

        so_ref[...] = st_ref[...]
        to_ref[...] = t_ref[...]

    return kernel


# ---------------------------------------------------------------------------
# Word <-> plane packing (XLA level; once per batch)
# ---------------------------------------------------------------------------


def _bytes_to_planes(byte_vals):
    """[nb, Bp] uint32 byte values -> [nb, 8, W] bit planes (W = Bp/32,
    instance j of word g is batch element 32g + j)."""
    nb, Bp = byte_vals.shape
    w = byte_vals.reshape(nb, Bp // 32, 32)
    tr = _transpose32(w)  # [..., i] = plane of bit i
    return jnp.moveaxis(tr, -1, 1)[:, :8]  # [nb, 8, W]


def _planes_to_bytes(planes):
    """[nb, nbit <= 32, W] planes -> [nb, W*32] values."""
    nb, nbit, W = planes.shape
    rows = jnp.concatenate(
        [planes, jnp.zeros((nb, 32 - nbit, W), dtype=jnp.uint32)], axis=1)
    tr = _transpose32(jnp.moveaxis(rows, 1, -1))  # [nb, W, 32]
    return tr.reshape(nb, W * 32)


def _pad_batch(arrs, B: int, tile: int):
    Bp = ((B + tile - 1) // tile) * tile
    return [jnp.pad(a, [(0, Bp - B)] + [(0, 0)] * (a.ndim - 1))
            for a in arrs], Bp


def pack_eval(s0: jax.Array, cws: jax.Array, xs: jax.Array, in_bits: int,
              block_rows: int = DEFAULT_BLOCK_ROWS):
    """Word-domain inputs -> plane-domain kernel layout.

    s0 [B, 4] (or [4] shared); cws [B, in_bits+1, 8] (or [in_bits+1, 8]
    shared across the batch — broadcast in plane space, where a shared key
    is 0/~0 constant planes); xs [B] uint32. Returns (sp [128, T, 128],
    cwp [in_bits, 130, T, 128], xp [in_bits, T, 128], ocw, B).
    """
    xs = jnp.asarray(xs, dtype=jnp.uint32)
    B = xs.shape[0]
    tile = 32 * LANES * block_rows
    (xsp,), Bp = _pad_batch([xs], B, tile)
    W = Bp // 32
    T = W // LANES

    shared_key = cws.ndim == 2
    if shared_key:
        s0b, cwsb = s0[None], cws[None]
        Wk, Tk = 1, 1
    else:
        (s0b, cwsb), _ = _pad_batch([s0, cws], B, tile)
        Wk, Tk = W, T

    # Seeds: 16 byte streams. For a shared key, 32 replicated instances
    # make one word whose planes are 0/~0 constants, broadcast below.
    sbytes = jnp.stack([(s0b[:, c // 4] >> np.uint32(8 * (c % 4)))
                        & np.uint32(0xFF) for c in range(16)])
    if shared_key:
        sbytes = sbytes.repeat(32, axis=1)
    sp8 = _bytes_to_planes(sbytes)  # [16, 8, Wk]
    # plane p = bit*16 + byte.
    sp = jnp.transpose(sp8, (1, 0, 2)).reshape(128, Wk)

    # Correction words: per level, 16 s_cw byte streams + tl/tr planes.
    lv = cwsb[:, :in_bits]  # [Bk, n, 8]
    cbytes = jnp.stack([
        (lv[:, :, c // 4] >> np.uint32(8 * (c % 4))) & np.uint32(0xFF)
        for c in range(16)])  # [16, Bk, n]
    cb = jnp.transpose(cbytes, (2, 0, 1)).reshape(in_bits * 16, -1)
    if shared_key:
        cb = cb.repeat(32, axis=1)
    cp8 = _bytes_to_planes(cb).reshape(in_bits, 16, 8, Wk)
    cwp_s = jnp.transpose(cp8, (0, 2, 1, 3)).reshape(in_bits, 128, Wk)
    # tl = plane (bit0, byte12); extract then zero it.
    tl = cwp_s[:, 12]
    cwp_s = cwp_s.at[:, 12].set(jnp.zeros_like(tl))
    trw = lv[:, :, 4] & np.uint32(1)  # [Bk, n]
    trb = jnp.transpose(trw, (1, 0))
    if shared_key:
        trb = trb.repeat(32, axis=1)
    tr = _bytes_to_planes(trb)[:, 0]  # bit 0 plane [n, Wk]
    cwp = jnp.concatenate([cwp_s, tl[:, None], tr[:, None]], axis=1)

    if shared_key:
        sp = jnp.broadcast_to(sp[:, :1], (128, W))
        cwp = jnp.broadcast_to(cwp[:, :, :1], (in_bits, 130, W))

    sp = sp.reshape(128, T, LANES)
    cwp = cwp.reshape(in_bits, 130, T, LANES)

    # Input bits, one plane per level (MSB first).
    xbits = _bytes_to_planes(
        jnp.stack([(xsp >> np.uint32(8 * k)) & np.uint32(0xFF)
                   for k in range(4)]))  # [4, 8, W]
    xplane = xbits.reshape(32, W)  # bit index = 8*k + b
    levels = [xplane[in_bits - 1 - i] for i in range(in_bits)]
    xp = jnp.stack(levels).reshape(in_bits, T, LANES)

    ocw = (cws[None] if shared_key else cwsb)[:, in_bits, 0:4]
    return sp, cwp, xp, ocw, B


@functools.partial(jax.jit,
                   static_argnames=("in_bits", "party", "keys",
                                    "block_rows", "interpret"))
def eval_packed(sp, cwp, xp, in_bits: int, party: int, keys,
                block_rows: int = DEFAULT_BLOCK_ROWS,
                interpret: bool = False):
    """Run the fused plane-domain kernel. keys: tuple of 2 16-byte AES
    keys. Returns (so [128, T, 128], t [T, 128]) planes."""
    T = sp.shape[1]
    assert T % block_rows == 0
    key_pats = tuple(
        tuple(map(tuple, _key_patterns(_round_key_bytes(k))))
        for k in keys)
    kern = _make_eval_kernel(in_bits, party, key_pats)
    R = block_rows
    so, to = pl.pallas_call(
        kern,
        grid=(T // R, in_bits),
        in_specs=[
            pl.BlockSpec((128, R, LANES), lambda w, i: (0, w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 130, R, LANES), lambda w, i: (i, 0, w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, LANES), lambda w, i: (i, w, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((128, R, LANES), lambda w, i: (0, w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda w, i: (w, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((128, T, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((T, LANES), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((128, R, LANES), jnp.uint32),
            pltpu.VMEM((R, LANES), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(sp, cwp, xp)
    return so, to


def unpack_out(so: jax.Array, to: jax.Array, batch: int):
    """Plane outputs -> ([B, 4] seed blocks, [B] t bits).

    Words are assembled directly from 32 planes with one bit-transpose per
    output word — no byte-shift assembly. (The byte-wise formulation also
    triggered an XLA:TPU miscompile when fused: the third byte stream of
    each word came out wrong unless the byte values were also a program
    output. The plane-direct form is both correct and cheaper.)
    """
    s = jnp.stack(_out_words(so), axis=-1)[:batch]
    W = so.shape[1] * LANES
    tbits = _planes_to_bytes(to.reshape(1, 1, W))[0]
    return s, tbits[:batch]


def _out_words(so: jax.Array) -> list:
    """[128, T, 128] bit-planes -> 4 word arrays [Bp] (flat batch
    order), via one bit-transpose per word (see unpack_out)."""
    T = so.shape[1]
    W = T * LANES
    planes = so.reshape(128, W)  # plane p = 16*bit + byte
    words = []
    for w in range(4):
        rows = [planes[16 * (i % 8) + 4 * w + i // 8] for i in range(32)]
        tr = _transpose32(jnp.stack(rows, axis=-1))  # [W, 32]
        words.append(tr.reshape(W * 32))
    return words


def unpack_word_planes(so: jax.Array) -> jax.Array:
    """[128, T, 128] bit-planes -> [4, 32*T, 128] word-lane tiles — the
    sha256_pallas.xor_hash_planes input layout, skipping the [B, 4]
    row materialization + re-tile round trip of unpack_out + _tile."""
    words = _out_words(so)
    Bp = words[0].shape[0]
    return jnp.stack(words).reshape(4, Bp // LANES, LANES)


@functools.partial(jax.jit,
                   static_argnames=("keys", "group", "in_bits", "party",
                                    "block_rows", "interpret"))
def _eval_points_jit(keys, group, in_bits, party, s0, cws, xs, block_rows,
                     interpret):
    sp, cwp, xp, ocw, B = pack_eval(s0, cws, xs, in_bits, block_rows)
    so, to = eval_packed(sp, cwp, xp, in_bits=in_bits, party=party,
                         keys=keys, block_rows=block_rows,
                         interpret=interpret)
    s, t = unpack_out(so, to, B)
    y = group.from_block(s)
    ocwb = ocw if ocw.shape[0] == 1 else ocw[:B]
    y = jnp.where(t.astype(jnp.bool_)[:, None],
                  group.add(y, group.from_block(ocwb)), y)
    if party:
        y = group.neg(y)
    return group.into_block(y)


def eval_points(prg_keys, group, in_bits: int, party: int, s0: jax.Array,
                cws: jax.Array, xs: jax.Array,
                block_rows: int = DEFAULT_BLOCK_ROWS,
                interpret: bool = False) -> jax.Array:
    """Pack + kernel + finalize, one jitted program (mirror of
    dpf_pallas.eval_points for the AES-MMO PRG). prg_keys: tuple of 2
    16-byte AES keys.

    The word->plane key packing (bit-transposes of all cw bytes) runs on
    every call here; for repeated evals over the same keys, call
    pack_eval once and eval_packed per batch — packing costs a large
    fraction of a full eval."""
    return _eval_points_jit(tuple(bytes(k) for k in prg_keys), group,
                            in_bits, int(party), jnp.asarray(s0),
                            jnp.asarray(cws),
                            jnp.asarray(xs, dtype=jnp.uint32), block_rows,
                            interpret)


def vdpf_eval_points(prg_keys, xor_hash, group, in_bits: int, party: int,
                     s0: jax.Array, cws: jax.Array, cs: jax.Array,
                     ocw: jax.Array, xs: jax.Array,
                     block_rows: int = DEFAULT_BLOCK_ROWS,
                     interpret: bool = False):
    """VDPF point evaluation on the plane-domain AES kernel.

    The VDPF tree walk is the DPF walk over (in_bits, 8) rows
    (vdpf.cuh:189-230); the kernel produces the leaf (s, t) and the
    group finalize + corrected hash pi-tilde = H(x, s) (^ cs if t) run
    outside. Returns (ys [B, 4], pi_tildes [B, 4, 4]).
    """
    xs = jnp.asarray(xs, dtype=jnp.uint32)
    cws = jnp.asarray(cws)
    # pack_eval reads row in_bits as the output CW; pad a zero row.
    zrow = jnp.zeros(cws.shape[:-2] + (1, 8), dtype=jnp.uint32)
    cws_p = jnp.concatenate([cws, zrow], axis=-2)
    sp, cwp, xp, _, B = pack_eval(jnp.asarray(s0), cws_p, xs, in_bits,
                                  block_rows)
    so, to = eval_packed(sp, cwp, xp, in_bits=in_bits, party=party,
                         keys=tuple(bytes(k) for k in prg_keys),
                         block_rows=block_rows, interpret=interpret)
    s, t = unpack_out(so, to, B)

    csb = jnp.broadcast_to(jnp.asarray(cs), (B, 4, 4))
    ocwb = jnp.broadcast_to(jnp.asarray(ocw), (B, 4))
    y = group.from_block(s)
    y = jnp.where(t.astype(jnp.bool_)[:, None],
                  group.add(y, group.from_block(ocwb)), y)
    if party:
        y = group.neg(y)

    from fss_tpu import block as blk
    x_lanes = blk.pack_inputs(xs, in_bits)
    # Batched hash kernels when the config matches (sha256_pallas /
    # blake3_pallas); rolled jnp otherwise.
    from fss_tpu.ops import sha256_pallas as _shk
    from fss_tpu.ops.eval_all_pallas import _blake3_iv_of
    skey = _shk.sha256_key_of(xor_hash)
    b3iv = _blake3_iv_of(xor_hash)
    if skey is not None:
        # Plane-direct: hash the walk output in the word-plane layout
        # (skips the [B, 4] row materialization + re-tile round trip).
        s4 = unpack_word_planes(so)
        Bp = s4.shape[1] * LANES
        xp4 = jnp.pad(x_lanes, ((0, Bp - B), (0, 0)))
        x4 = jnp.transpose(xp4, (1, 0)).reshape(4, Bp // LANES, LANES)
        pi_planes = _shk.xor_hash_planes(x4, s4, skey,
                                         interpret=interpret)
        from fss_tpu.ops.planes import untile_blocks
        pi = untile_blocks(pi_planes, B, 4)
    elif b3iv is not None:
        from fss_tpu.ops import blake3_pallas as _b3k
        pi = _b3k.xor_hash_batch(x_lanes, s, tuple(int(w) for w in b3iv),
                                 block_rows=block_rows,
                                 interpret=interpret)
    else:
        pi = xor_hash(x_lanes, s)
    pi = jnp.where(t.astype(jnp.bool_)[:, None, None],
                   jnp.bitwise_xor(pi, csb), pi)
    return group.into_block(y), pi


# ---------------------------------------------------------------------------
# Half-Tree eval on the AES-MMO CCR hash (mul=1): one AES per level, the
# hash key folded in as constant plane masks, last-level conversion fused.
# ---------------------------------------------------------------------------


def _byte_patterns(data16: bytes):
    """16 bytes -> per-bit 16-bit pattern over the bytes (which bytes have
    bit b set), for constant-mask XOR in-kernel."""
    pats = []
    for b in range(8):
        pat = 0
        for c in range(16):
            if (data16[c] >> b) & 1:
                pat |= 1 << c
        pats.append(pat)
    return tuple(pats)


def _make_ht_eval_kernel(in_bits: int, party: int, key_pats, hk_pats):
    def kernel(sp_ref, cw_ref, xp_ref, ho_ref, lo_ref, st_ref):
        i = pl.program_id(1)
        byte_idx = _byte_iota()
        oh96 = _pattern_mask(byte_idx, 1 << 12)  # ~0 at byte 12 only
        mask96 = ~oh96

        @pl.when(i == 0)
        def _init():
            st_ref[...] = sp_ref[...]
            st_ref[12] = jnp.full_like(
                st_ref[12], _FULL if party else np.uint32(0))

        R, L = st_ref.shape[1], st_ref.shape[2]
        node = [st_ref[16 * b:16 * (b + 1)].reshape(4, 4, R, L)
                for b in range(8)]
        t = node[0][3, 0]
        xb = xp_ref[0]
        is_last = i == np.uint32(in_bits - 1)

        # Hash input: node with the clamped-bit plane replaced by x_n on
        # the last level (half_tree_dpf.cuh:204), XOR the hash key.
        lsb = jnp.where(is_last, xb, t)
        inp = list(node)
        inp[0] = (inp[0] & mask96) ^ (oh96 & lsb[None, None])
        inp = [inp[b] ^ _pattern_mask(byte_idx, hk_pats[b])
               if hk_pats[b] else inp[b] for b in range(8)]
        e = _aes_bits(inp, key_pats[0], byte_idx)
        h = [e[b] ^ inp[b] for b in range(8)]  # MMO feed-forward

        cw = cw_ref[0]  # [129, R, L]: 128 cw planes (lcw0 at 12) + lcw1

        @pl.when(jnp.logical_not(is_last))
        def _mid():
            out = []
            for b in range(8):
                cwb = cw[16 * b:16 * (b + 1)].reshape(4, 4, R, L)
                nb = h[b] ^ (node[b] & xb[None, None]) ^ (cwb & t[None,
                                                                 None])
                out.append(nb.reshape(16, R, L))
            st_ref[...] = jnp.concatenate(out, axis=0)

        @pl.when(is_last)
        def _last():
            lcw0 = cw[12]
            lcw1 = cw[128]
            lcw_xn = lcw0 ^ (xb & (lcw0 ^ lcw1))
            low = h[0][3, 0] ^ (t & lcw_xn)
            outs = []
            for b in range(8):
                hcwb = cw[16 * b:16 * (b + 1)].reshape(4, 4, R, L)
                if b == 0:
                    hcwb = hcwb & mask96
                hb = h[b]
                if b == 0:
                    hb = hb & mask96
                outs.append((hb ^ (hcwb & t[None, None])).reshape(16, R, L))
            ho_ref[...] = jnp.concatenate(outs, axis=0)
            lo_ref[...] = low

    return kernel


def ht_pack_eval(s0, cws, xs, in_bits: int,
                 block_rows: int = DEFAULT_BLOCK_ROWS):
    """Half-Tree keys -> plane layout: cwp [in_bits, 129, T, 128] keeps
    the word-3 LSB plane (lcw0 of the last row) and adds the extra-word
    bit plane (lcw1)."""
    xs = jnp.asarray(xs, dtype=jnp.uint32)
    B = xs.shape[0]
    tile = 32 * LANES * block_rows
    (xsp,), Bp = _pad_batch([xs], B, tile)
    W = Bp // 32
    T = W // LANES

    shared_key = cws.ndim == 2
    if shared_key:
        s0b, cwsb = s0[None], cws[None]
    else:
        (s0b, cwsb), _ = _pad_batch([jnp.asarray(s0), jnp.asarray(cws)],
                                    B, tile)
    Wk = 1 if shared_key else W

    sbytes = jnp.stack([(s0b[:, c // 4] >> np.uint32(8 * (c % 4)))
                        & np.uint32(0xFF) for c in range(16)])
    if shared_key:
        sbytes = sbytes.repeat(32, axis=1)
    sp8 = _bytes_to_planes(sbytes)
    sp = jnp.transpose(sp8, (1, 0, 2)).reshape(128, Wk)

    lv = cwsb[:, :in_bits]
    cbytes = jnp.stack([
        (lv[:, :, c // 4] >> np.uint32(8 * (c % 4))) & np.uint32(0xFF)
        for c in range(16)])
    cb = jnp.transpose(cbytes, (2, 0, 1)).reshape(in_bits * 16, -1)
    if shared_key:
        cb = cb.repeat(32, axis=1)
    cp8 = _bytes_to_planes(cb).reshape(in_bits, 16, 8, Wk)
    cwp_s = jnp.transpose(cp8, (0, 2, 1, 3)).reshape(in_bits, 128, Wk)
    exw = lv[:, :, 4] & np.uint32(1)
    exb = jnp.transpose(exw, (1, 0))
    if shared_key:
        exb = exb.repeat(32, axis=1)
    ex = _bytes_to_planes(exb)[:, 0]
    cwp = jnp.concatenate([cwp_s, ex[:, None]], axis=1)

    if shared_key:
        sp = jnp.broadcast_to(sp[:, :1], (128, W))
        cwp = jnp.broadcast_to(cwp[:, :, :1], (in_bits, 129, W))
    sp = sp.reshape(128, T, LANES)
    cwp = cwp.reshape(in_bits, 129, T, LANES)

    xbits = _bytes_to_planes(
        jnp.stack([(xsp >> np.uint32(8 * k)) & np.uint32(0xFF)
                   for k in range(4)]))
    xplane = xbits.reshape(32, W)
    xp = jnp.stack([xplane[in_bits - 1 - i]
                    for i in range(in_bits)]).reshape(in_bits, T, LANES)
    return sp, cwp, xp, B


@functools.partial(jax.jit,
                   static_argnames=("in_bits", "party", "keys", "hash_key",
                                    "block_rows", "interpret"))
def ht_eval_packed(sp, cwp, xp, in_bits: int, party: int, keys, hash_key,
                   block_rows: int = DEFAULT_BLOCK_ROWS,
                   interpret: bool = False):
    """keys: 1-tuple of 16-byte AES keys; hash_key: 16 bytes."""
    T = sp.shape[1]
    assert T % block_rows == 0
    key_pats = tuple(
        tuple(map(tuple, _key_patterns(_round_key_bytes(k))))
        for k in keys)
    hk_pats = _byte_patterns(hash_key)
    kern = _make_ht_eval_kernel(in_bits, party, key_pats, hk_pats)
    R = block_rows
    ho, lo = pl.pallas_call(
        kern,
        grid=(T // R, in_bits),
        in_specs=[
            pl.BlockSpec((128, R, LANES), lambda w, i: (0, w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 129, R, LANES), lambda w, i: (i, 0, w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, LANES), lambda w, i: (i, w, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((128, R, LANES), lambda w, i: (0, w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda w, i: (w, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((128, T, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((T, LANES), jnp.uint32),
        ],
        scratch_shapes=[pltpu.VMEM((128, R, LANES), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(sp, cwp, xp)
    return ho, lo


def ht_eval_points(prg_keys, group, in_bits: int, party: int, hash_key,
                   s0: jax.Array, cws: jax.Array, ocw: jax.Array,
                   xs: jax.Array, block_rows: int = DEFAULT_BLOCK_ROWS,
                   interpret: bool = False) -> jax.Array:
    """Half-Tree point evaluation with the AES-MMO CCR hash
    (half_tree_dpf.cuh:182-226 on the plane-domain kernel)."""
    xs = jnp.asarray(xs, dtype=jnp.uint32)
    sp, cwp, xp, B = ht_pack_eval(jnp.asarray(s0), jnp.asarray(cws), xs,
                                  in_bits, block_rows)
    hk = np.asarray(hash_key, dtype=np.uint32).tobytes()
    ho, lo = ht_eval_packed(sp, cwp, xp, in_bits=in_bits, party=party,
                            keys=(bytes(prg_keys[0]),), hash_key=hk,
                            block_rows=block_rows, interpret=interpret)
    s, low = unpack_out(ho, lo, B)
    ocwb = jnp.asarray(ocw)
    if ocwb.ndim == 2:
        ocwb = ocwb[:B]
    y = group.from_block(s)
    y = jnp.where(low.astype(jnp.bool_)[:, None],
                  group.add(y, group.from_block(ocwb)), y)
    if party:
        y = group.neg(y)
    return group.into_block(y)


# ---------------------------------------------------------------------------
# DCF eval on AES-MMO (mul=4): four AES per level; the group value
# accumulates in-kernel as a bitsliced ripple-carry add over the value
# planes (20 word-ops/instance per add vs ~1475 for one AES — cheap),
# XOR for the Bytes group. Mod groups fall back to the XLA path.
# ---------------------------------------------------------------------------


def _plane_index(k: int) -> int:
    """Plane index of integer bit k of a block value (little-endian
    words, little-endian bytes): p = 16*(k%8) + byte(k)."""
    return 16 * (k % 8) + 4 * (k // 32) + ((k % 32) // 8)


def _ripple_add(a_planes, b_planes, nbits: int):
    """Bitsliced add of two 128-plane lists over the low nbits integer
    bits (wrapping mod 2^nbits; higher planes come from a unchanged)."""
    out = list(a_planes)
    carry = None
    for k in range(nbits):
        p = _plane_index(k)
        a = a_planes[p]
        b = b_planes[p]
        axb = a ^ b
        if carry is None:
            out[p] = axb
            carry = a & b
        else:
            out[p] = axb ^ carry
            carry = (a & b) | (carry & axb)
    return out


def _make_dcf_eval_kernel(in_bits: int, party: int, key_pats,
                          group_is_xor: bool, group_bits: int):
    # The level-carried state (s planes / value planes / t) lives directly
    # in the output refs: the i grid dim revisits the same output block, so
    # Mosaic keeps it VMEM-resident across levels, and the final level's
    # state IS the result. (Separate VMEM scratch + a 257-plane copy per
    # level was the old shape; dropping it cuts ~1 MB of VMEM blocks —
    # relevant to the 2026-08-19 worker crash at the 2^19 batch shape.)
    def kernel(sp_ref, cw_ref, xp_ref, vo_ref, so_ref, to_ref):
        i = pl.program_id(1)
        byte_idx = _byte_iota()
        mask96 = ~_pattern_mask(byte_idx, 1 << 12)

        @pl.when(i == 0)
        def _init():
            so_ref[...] = sp_ref[...]
            so_ref[12] = jnp.zeros_like(so_ref[12])
            vo_ref[...] = jnp.zeros_like(vo_ref)
            to_ref[...] = jnp.full(
                to_ref.shape, _FULL if party else np.uint32(0),
                dtype=jnp.uint32)

        R, L = so_ref.shape[1], so_ref.shape[2]
        s_bits = [so_ref[16 * b:16 * (b + 1)].reshape(4, 4, R, L)
                  for b in range(8)]
        t = to_ref[...]
        xb = xp_ref[0]

        # MMO x4: (sl, vl, sr, vr) = AES_{k0..k3}(s) ^ s (dcf.cuh:119).
        outs = []
        for k in range(4):
            e = _aes_bits(s_bits, key_pats[k], byte_idx)
            outs.append([e[b] ^ s_bits[b] for b in range(8)])
        sl, vl, sr, vr = outs

        tl = sl[0][3, 0]
        tr = sr[0][3, 0]
        sl[0] = sl[0] & mask96
        sr[0] = sr[0] & mask96
        vl[0] = vl[0] & mask96  # value blocks are clamped before From
        vr[0] = vr[0] & mask96

        cw = cw_ref[0]  # [258, R, L]: s_cw | v_cw | tl_cw | tr_cw
        for b in range(8):
            cwb = cw[16 * b:16 * (b + 1)].reshape(4, 4, R, L) & t[None,
                                                                  None]
            sl[b] = sl[b] ^ cwb
            sr[b] = sr[b] ^ cwb
        tl = tl ^ (t & cw[256])
        tr = tr ^ (t & cw[257])

        # v += (xb ? vr : vl) + (t ? v_cw : 0)
        v_sel = [vl[b] ^ (xb[None, None] & (vl[b] ^ vr[b]))
                 for b in range(8)]
        sel_flat = [v_sel[p // 16][(p % 16) // 4, (p % 16) % 4]
                    for p in range(128)]
        vcw_flat = [cw[128 + p] & t for p in range(128)]
        v_now = [vo_ref[p] for p in range(128)]
        if group_is_xor:
            v_new = [v_now[p] ^ sel_flat[p] ^ vcw_flat[p]
                     for p in range(128)]
        else:
            v_new = _ripple_add(v_now, sel_flat, group_bits)
            v_new = _ripple_add(v_new, vcw_flat, group_bits)
        vo_ref[...] = jnp.stack(v_new)

        s_new = [sl[b] ^ (xb[None, None] & (sl[b] ^ sr[b]))
                 for b in range(8)]
        to_ref[...] = tl ^ (xb & (tl ^ tr))
        so_ref[...] = jnp.concatenate(
            [v.reshape(16, R, L) for v in s_new], axis=0)

    return kernel


# Largest instance count the DCF pack transposes in one XLA fusion.
# 2026-08-19 bracket triage (triage_dcf_aes.jsonl, steps pack/ktile/
# unpacktile): dcf_pack_eval ALONE crashes the TPU worker at B=2^19 —
# its 32-byte cw rows become a [in_bits*32, B] byte matrix (~1 GB of
# transpose intermediates) — while the eval kernel and the double
# unpack at the same 2^19 shape are clean. Pack in 2^17-row chunks
# (the proven-stable shape; chunks map to independent row tiles, so
# word-axis concatenation is exact).
DCF_PACK_MAX_ROWS = int(os.environ.get("FSS_DCF_PACK_MAX_ROWS",
                                       str(1 << 17)))


def _dcf_pack_keys(s0b, cwsb, in_bits: int, shared_key: bool):
    """Per-instance key planes: (sp [128, Wk], cwp [in_bits, 258, Wk])."""
    Wk = 1 if shared_key else s0b.shape[0] // 32
    sbytes = jnp.stack([(s0b[:, c // 4] >> np.uint32(8 * (c % 4)))
                        & np.uint32(0xFF) for c in range(16)])
    if shared_key:
        sbytes = sbytes.repeat(32, axis=1)
    sp8 = _bytes_to_planes(sbytes)
    sp = jnp.transpose(sp8, (1, 0, 2)).reshape(128, Wk)

    lv = cwsb[:, :in_bits]  # [Bk, n, 8]
    cbytes = jnp.stack([
        (lv[:, :, c // 4] >> np.uint32(8 * (c % 4))) & np.uint32(0xFF)
        for c in range(32)])  # all 8 words
    cb = jnp.transpose(cbytes, (2, 0, 1)).reshape(in_bits * 32, -1)
    if shared_key:
        cb = cb.repeat(32, axis=1)
    cp8 = _bytes_to_planes(cb).reshape(in_bits, 32, 8, Wk)
    # s part: bytes 0..15; v part: bytes 16..31.
    cwp_s = jnp.transpose(cp8[:, :16], (0, 2, 1, 3)).reshape(
        in_bits, 128, Wk)
    cwp_v = jnp.transpose(cp8[:, 16:], (0, 2, 1, 3)).reshape(
        in_bits, 128, Wk)
    tl = cwp_s[:, 12]
    tr = cwp_v[:, 12]
    cwp_s = cwp_s.at[:, 12].set(jnp.zeros_like(tl))
    cwp_v = cwp_v.at[:, 12].set(jnp.zeros_like(tr))
    cwp = jnp.concatenate([cwp_s, cwp_v, tl[:, None], tr[:, None]],
                          axis=1)
    return sp, cwp


def _dcf_pack_xs(xsp, in_bits: int):
    """Eval-point bit planes, MSB-first per level: [in_bits, W]."""
    W = xsp.shape[0] // 32
    xbits = _bytes_to_planes(
        jnp.stack([(xsp >> np.uint32(8 * k)) & np.uint32(0xFF)
                   for k in range(4)]))
    xplane = xbits.reshape(32, W)
    return jnp.stack([xplane[in_bits - 1 - i] for i in range(in_bits)])


def dcf_pack_eval(s0, cws, xs, in_bits: int,
                  block_rows: int = DEFAULT_BLOCK_ROWS,
                  max_rows: int | None = None):
    """DCF keys -> plane layout. cws rows are 8 words: s_cw (tl in the
    word-3 LSB) + v_cw (tr in the word-7 LSB). Returns (sp, cwp
    [in_bits, 258, T, 128], xp, v_last [B?, 4], B). Per-instance key
    batches above ``max_rows`` (default DCF_PACK_MAX_ROWS) are packed
    in chunks — see the worker-crash note above."""
    xs = jnp.asarray(xs, dtype=jnp.uint32)
    B = xs.shape[0]
    tile = 32 * LANES * block_rows
    (xsp,), Bp = _pad_batch([xs], B, tile)
    W = Bp // 32
    T = W // LANES

    cws = jnp.asarray(cws)
    shared_key = cws.ndim == 2
    mr = DCF_PACK_MAX_ROWS if max_rows is None else max_rows
    if shared_key:
        s0b, cwsb = jnp.asarray(s0)[None], cws[None]
        sp, cwp = _dcf_pack_keys(s0b, cwsb, in_bits, shared_key=True)
        sp = jnp.broadcast_to(sp[:, :1], (128, W))
        cwp = jnp.broadcast_to(cwp[:, :, :1], (in_bits, 258, W))
        xp = _dcf_pack_xs(xsp, in_bits)
    else:
        (s0b, cwsb), _ = _pad_batch([jnp.asarray(s0), cws], B, tile)
        if Bp > mr and Bp % mr == 0 and mr % tile == 0:
            C = Bp // mr

            def _chunk(args):
                s0c, cwc, xc = args
                spc, cwpc = _dcf_pack_keys(s0c, cwc, in_bits,
                                           shared_key=False)
                return spc, cwpc, _dcf_pack_xs(xc, in_bits)

            spc, cwpc, xpc = jax.lax.map(_chunk, (
                s0b.reshape(C, mr, 4),
                cwsb.reshape(C, mr, in_bits + 1, 8),
                xsp.reshape(C, mr)))
            sp = jnp.transpose(spc, (1, 0, 2)).reshape(128, W)
            cwp = jnp.transpose(cwpc, (1, 2, 0, 3)).reshape(
                in_bits, 258, W)
            xp = jnp.transpose(xpc, (1, 0, 2)).reshape(in_bits, W)
        else:
            sp, cwp = _dcf_pack_keys(s0b, cwsb, in_bits,
                                     shared_key=False)
            xp = _dcf_pack_xs(xsp, in_bits)

    sp = sp.reshape(128, T, LANES)
    cwp = cwp.reshape(in_bits, 258, T, LANES)
    xp = xp.reshape(in_bits, T, LANES)
    v_last = (cws[None] if shared_key else cwsb)[:, in_bits, 4:8]
    return sp, cwp, xp, v_last, B


# Largest row-tile count a single dcf_eval pallas_call dispatch may see.
# 2026-08-19 triage (scripts/artifacts/triage_dcf_aes.jsonl): the kernel
# is byte-exact at T<=32 (2^17 rows) but the TPU worker crashed at T=128
# (2^19) with the identical per-block shapes, and block_rows=16 showed the
# kernel's scoped-VMEM stack is already at the 16 MB edge. Batches above
# this cap are chunked via lax.map (one device program, sequential
# pallas_calls) instead of one giant grid.
DCF_MAX_T = int(os.environ.get("FSS_DCF_AES_MAX_T", "32"))


def _dcf_eval_call(sp, cwp, xp, in_bits: int, party: int, key_pats,
                   group_is_xor: bool, group_bits: int,
                   block_rows: int, interpret: bool):
    T = sp.shape[1]
    kern = _make_dcf_eval_kernel(in_bits, party, key_pats, group_is_xor,
                                 group_bits)
    R = block_rows
    vo, so, to = pl.pallas_call(
        kern,
        grid=(T // R, in_bits),
        in_specs=[
            pl.BlockSpec((128, R, LANES), lambda w, i: (0, w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 258, R, LANES), lambda w, i: (i, 0, w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, LANES), lambda w, i: (i, w, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((128, R, LANES), lambda w, i: (0, w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, R, LANES), lambda w, i: (0, w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda w, i: (w, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((128, T, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((128, T, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((T, LANES), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(sp, cwp, xp)
    return vo, so, to


@functools.partial(jax.jit,
                   static_argnames=("in_bits", "party", "keys",
                                    "group_is_xor", "group_bits",
                                    "block_rows", "interpret", "max_t"))
def dcf_eval_packed(sp, cwp, xp, in_bits: int, party: int, keys,
                    group_is_xor: bool, group_bits: int,
                    block_rows: int = DEFAULT_BLOCK_ROWS,
                    interpret: bool = False, max_t: int | None = None):
    T = sp.shape[1]
    assert T % block_rows == 0
    key_pats = tuple(
        tuple(map(tuple, _key_patterns(_round_key_bytes(k))))
        for k in keys)
    mt = DCF_MAX_T if max_t is None else max_t
    mt = max(block_rows, (mt // block_rows) * block_rows)
    if T <= mt or T % mt:
        return _dcf_eval_call(sp, cwp, xp, in_bits, party, key_pats,
                              group_is_xor, group_bits, block_rows,
                              interpret)
    C = T // mt
    n = in_bits
    spc = sp.reshape(128, C, mt, LANES).transpose(1, 0, 2, 3)
    cwpc = cwp.reshape(n, 258, C, mt, LANES).transpose(2, 0, 1, 3, 4)
    xpc = xp.reshape(n, C, mt, LANES).transpose(1, 0, 2, 3)
    vo, so, to = jax.lax.map(
        lambda c: _dcf_eval_call(c[0], c[1], c[2], in_bits, party,
                                 key_pats, group_is_xor, group_bits,
                                 block_rows, interpret),
        (spc, cwpc, xpc))
    vo = vo.transpose(1, 0, 2, 3).reshape(128, T, LANES)
    so = so.transpose(1, 0, 2, 3).reshape(128, T, LANES)
    to = to.reshape(T, LANES)
    return vo, so, to


def dcf_kernel_supports_group(group) -> bool:
    """The plane-domain AES DCF value thread handles XOR and wrapping
    adds only (mod groups take the XLA or ChaCha-kernel paths)."""
    from fss_tpu import groups as _groups
    return isinstance(group, _groups.Bytes) or (
        isinstance(group, _groups.Uint) and group.mod == 0)


def dcf_eval_points(prg_keys, group, in_bits: int, party: int,
                    s0: jax.Array, cws: jax.Array, xs: jax.Array,
                    block_rows: int = DEFAULT_BLOCK_ROWS,
                    interpret: bool = False,
                    max_t: int | None = None) -> jax.Array:
    """DCF point evaluation on the plane-domain AES kernel
    (dcf.cuh:205-276). Supports Bytes and wrapping Uint groups."""
    from fss_tpu import groups as _groups

    group_is_xor = isinstance(group, _groups.Bytes)
    assert group_is_xor or (isinstance(group, _groups.Uint)
                            and group.mod == 0)
    gbits = 0 if group_is_xor else min(group.bits, 128)
    sp, cwp, xp, v_last, B = dcf_pack_eval(s0, cws, xs, in_bits,
                                           block_rows)
    vo, so, to = dcf_eval_packed(
        sp, cwp, xp, in_bits=in_bits, party=party,
        keys=tuple(bytes(k) for k in prg_keys),
        group_is_xor=group_is_xor, group_bits=gbits,
        block_rows=block_rows, interpret=interpret, max_t=max_t)
    v_raw, _tb = unpack_out(vo, to, B)
    s, tb = unpack_out(so, to, B)
    v_lastb = v_last if v_last.shape[0] == 1 else v_last[:B]
    v = group.from_block(v_raw)
    term = group.from_block(s)
    term = jnp.where(tb.astype(jnp.bool_)[:, None],
                     group.add(term, group.from_block(v_lastb)), term)
    y = group.add(v, term)
    if party:
        y = group.neg(y)
    return group.into_block(y)


# ---------------------------------------------------------------------------
# Fused batched Gen kernel in the plane domain (dpf.cuh:93-153): both
# parties' tree walks run bitsliced — 4 AES per level (2 MMO lanes x 2
# parties) — emitting per-level correction-word planes in the exact layout
# pack_eval produces, so gen -> eval chains stay in plane space with no
# word-domain round trip. The reference generates AES-config keys host-only
# (aes128_mmo.cuh is __trap() on device); its GPU ChaCha gen posture is
# 175-190 M keys/s (README.md:372-380 there) — this closes the analogous
# device-gen gap for the AES config (the XLA bitsliced path managed only
# ~30-65 k keys/s; see docs/benchmarks.md).
# ---------------------------------------------------------------------------


def _make_gen_kernel(in_bits: int, key_pats):
    """key_pats: tuple of 2 per-key round-key pattern structures (the
    mul=2 MMO lanes; dpf Gen consumes both children per level)."""

    def kernel(sp0_ref, sp1_ref, ap_ref, cwo_ref, s0o_ref, s1o_ref,
               t0o_ref, t1o_ref, st0_ref, st1_ref, tt0_ref, tt1_ref):
        i = pl.program_id(1)
        byte_idx = _byte_iota()
        mask96 = ~_pattern_mask(byte_idx, 1 << 12)  # clamped-bit plane

        @pl.when(i == 0)
        def _init():
            st0_ref[...] = sp0_ref[...]
            st0_ref[12] = jnp.zeros_like(st0_ref[12])
            st1_ref[...] = sp1_ref[...]
            st1_ref[12] = jnp.zeros_like(st1_ref[12])
            tt0_ref[...] = jnp.zeros(tt0_ref.shape, dtype=jnp.uint32)
            tt1_ref[...] = jnp.full(tt1_ref.shape, _FULL,
                                    dtype=jnp.uint32)

        R, L = st0_ref.shape[1], st0_ref.shape[2]

        def expand(st_ref):
            s_bits = [st_ref[16 * b:16 * (b + 1)].reshape(4, 4, R, L)
                      for b in range(8)]
            kids = []
            for k in range(2):
                e = _aes_bits(s_bits, key_pats[k], byte_idx)
                kids.append([e[b] ^ s_bits[b] for b in range(8)])
            return kids

        (l0, r0), (l1, r1) = expand(st0_ref), expand(st1_ref)
        t0l, t0r = l0[0][3, 0], r0[0][3, 0]
        t1l, t1r = l1[0][3, 0], r1[0][3, 0]
        for kid in (l0, r0, l1, r1):
            kid[0] = kid[0] & mask96

        ab = ap_ref[0]  # [R, L] alpha-bit plane, MSB-first level order

        # Off-path sibling XOR is the CW (dpf.cuh:117-122):
        # cw = ab ? (l0 ^ l1) : (r0 ^ r1), per plane.
        cwb = []
        for b in range(8):
            lx = l0[b] ^ l1[b]
            rx = r0[b] ^ r1[b]
            cwb.append(rx ^ (ab[None] & (lx ^ rx)))
        tl_cw = t0l ^ t1l ^ ab ^ _FULL
        tr_cw = t0r ^ t1r ^ ab

        # Emit the eval kernel's cw layout: 128 planes (plane 12 zero) +
        # tl + tr planes. Plane 12 (global) is row 12 of the first
        # 16-plane part; zero it via static slice+concat — a value-level
        # .at[12].set lowers to `scatter`, which Mosaic cannot compile
        # (campaign crash 2026-08-19; interpret mode accepted it).
        parts = [v.reshape(16, R, L) for v in cwb]
        parts[0] = jnp.concatenate(
            [parts[0][:12], jnp.zeros_like(parts[0][12:13]),
             parts[0][13:]], axis=0)
        cwo_ref[0] = jnp.concatenate(
            parts + [tl_cw[None], tr_cw[None]], axis=0)

        # Descend on the alpha path, applying the cw where t is set
        # (dpf.cuh:124-147).
        tcw = tl_cw ^ (ab & (tl_cw ^ tr_cw))
        for st_ref, tt_ref, (lk, rk), (tl, tr) in (
                (st0_ref, tt0_ref, (l0, r0), (t0l, t0r)),
                (st1_ref, tt1_ref, (l1, r1), (t1l, t1r))):
            t = tt_ref[...]
            nb = []
            for b in range(8):
                keep = lk[b] ^ (ab[None] & (lk[b] ^ rk[b]))
                cm = cwb[b] & t[None]
                if b == 0:
                    cm = cm & mask96
                nb.append(keep ^ cm)
            tt_ref[...] = (tl ^ (ab & (tl ^ tr))) ^ (t & tcw)
            st_ref[...] = jnp.concatenate(
                [v.reshape(16, R, L) for v in nb], axis=0)

        s0o_ref[...] = st0_ref[...]
        s1o_ref[...] = st1_ref[...]
        t0o_ref[...] = tt0_ref[...]
        t1o_ref[...] = tt1_ref[...]

    return kernel


def pack_gen(s0s: jax.Array, alphas: jax.Array, in_bits: int,
             block_rows: int = DEFAULT_BLOCK_ROWS):
    """s0s [B, 2, 4], alphas [B] uint32 -> (sp0, sp1 [128, T, 128],
    ap [in_bits, T, 128], B)."""
    alphas = jnp.asarray(alphas, dtype=jnp.uint32)
    B = alphas.shape[0]
    tile = 32 * LANES * block_rows
    (ap_, s0b), Bp = _pad_batch([alphas, s0s], B, tile)
    W = Bp // 32
    T = W // LANES

    sps = []
    for p in range(2):
        sbytes = jnp.stack(
            [(s0b[:, p, c // 4] >> np.uint32(8 * (c % 4)))
             & np.uint32(0xFF) for c in range(16)])
        sp8 = _bytes_to_planes(sbytes)  # [16, 8, W]
        sps.append(jnp.transpose(sp8, (1, 0, 2)).reshape(128, T, LANES))

    abits = _bytes_to_planes(
        jnp.stack([(ap_ >> np.uint32(8 * k)) & np.uint32(0xFF)
                   for k in range(4)]))
    aplane = abits.reshape(32, W)
    ap = jnp.stack([aplane[in_bits - 1 - i]
                    for i in range(in_bits)]).reshape(in_bits, T, LANES)
    return sps[0], sps[1], ap, B


@functools.partial(jax.jit,
                   static_argnames=("in_bits", "keys", "block_rows",
                                    "interpret"))
def gen_packed(sp0, sp1, ap, in_bits: int, keys,
               block_rows: int = DEFAULT_BLOCK_ROWS,
               interpret: bool = False):
    """Run the fused plane-domain Gen kernel. Returns
    (cwp [in_bits, 130, T, 128] — pack_eval's layout — plus final seed
    planes s0f/s1f [128, T, 128] and t planes t0/t1 [T, 128])."""
    T = sp0.shape[1]
    assert T % block_rows == 0
    key_pats = tuple(
        tuple(map(tuple, _key_patterns(_round_key_bytes(k))))
        for k in keys)
    kern = _make_gen_kernel(in_bits, key_pats)
    R = block_rows
    return pl.pallas_call(
        kern,
        grid=(T // R, in_bits),
        in_specs=[
            pl.BlockSpec((128, R, LANES), lambda w, i: (0, w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, R, LANES), lambda w, i: (0, w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, LANES), lambda w, i: (i, w, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 130, R, LANES), lambda w, i: (i, 0, w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, R, LANES), lambda w, i: (0, w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, R, LANES), lambda w, i: (0, w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda w, i: (w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda w, i: (w, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((in_bits, 130, T, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((128, T, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((128, T, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((T, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((T, LANES), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((128, R, LANES), jnp.uint32),
            pltpu.VMEM((128, R, LANES), jnp.uint32),
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.VMEM((R, LANES), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(sp0, sp1, ap)


def unpack_cws(cwp: jax.Array, batch: int) -> jax.Array:
    """Gen-kernel cw planes [in_bits, 130, T, 128] -> standard word rows
    [B, in_bits, 8] (tl folded into word 3 bit 0, tr in word 4 bit 0)."""
    n = cwp.shape[0]
    W = cwp.shape[2] * LANES
    planes = cwp.reshape(n, 130, W)
    # Restore the tl plane into its clamped-bit slot for word assembly.
    planes_s = planes[:, :128].at[:, 12].set(planes[:, 128])
    words = []
    for w in range(4):
        rows = [planes_s[:, 16 * (j % 8) + 4 * w + j // 8]
                for j in range(32)]
        tr32 = _transpose32(jnp.stack(rows, axis=-1))  # [n, W, 32]
        words.append(tr32.reshape(n, W * 32))
    tr_rows = [planes[:, 129]] + [jnp.zeros_like(planes[:, 129])] * 31
    w4 = _transpose32(jnp.stack(tr_rows, axis=-1)).reshape(n, W * 32)
    zero = jnp.zeros_like(w4)
    rows8 = jnp.stack(words + [w4, zero, zero, zero], axis=-1)  # [n,B,8]
    return jnp.transpose(rows8, (1, 0, 2))[:batch]


def gen_batch(prg_keys, group, in_bits: int, s0s: jax.Array,
              alphas: jax.Array, betas: jax.Array,
              block_rows: int = DEFAULT_BLOCK_ROWS,
              interpret: bool = False) -> jax.Array:
    """Batched AES-MMO DPF key generation on the fused plane-domain
    kernel; returns the standard [B, in_bits+1, 8] cws layout (bit-exact
    with schemes.dpf.gen; dpf.cuh:93-153)."""
    keys = tuple(bytes(k) for k in prg_keys)
    sp0, sp1, ap, B = pack_gen(jnp.asarray(s0s),
                               jnp.asarray(alphas, dtype=jnp.uint32),
                               in_bits, block_rows)
    cwp, s0f, s1f, _t0, t1 = gen_packed(sp0, sp1, ap, in_bits=in_bits,
                                        keys=keys, block_rows=block_rows,
                                        interpret=interpret)
    rows = unpack_cws(cwp, B)
    s0w, _ = unpack_out(s0f, t1, B)
    s1w, t1b = unpack_out(s1f, t1, B)

    from fss_tpu import block as blk
    b_buf = blk.clear_lsb(jnp.asarray(betas))
    v_cw = group.add(
        group.add(group.from_block(b_buf),
                  group.neg(group.from_block(s0w))),
        group.from_block(s1w))
    v_cw = jnp.where((t1b & np.uint32(1)).astype(jnp.bool_)[:, None],
                     group.neg(v_cw), v_cw)
    last = jnp.concatenate(
        [group.into_block(v_cw), jnp.zeros((B, 4), dtype=jnp.uint32)],
        axis=-1)
    return jnp.concatenate([rows, last[:, None, :]], axis=1)


# ---------------------------------------------------------------------------
# Fused batched DCF Gen kernel in the plane domain (dcf.cuh:108-194):
# both parties' tree walks run bitsliced — 8 AES per level (4 MMO lanes
# x 2 parties) — with the running group value v, the value CW
# construction, and the conditional negations all as bitsliced
# ripple-carry chains over the value bit-planes (Bytes group: plain
# XOR). Emits dcf_pack_eval's [258]-plane cw layout per level, so
# gen -> eval chains stay in plane space. The reference generates
# AES-config DCF keys host-only (its device AES traps).
# ---------------------------------------------------------------------------


def _flat_planes(groups8):
    """8 bit-groups [4, 4, R, L] -> flat list of 128 [R, L] planes."""
    return [groups8[p // 16][(p % 16) // 4, (p % 16) % 4]
            for p in range(128)]


def _bits_add(a, b):
    """Bitsliced a + b over bit-indexed lists (wrapping at len(a))."""
    out, carry = [], None
    for k in range(len(a)):
        axb = a[k] ^ b[k]
        if carry is None:
            out.append(axb)
            carry = a[k] & b[k]
        else:
            out.append(axb ^ carry)
            carry = (a[k] & b[k]) | (carry & axb)
    return out


def _bits_sub(a, b):
    """Bitsliced a - b (= a + ~b + 1) over bit-indexed lists."""
    out, carry = [], None
    for k in range(len(a)):
        nb = ~b[k]
        axb = a[k] ^ nb
        if carry is None:
            out.append(~axb)  # + carry-in 1
            carry = a[k] | nb
        else:
            out.append(axb ^ carry)
            carry = (a[k] & nb) | (carry & axb)
    return out


def _bits_neg(a):
    """Bitsliced two's-complement negation (~a + 1)."""
    out, carry = [], None
    for k in range(len(a)):
        na = ~a[k]
        if carry is None:
            out.append(a[k])  # na ^ 1
            carry = na
        else:
            out.append(na ^ carry)
            carry = na & carry
    return out


def _sel_list(mask, a, b):
    """Per-plane mask ? a : b over equal-length lists."""
    return [y ^ (mask & (x ^ y)) for x, y in zip(a, b)]


def dcf_gen_kernel_supports_group(group) -> bool:
    """Bytes, or wrapping Uint up to 64 bits (value bit k of a <=64-bit
    group never lands on the clamped-bit plane 12; 128-bit groups keep
    the scheme fallback)."""
    from fss_tpu import groups as _groups
    if isinstance(group, _groups.Bytes):
        return True
    return (isinstance(group, _groups.Uint) and group.mod == 0
            and group.bits <= 64)


def _make_dcf_gen_kernel(in_bits: int, key_pats, pred: str,
                         group_is_xor: bool, group_bits: int):
    """key_pats: 4 per-key round-key patterns (the mul=4 MMO lanes)."""
    gplanes = ([None] if group_is_xor else
               [_plane_index(k) for k in range(group_bits)])

    def kernel(sp0_ref, sp1_ref, bp_ref, ap_ref, cwo_ref, s0o_ref,
               s1o_ref, vo_ref, t0o_ref, t1o_ref):
        i = pl.program_id(1)
        byte_idx = _byte_iota()
        mask96 = ~_pattern_mask(byte_idx, 1 << 12)

        @pl.when(i == 0)
        def _init():
            s0o_ref[...] = sp0_ref[...]
            s0o_ref[12] = jnp.zeros_like(s0o_ref[12])
            s1o_ref[...] = sp1_ref[...]
            s1o_ref[12] = jnp.zeros_like(s1o_ref[12])
            vo_ref[...] = jnp.zeros_like(vo_ref)
            t0o_ref[...] = jnp.zeros(t0o_ref.shape, dtype=jnp.uint32)
            t1o_ref[...] = jnp.full(t1o_ref.shape, _FULL,
                                    dtype=jnp.uint32)

        R, L = s0o_ref.shape[1], s0o_ref.shape[2]

        def gval(flat):
            """Group value from 128 flat planes (drops non-group bits
            for Uint; keeps all planes for Bytes)."""
            if group_is_xor:
                return list(flat)
            return [flat[p] for p in gplanes]

        def expand(st_ref):
            s_bits = [st_ref[16 * b:16 * (b + 1)].reshape(4, 4, R, L)
                      for b in range(8)]
            kids = []
            for k in range(4):  # s_l, v_l, s_r, v_r (dcf.cuh:119)
                e = _aes_bits(s_bits, key_pats[k], byte_idx)
                kids.append([e[b] ^ s_bits[b] for b in range(8)])
            return kids

        k0, k1 = expand(s0o_ref), expand(s1o_ref)
        s0l, v0l8, s0r, v0r8 = k0
        s1l, v1l8, s1r, v1r8 = k1
        t0l, t0r = s0l[0][3, 0], s0r[0][3, 0]
        t1l, t1r = s1l[0][3, 0], s1r[0][3, 0]
        for kid in (s0l, s0r, s1l, s1r, v0l8, v0r8, v1l8, v1r8):
            kid[0] = kid[0] & mask96  # clear the clamped-bit plane

        ab = ap_ref[0]  # [R, L] alpha-bit plane (MSB-first level order)

        # Seed CW = off-path sibling XOR (dcf.cuh:135-139).
        cwb = []
        for b in range(8):
            lx = s0l[b] ^ s1l[b]
            rx = s0r[b] ^ s1r[b]
            cwb.append(rx ^ (ab[None, None] & (lx ^ rx)))
        tl_cw = t0l ^ t1l ^ ab ^ _FULL
        tr_cw = t0r ^ t1r ^ ab

        # Value blocks as group bit-lists.
        v0l = gval(_flat_planes(v0l8))
        v0r = gval(_flat_planes(v0r8))
        v1l = gval(_flat_planes(v1l8))
        v1r = gval(_flat_planes(v1r8))
        bv = gval([bp_ref[p] for p in range(128)])
        v = gval([vo_ref[p] for p in range(128)])
        t1 = t1o_ref[...]

        # v_cw = -v + v1_off - v0_off (+ b on the predicate side),
        # negated where t1 (dcf.cuh:145-153).
        v1_off = _sel_list(ab, v1l, v1r)
        v0_off = _sel_list(ab, v0l, v0r)
        if group_is_xor:
            v_cw = [x ^ y ^ z for x, y, z in zip(v, v1_off, v0_off)]
        else:
            v_cw = _bits_sub(_bits_sub(v1_off, v0_off), v)
        add_b = ab if pred == "lt" else ~ab
        if group_is_xor:
            v_cw = _sel_list(add_b, [x ^ y for x, y in zip(v_cw, bv)],
                             v_cw)
        else:
            v_cw = _sel_list(add_b, _bits_add(v_cw, bv), v_cw)
            v_cw = _sel_list(t1, _bits_neg(v_cw), v_cw)

        # Thread the running value (dcf.cuh:155-158):
        # v += v0_on - v1_on + (t1 ? -v_cw : v_cw).
        v1_on = _sel_list(ab, v1r, v1l)
        v0_on = _sel_list(ab, v0r, v0l)
        if group_is_xor:
            v = [a ^ b ^ c ^ d for a, b, c, d in
                 zip(v, v1_on, v0_on, v_cw)]
        else:
            v = _bits_add(_bits_sub(v, v1_on), v0_on)
            v = _bits_add(v, _sel_list(t1, _bits_neg(v_cw), v_cw))

        # Emit dcf_pack_eval's cw layout: 128 s planes | 128 v planes
        # (clamped plane zero in both) | tl | tr.
        s_parts = [p.reshape(16, R, L) for p in cwb]
        zero = jnp.zeros((R, L), dtype=jnp.uint32)
        if group_is_xor:
            v_planes = list(v_cw)
            v_planes[12] = zero
        else:
            v_planes = [zero] * 128
            for k, p in enumerate(gplanes):
                v_planes[p] = v_cw[k]
        cwo_ref[0] = jnp.concatenate(
            s_parts + [jnp.stack(v_planes), tl_cw[None], tr_cw[None]],
            axis=0)

        # Descend on the alpha path (dcf.cuh:160-188).
        tcw = tl_cw ^ (ab & (tl_cw ^ tr_cw))
        for st_ref, tt_ref, (lk, rk), (tl, tr) in (
                (s0o_ref, t0o_ref, (s0l, s0r), (t0l, t0r)),
                (s1o_ref, t1o_ref, (s1l, s1r), (t1l, t1r))):
            t = tt_ref[...]
            nb = []
            for b in range(8):
                keep = lk[b] ^ (ab[None, None] & (lk[b] ^ rk[b]))
                cm = cwb[b] & t[None, None]
                if b == 0:
                    cm = cm & mask96
                nb.append(keep ^ cm)
            tt_ref[...] = (tl ^ (ab & (tl ^ tr))) ^ (t & tcw)
            st_ref[...] = jnp.concatenate(
                [x.reshape(16, R, L) for x in nb], axis=0)

        # Persist the running value planes.
        if group_is_xor:
            vo_ref[...] = jnp.stack(v)
        else:
            vfull = [zero] * 128
            for k, p in enumerate(gplanes):
                vfull[p] = v[k]
            vo_ref[...] = jnp.stack(vfull)

    return kernel


def _pack_block_planes(blocks: jax.Array, T: int):
    """[Bp, 4] uint32 blocks -> [128, T, LANES] planes."""
    sbytes = jnp.stack([(blocks[:, c // 4] >> np.uint32(8 * (c % 4)))
                        & np.uint32(0xFF) for c in range(16)])
    sp8 = _bytes_to_planes(sbytes)
    return jnp.transpose(sp8, (1, 0, 2)).reshape(128, T, LANES)


@functools.partial(jax.jit,
                   static_argnames=("in_bits", "keys", "pred",
                                    "group_is_xor", "group_bits",
                                    "block_rows", "interpret"))
def dcf_gen_packed(sp0, sp1, bp, ap, in_bits: int, keys, pred: str,
                   group_is_xor: bool, group_bits: int,
                   block_rows: int = DEFAULT_BLOCK_ROWS,
                   interpret: bool = False):
    """Run the fused plane-domain DCF Gen kernel. Returns
    (cwp [in_bits, 258, T, 128] — dcf_pack_eval's layout — final seed
    planes s0f/s1f, running-value planes vf, and t planes t0/t1)."""
    T = sp0.shape[1]
    assert T % block_rows == 0
    key_pats = tuple(
        tuple(map(tuple, _key_patterns(_round_key_bytes(k))))
        for k in keys)
    kern = _make_dcf_gen_kernel(in_bits, key_pats, pred, group_is_xor,
                                group_bits)
    R = block_rows
    plane_spec = pl.BlockSpec((128, R, LANES), lambda w, i: (0, w, 0),
                              memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((R, LANES), lambda w, i: (w, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(T // R, in_bits),
        in_specs=[
            plane_spec, plane_spec, plane_spec,
            pl.BlockSpec((1, R, LANES), lambda w, i: (i, w, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 258, R, LANES), lambda w, i: (i, 0, w, 0),
                         memory_space=pltpu.VMEM),
            plane_spec, plane_spec, plane_spec, t_spec, t_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((in_bits, 258, T, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((128, T, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((128, T, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((128, T, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((T, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((T, LANES), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # 8 AES expansions + the ripple chains per level need more
            # scoped-VMEM stack than the 16 MB default (cf. the DCF
            # eval kernel's 18.78 M at block_rows=16).
            vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(sp0, sp1, bp, ap)


def unpack_dcf_cws(cwp: jax.Array, batch: int) -> jax.Array:
    """DCF gen-kernel cw planes [in_bits, 258, T, 128] -> standard word
    rows [B, in_bits, 8] (tl in word 3 bit 0, tr in word 7 bit 0)."""
    n = cwp.shape[0]
    W = cwp.shape[2] * LANES
    planes = cwp.reshape(n, 258, W)
    planes_s = planes[:, :128].at[:, 12].set(planes[:, 256])
    planes_v = planes[:, 128:256].at[:, 12].set(planes[:, 257])
    words = []
    for src in (planes_s, planes_v):
        for w in range(4):
            rows = [src[:, 16 * (j % 8) + 4 * w + j // 8]
                    for j in range(32)]
            tr32 = _transpose32(jnp.stack(rows, axis=-1))  # [n, W, 32]
            words.append(tr32.reshape(n, W * 32))
    rows8 = jnp.stack(words, axis=-1)  # [n, Bp, 8]
    return jnp.transpose(rows8, (1, 0, 2))[:batch]


def dcf_gen_batch(prg_keys, group, in_bits: int, pred: str,
                  s0s: jax.Array, alphas: jax.Array, betas: jax.Array,
                  block_rows: int = DEFAULT_BLOCK_ROWS,
                  interpret: bool = False) -> jax.Array:
    """Batched AES-MMO DCF key generation on the fused plane-domain
    kernel; returns the standard [B, in_bits+1, 8] cws layout (bit-exact
    with schemes.dcf.gen; dcf.cuh:108-194)."""
    from fss_tpu import block as blk
    from fss_tpu import groups as _groups

    assert dcf_gen_kernel_supports_group(group)
    group_is_xor = isinstance(group, _groups.Bytes)
    gbits = 0 if group_is_xor else group.bits
    keys = tuple(bytes(k) for k in prg_keys)
    sp0, sp1, ap, B = pack_gen(jnp.asarray(s0s),
                               jnp.asarray(alphas, dtype=jnp.uint32),
                               in_bits, block_rows)
    T = sp0.shape[1]
    b_buf = blk.clear_lsb(jnp.asarray(betas))
    tile = 32 * LANES * block_rows
    (b_pad,), _ = _pad_batch([b_buf], B, tile)
    bp = _pack_block_planes(b_pad, T)

    cwp, s0f, s1f, vf, _t0, t1 = dcf_gen_packed(
        sp0, sp1, bp, ap, in_bits=in_bits, keys=keys, pred=pred,
        group_is_xor=group_is_xor, group_bits=gbits,
        block_rows=block_rows, interpret=interpret)
    rows = unpack_dcf_cws(cwp, B)
    s0w, _ = unpack_out(s0f, t1, B)
    s1w, t1b = unpack_out(s1f, t1, B)
    vw, _ = unpack_out(vf, t1, B)

    # Final CW (dcf.cuh:191-193): v_last = s1 - s0 - v, negated if t1.
    v_last = group.add(
        group.add(group.from_block(s1w), group.neg(group.from_block(s0w))),
        group.neg(group.from_block(vw)))
    v_last = jnp.where((t1b & np.uint32(1)).astype(jnp.bool_)[:, None],
                       group.neg(v_last), v_last)
    last = jnp.concatenate(
        [jnp.zeros((B, 4), dtype=jnp.uint32), group.into_block(v_last)],
        axis=-1)
    return jnp.concatenate([rows, last[:, None, :]], axis=1)
