"""Verifiable distributed multi-point function via Cuckoo hashing.

TPU-native re-design of reference include/fss/vdmpf.cuh: t point functions
are Cuckoo-placed into m buckets (host-side, O(t), cuckoo_hash.cuh:154-199)
and each bucket gets an inner VDPF over a 2^bucket_bits domain. Gen runs
all m inner VDPF Gens as ONE vmapped batch; BatchEval routes all eta*kappa
(x, hash-fn) pairs with ONE batched PRP kernel, evaluates all inner VDPFs
as ONE batched eval, and reduces per-point shares with a kappa-width group
fold — the reference's per-bucket std::vector routing loops
(vdmpf.cuh:213-261) become dense device ops.

Key layout parity (vdmpf.cuh:103-120): per-party key = sigma (PRP seed) +
runtime m_rt / b_size_rt + stacked bucket keys {cws [m, bucket_bits, 8],
cs [m, 4, 4], ocw [m, 4], s0 [m, 4]}.

Proof-fold note: two folds are provided (both parties must pick the same
one). fold="tree" (default) is the framework's documented fast variant: a
Merkle-style tree over [bucket check-seeds || corrected per-point hashes in
flat (omega-major, hash-fn-minor) order], with duplicate entries replaced
by the public zero leaf and the list zero-padded to a power of two —
log-depth, every level one batched hash. fold="reference" reproduces the
reference's chain byte-for-byte (vdmpf.cuh:242-268): per-bucket chains
seeded from each bucket's check seed, folding routed entries in the
reference's (omega-major, hash-fn-minor) scan order, then a cross-bucket
chain over all m buckets — O(eta*kappa + m) dependent hashes, for
wire-format interop (verified against golden vectors from the reference's
own code in tests/test_golden.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fss_tpu import block as blk
from fss_tpu.prp.feistel import Aes128Feistel
from fss_tpu.schemes import cuckoo
from fss_tpu.schemes import vdpf as _vdpf

KAPPA = 3
CH_LAMBDA = 80


class VdmpfKey(NamedTuple):
    """One party's VDMPF key (vdmpf.cuh:115-120)."""

    sigma: bytes     # PRP seed, public to both parties (static)
    m_rt: int        # runtime bucket count (static)
    b_size_rt: int   # runtime bucket size (static)
    s0: jax.Array    # [m, 4] this party's inner seeds
    cws: jax.Array   # [m, bucket_bits, 8]
    cs: jax.Array    # [m, 4, 4]
    ocw: jax.Array   # [m, 4]


def gen(prg2, xor_hash, group, in_bits: int, bucket_bits: int,
        max_points: int, sigma, s0s: jax.Array, alphas, betas: jax.Array,
        kappa: int = KAPPA, ch_lambda: int = CH_LAMBDA,
        ch_retry: int = 1000):
    """Generate a VDMPF key pair (vdmpf.cuh:135-189).

    s0s: [m, 2, 4] inner seeds where m = ch_bucket(max_points, ch_lambda);
    alphas: t >= 30 Python ints; betas: [t, 4]. Returns (key0, key1, fail)
    with fail True when Cuckoo insertion or any inner VDPF Gen failed (the
    caller resamples sigma and s0s and retries — see api.Vdmpf.gen_retry).
    """
    t = len(alphas)
    assert 30 <= t <= max_points
    m = cuckoo.ch_bucket(max_points, ch_lambda)
    assert s0s.shape == (m, 2, 4)
    n = 1 << in_bits
    m_rt = cuckoo.ch_bucket(t, ch_lambda)
    assert m_rt <= m
    b_rt = (n * kappa + m_rt - 1) // m_rt
    assert b_rt <= (1 << bucket_bits), "bucket_bits too small for t"

    prp = Aes128Feistel(sigma, n * kappa)
    table = cuckoo.compact_run(prp, alphas, m_rt, n, b_rt, ch_retry, kappa)
    if table is None:
        zero_key = _zero_key(sigma, m_rt, b_rt, s0s, bucket_bits, m)
        return zero_key[0], zero_key[1], True

    # Per-bucket inner point: alpha' = within-bucket index, beta' = payload;
    # empty buckets share the zero function (vdmpf.cuh:164-175).
    a_prime = [0] * m  # ints: wide bucket domains exceed uint32
    b_prime = np.zeros((m, 4), dtype=np.uint32)
    betas_np = np.asarray(betas, dtype=np.uint32)
    for i in range(m_rt):
        j, k = table[i]
        if j == -1:
            continue
        _, index = cuckoo.locate_host(prp, int(alphas[j]), k, n, b_rt, kappa)
        a_prime[i] = int(index)
        b_prime[i] = betas_np[j]

    a_lanes = blk.pack_inputs(a_prime, bucket_bits)  # [m, 4]
    cws, cs, ocw, fails = jax.vmap(
        lambda s, al, be: _vdpf.gen(prg2, xor_hash, group, bucket_bits,
                                    s, al, be))(s0s, a_lanes,
                                                jnp.asarray(b_prime))
    fail = bool(np.any(np.asarray(fails)))
    k0 = VdmpfKey(prp.sigma, m_rt, b_rt, s0s[:, 0], cws, cs, ocw)
    k1 = VdmpfKey(prp.sigma, m_rt, b_rt, s0s[:, 1], cws, cs, ocw)
    return k0, k1, fail


def _zero_key(sigma, m_rt, b_rt, s0s, bucket_bits, m):
    z = jnp.zeros((m, bucket_bits, 8), dtype=jnp.uint32)
    zc = jnp.zeros((m, 4, 4), dtype=jnp.uint32)
    zo = jnp.zeros((m, 4), dtype=jnp.uint32)
    return (VdmpfKey(bytes(16), m_rt, b_rt, s0s[:, 0], z, zc, zo),
            VdmpfKey(bytes(16), m_rt, b_rt, s0s[:, 1], z, zc, zo))


def route(key: VdmpfKey, in_bits: int, xs, kappa: int = KAPPA):
    """Batched Locate: xs [eta] -> (bucket [eta, kappa], index, dup
    [eta, kappa]) where dup marks repeated (bucket, index) pairs per
    point (the dedup of vdmpf.cuh:221-231).

    in_bits <= 29: PRP values fit uint32; index is [eta, kappa] uint32
    (with a tabulated permutation for domains <= 2^22 — one gather per
    Locate). Wider domains (parity with the reference PRP's __uint128_t
    domain, prp.cuh:22-25): the 4-lane Feistel walk, index returned as
    [eta, kappa, 4] packed uint32 lanes; bucket/index come from an
    m_rt-way compare-accumulate instead of a 128-bit divide (m_rt is
    static and small, so the "division" is ~m_rt lane compares).
    """
    n = 1 << in_bits
    if in_bits <= 29:
        xs = jnp.asarray(xs, dtype=jnp.uint32)
        prp = Aes128Feistel(key.sigma, n * kappa)
        vals = jnp.stack([xs + np.uint32(n * k) for k in range(kappa)],
                         axis=-1)  # [eta, kappa]
        if n * kappa <= Aes128Feistel.TABLE_MAX_DOMAIN:
            # Public permutation tabulated once per key (host AES-NI):
            # each Locate becomes one gather instead of 4 AES rounds of
            # gathers.
            table = jnp.asarray(prp.permutation_table())
            y = table[vals]
        else:
            _, y = prp.permu(vals)  # hi is all-zero for this domain size
        b_rt = np.uint32(key.b_size_rt)
        bucket = y // b_rt
        index = y % b_rt
        dup = jnp.zeros(bucket.shape, dtype=jnp.bool_)
        for k in range(1, kappa):
            same = jnp.zeros(bucket.shape[:-1], dtype=jnp.bool_)
            for kp in range(k):
                same = same | ((bucket[..., kp] == bucket[..., k])
                               & (index[..., kp] == index[..., k]))
            dup = dup.at[..., k].set(same)
        return bucket, index, dup

    from fss_tpu.ops._chacha_core import add128, neg128
    from fss_tpu.prp.feistel import _lt_const_lanes

    x4 = blk.pack_inputs(xs, in_bits)  # [eta, 4]
    prp = Aes128Feistel(key.sigma, n * kappa)
    vals = []
    for k in range(kappa):
        off = n * k
        offw = tuple(np.uint32((off >> (32 * i)) & 0xFFFFFFFF)
                     for i in range(4))
        w = add128(tuple(x4[..., i] for i in range(4)),
                   tuple(jnp.full(x4.shape[:-1], o, dtype=jnp.uint32)
                         for o in offw))
        vals.append(jnp.stack(w, axis=-1))
    vals = jnp.stack(vals, axis=-2)        # [eta, kappa, 4]
    y = prp.permu_lanes(vals)              # [eta, kappa, 4]

    # bucket = y // b_size via compare-accumulate; base = bucket * b_size
    # accumulated alongside so index = y - base needs no multiply.
    b_rt = key.b_size_rt
    bucket = jnp.zeros(y.shape[:-1], dtype=jnp.int32)
    base = jnp.zeros_like(y)
    bw = jnp.asarray(np.array(
        [(b_rt >> (32 * i)) & 0xFFFFFFFF for i in range(4)],
        dtype=np.uint32))
    for i in range(1, key.m_rt):
        ge = ~_lt_const_lanes(y, i * b_rt)
        bucket = bucket + ge.astype(jnp.int32)
        step = jnp.where(ge[..., None], bw, jnp.zeros_like(bw))
        base = jnp.stack(add128(tuple(base[..., j] for j in range(4)),
                                tuple(step[..., j] for j in range(4))),
                         axis=-1)
    nb = jnp.stack(neg128(tuple(base[..., j] for j in range(4))), axis=-1)
    index = jnp.stack(add128(tuple(y[..., j] for j in range(4)),
                             tuple(nb[..., j] for j in range(4))), axis=-1)

    dup = jnp.zeros(bucket.shape, dtype=jnp.bool_)
    for k in range(1, kappa):
        same = jnp.zeros(bucket.shape[:-1], dtype=jnp.bool_)
        for kp in range(k):
            # index is [eta, kappa, 4]: compare the full 4-lane value of
            # entries kp and k (indexing [..., kp] would pick the LANE
            # axis and false-positive whenever two hash functions land
            # the same bucket — caught by the uint64/33-bit golden case).
            same = same | ((bucket[..., kp] == bucket[..., k])
                           & (index[..., kp, :]
                              == index[..., k, :]).all(-1))
        dup = dup.at[..., k].set(same)
    return bucket, index, dup


def batch_eval(prg2, xor_hash, hash64, group, in_bits: int,
               bucket_bits: int, party: int, key: VdmpfKey, xs,
               kappa: int = KAPPA, fold: str = "tree"):
    """Verifiable batch evaluation (vdmpf.cuh:202-270).

    Returns (ys [eta, 4], pi [4, 4]). ``fold``: see module docstring.
    """
    assert fold in ("tree", "reference")
    bucket, index, dup = route(key, in_bits, xs, kappa)
    eta = bucket.shape[0]

    # Gather per-entry inner keys and evaluate all eta*kappa entries at
    # once. The "gather" is a one-hot matmul on the MXU: element gathers
    # are serial on TPU, but selecting rows from the m (~53) bucket keys
    # is an [E, m] x [m, D] contraction — exact in f32 via 16-bit halves.
    bflat = bucket.reshape(-1).astype(jnp.int32)     # [E]
    if index.ndim == 3:  # wide routing: [eta, kappa, 4] packed lanes
        jflat = (index[..., 0].reshape(-1).astype(jnp.uint32)
                 if bucket_bits <= 32
                 else index.reshape(-1, 4).astype(jnp.uint32))
    else:
        jflat = index.reshape(-1).astype(jnp.uint32)
    ys_e, pt_e = _inner_eval(prg2, xor_hash, group, bucket_bits, party,
                             key, bflat, jflat)

    # Output shares: group-fold the kappa contributions per point, masking
    # duplicates (group add is commutative, so fold order is free).
    dupflat = dup.reshape(-1)
    yv = group.from_block(ys_e)
    yv = jnp.where(dupflat[:, None], jnp.zeros_like(yv), yv)
    yv = yv.reshape(eta, kappa, 4)
    acc = yv[:, 0]
    for k in range(1, kappa):
        acc = group.add(acc, yv[:, k])
    ys = group.into_block(acc)

    if fold == "reference":
        pi = _reference_fold(hash64, key.cs, bflat, dupflat, pt_e)
        return ys, pi

    # Proof: Merkle-style tree fold over [bucket check-seeds || corrected
    # per-point hashes], duplicates replaced by the public zero leaf and
    # the leaf list zero-padded to a power of two (see module docstring).
    # Log-depth with every level one batched hash — the flat chain would
    # serialize eta*kappa dependent hashes.
    pt_masked = jnp.where(dupflat[:, None, None],
                          jnp.zeros_like(pt_e), pt_e)
    leaves = jnp.concatenate([key.cs, pt_masked], axis=0)
    total = leaves.shape[0]
    size = 1 << max(1, (total - 1).bit_length())
    leaves = jnp.pad(leaves, ((0, size - total), (0, 0), (0, 0)))
    hash64_b = _batched_hash64(hash64)
    h = hash64_b(leaves)  # [size, 2, 4]
    while h.shape[0] > 1:
        h = hash64_b(h.reshape(h.shape[0] // 2, 4, 4))
    pi = jnp.concatenate([h[0], jnp.zeros((2, 4), dtype=jnp.uint32)],
                         axis=0)
    return ys, pi


def _reference_fold(hash64, cs, bflat, dupflat, pt_e):
    """The reference's chain fold, byte-exact (vdmpf.cuh:242-268).

    Per-bucket accumulators start from the bucket check seeds; flat entry
    order IS the reference's (omega-major, hash-fn-minor) routing order,
    and each step only touches its own bucket's accumulator, so one scan
    over all entries reproduces every per-bucket chain. Then a chain over
    all m buckets (empty ones included) yields pi. H' output is 32B and
    updates only lanes 0-1 of the 64B accumulator, as in Vdpf::Prove.
    """
    def entry_step(pbs, inp):
        b, d, pt = inp
        pb = pbs[b]
        h = hash64(jnp.bitwise_xor(pb, pt))
        pb_new = pb.at[:2].set(jnp.bitwise_xor(pb[:2], h))
        pb_new = jnp.where(d, pb, pb_new)
        return pbs.at[b].set(pb_new), None

    pbs, _ = jax.lax.scan(
        entry_step, jnp.asarray(cs, dtype=jnp.uint32),
        (bflat.astype(jnp.int32), dupflat, pt_e))

    def cross_step(pi, pb):
        h = hash64(jnp.bitwise_xor(pi, pb))
        return pi.at[:2].set(jnp.bitwise_xor(pi[:2], h)), None

    pi, _ = jax.lax.scan(cross_step, jnp.zeros((4, 4), dtype=jnp.uint32),
                         pbs)
    return pi


def _batched_hash64(hash64):
    """Route H' through the fused BLAKE3 kernel on TPU when available."""
    from fss_tpu.hash.blake3 import Blake3

    obj = getattr(hash64, "__self__", None)
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except RuntimeError:
        on_tpu = False
    if on_tpu and isinstance(obj, Blake3):
        from fss_tpu.ops import blake3_pallas as _b3
        iv = tuple(int(w) for w in obj.iv)
        return lambda m: _b3.hash64_batch(m, iv)
    return hash64


def _take_rows_matmul(table, onehot, m):
    """Exact uint32 row select via four 8-bit-plane MXU contractions.

    Byte planes — not 16-bit halves — because TPU matmuls at the default
    precision run a single bf16 MXU pass (8-bit mantissa), which
    silently rounds values >= 2^8 even with preferred_element_type=f32
    (caught on-chip by the verify gate 2026-08-19: VDMPF ys mismatch;
    XLA:CPU computes the same dot in true f32, so interpret mode
    passed). 8-bit values are exact in bf16, one-hot weights are 0/1,
    accumulation is f32 -> exact under any precision setting."""
    d = table.reshape(m, -1)
    out = None
    for shift in (0, 8, 16, 24):
        plane = ((d >> np.uint32(shift)) & np.uint32(0xFF)).astype(
            jnp.float32)
        acc = jnp.dot(onehot, plane, preferred_element_type=jnp.float32)
        term = acc.astype(jnp.uint32) << np.uint32(shift)
        out = term if out is None else out | term
    return out.reshape((onehot.shape[0],) + table.shape[1:])


def _inner_eval(prg2, xor_hash, group, bucket_bits, party, key: VdmpfKey,
                bflat, jflat):
    """Per-entry inner VDPF evals (the hot loop of BatchEval,
    vdmpf.cuh:242-261).

    TPU + ChaCha path: ONE [D_all, m] x [m, E] contraction per 16-bit
    half emits the fused eval kernel's packed SoA layout directly —
    seeds and cw tables land as [word, tile, lane] planes with no [E, D]
    row-major intermediate and no post-hoc bit-transpose (those two
    staging steps cost ~7x the inner evals themselves). cs/ocw ride a
    small row-major select for the finalize.
    """
    from fss_tpu.prg.chacha import ChaCha

    m = key.s0.shape[0]
    E = bflat.shape[0]
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except RuntimeError:
        on_tpu = False
    prg_obj = getattr(prg2, "__self__", prg2)

    if not (on_tpu and isinstance(prg_obj, ChaCha)):
        onehot = (bflat[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :]
                  ).astype(jnp.float32)
        s0_e = _take_rows_matmul(key.s0, onehot, m)
        cws_e = _take_rows_matmul(key.cws, onehot, m)
        cs_e = _take_rows_matmul(key.cs, onehot, m)
        ocw_e = _take_rows_matmul(key.ocw, onehot, m)
        return _vdpf.eval_points(prg2, xor_hash, group, bucket_bits,
                                 party, s0_e, cws_e, cs_e, ocw_e, jflat)

    from fss_tpu.ops import dpf_pallas

    LANES = dpf_pallas.LANES
    block_rows = dpf_pallas.DEFAULT_BLOCK_ROWS
    tile = block_rows * LANES
    Ep = ((E + tile - 1) // tile) * tile
    T = Ep // LANES

    # [m, Ep] one-hot, padding columns all-zero (out-of-range bucket id).
    bpad = jnp.pad(bflat, (0, Ep - E), constant_values=m)
    onehot_T = (jnp.arange(m, dtype=jnp.int32)[:, None] == bpad[None, :]
                ).astype(jnp.float32)

    # Concatenated [m, 4 + bucket_bits*8] seed+cw table, contracted into
    # the packed orientation: packed[d, e] = table[bucket(e), d].
    tbl = jnp.concatenate(
        [key.s0.reshape(m, 4), key.cws.reshape(m, bucket_bits * 8)],
        axis=1)
    # Four 8-bit-plane dots: exact under the TPU's default single-pass
    # bf16 MXU precision (see _take_rows_matmul).
    packed = None                                         # [D, Ep]
    for shift in (0, 8, 16, 24):
        plane = ((tbl >> np.uint32(shift)) & np.uint32(0xFF)).astype(
            jnp.float32).T                                # [D, m]
        acc = jnp.dot(plane, onehot_T,
                      preferred_element_type=jnp.float32)
        term = acc.astype(jnp.uint32) << np.uint32(shift)
        packed = term if packed is None else packed | term

    seeds4 = packed[0:4].reshape(4, T, LANES)
    cws_t = packed[4:].reshape(bucket_bits, 8, T, LANES)
    if jflat.ndim == 2:  # wide bucket domains: [E, 4] packed lanes
        jp = jnp.pad(jflat, ((0, Ep - E), (0, 0)))
        xs2 = jnp.transpose(jp, (1, 0)).reshape(4, T, LANES)
    else:
        xs2 = jnp.pad(jflat, (0, Ep - E)).reshape(T, LANES)

    # Walk + pi~ hash in one fused kernel when the hash is BLAKE3 or
    # SHA-256 (same fusion as vdpf_pallas.eval_points; the hash input
    # lanes are built in-kernel from xs2 = jflat's packed lanes).
    from fss_tpu.ops import sha256_pallas as _shk
    from fss_tpu.ops.eval_all_pallas import _blake3_iv_of
    iv = _blake3_iv_of(xor_hash)
    skey = _shk.sha256_key_of(xor_hash)
    if iv is not None or skey is not None:
        from fss_tpu.ops import vdpf_pallas as _vk
        from fss_tpu.ops.planes import untile_blocks
        kind, const = (("blake3", iv) if iv is not None
                       else ("sha256", skey))
        so, tb, pi_planes = _vk.fused_eval_packed(
            seeds4, cws_t, xs2, in_bits=bucket_bits, party=party,
            nonce=tuple(prg_obj.nonce), hash_kind=kind,
            hash_const=tuple(int(w) for w in const),
            rounds=prg_obj.rounds, block_rows=block_rows)
        pt_pre = untile_blocks(pi_planes, E, 4)
    else:
        so, tb = dpf_pallas.eval_packed(
            seeds4, cws_t, xs2, in_bits=bucket_bits, party=party,
            nonce=tuple(prg_obj.nonce), rounds=prg_obj.rounds,
            block_rows=block_rows)
        pt_pre = None
    s = jnp.transpose(so.reshape(4, -1), (1, 0))[:E]
    t = tb.reshape(-1)[:E]

    # cs/ocw for the finalize: small row-major select ([E, 20] output).
    onehot = (bflat[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :]
              ).astype(jnp.float32)
    co = _take_rows_matmul(
        jnp.concatenate([key.cs.reshape(m, 16), key.ocw], axis=1),
        onehot, m)
    cs_e = co[:, :16].reshape(E, 4, 4)
    ocw_e = co[:, 16:20]

    y = group.from_block(s)
    y = jnp.where(t.astype(jnp.bool_)[:, None],
                  group.add(y, group.from_block(ocw_e)), y)
    if party:
        y = group.neg(y)

    if pt_pre is not None:
        pt = pt_pre
    else:
        x_lanes = blk.pack_inputs(jflat, bucket_bits)
        pt = xor_hash(x_lanes, s)
    pt = jnp.where(t.astype(jnp.bool_)[:, None, None],
                   jnp.bitwise_xor(pt, cs_e), pt)
    return group.into_block(y), pt


def verify(pi0: jax.Array, pi1: jax.Array) -> jax.Array:
    return _vdpf.verify(pi0, pi1)
