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

Proof-fold note: the reference folds per-bucket chains then a cross-bucket
chain (vdmpf.cuh:242-268), an order tied to its sequential routing. This
implementation uses the framework's documented fold: one chain over the m
bucket check-seeds in bucket order, then one chain over the eta*kappa
corrected per-point hashes in flat (omega-major, hash-fn-minor) order with
duplicate entries skipped. Both parties compute the identical order from
public data (sigma, xs), which is what Verify requires; proofs are NOT
byte-compatible with the reference's accumulation order.
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
    a_prime = np.zeros(m, dtype=np.uint32)
    b_prime = np.zeros((m, 4), dtype=np.uint32)
    betas_np = np.asarray(betas, dtype=np.uint32)
    for i in range(m_rt):
        j, k = table[i]
        if j == -1:
            continue
        _, index = cuckoo.locate_host(prp, int(alphas[j]), k, n, b_rt, kappa)
        a_prime[i] = index
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
    """Batched Locate: xs [eta] -> (bucket [eta, kappa], index [eta, kappa],
    dup [eta, kappa]) where dup marks repeated (bucket, index) pairs per
    point (the dedup of vdmpf.cuh:221-231).

    Device path supports in_bits <= 29 (PRP values fit uint32).
    """
    n = 1 << in_bits
    assert in_bits <= 29, "device routing path supports in_bits <= 29"
    xs = jnp.asarray(xs, dtype=jnp.uint32)
    prp = Aes128Feistel(key.sigma, n * kappa)
    vals = jnp.stack([xs + np.uint32(n * k) for k in range(kappa)],
                     axis=-1)  # [eta, kappa]
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


def batch_eval(prg2, xor_hash, hash64, group, in_bits: int,
               bucket_bits: int, party: int, key: VdmpfKey, xs,
               kappa: int = KAPPA):
    """Verifiable batch evaluation (vdmpf.cuh:202-270).

    Returns (ys [eta, 4], pi [4, 4]).
    """
    bucket, index, dup = route(key, in_bits, xs, kappa)
    eta = bucket.shape[0]

    # Gather per-entry inner keys and evaluate all eta*kappa entries at once.
    bflat = bucket.reshape(-1).astype(jnp.int32)     # [E]
    jflat = index.reshape(-1).astype(jnp.uint32)     # [E]
    s0_e = key.s0[bflat]
    cws_e = key.cws[bflat]
    cs_e = key.cs[bflat]
    ocw_e = key.ocw[bflat]
    ys_e, pt_e = _vdpf.eval_points(prg2, xor_hash, group, bucket_bits,
                                   party, s0_e, cws_e, cs_e, ocw_e, jflat)

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

    # Proof: chain over bucket check-seeds, then over per-point hashes in
    # flat order, skipping duplicates (see module docstring).
    def cs_step(pi, cs_i):
        h = hash64(jnp.bitwise_xor(pi, cs_i))
        return pi.at[0:2].set(jnp.bitwise_xor(pi[0:2], h)), None

    pi0 = jnp.zeros((4, 4), dtype=jnp.uint32)
    pi, _ = jax.lax.scan(cs_step, pi0, key.cs)

    def pt_step(pi, inp):
        pt, is_dup = inp
        h = hash64(jnp.bitwise_xor(pi, pt))
        pi_new = pi.at[0:2].set(jnp.bitwise_xor(pi[0:2], h))
        return jnp.where(is_dup, pi, pi_new), None

    pi, _ = jax.lax.scan(pt_step, pi, (pt_e, dupflat))
    return ys, pi


def verify(pi0: jax.Array, pi1: jax.Array) -> jax.Array:
    return _vdpf.verify(pi0, pi1)
