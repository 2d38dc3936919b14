"""Verifiable FSS end to end: VDPF single-point and VDMPF multi-point.

Shows the full malicious-security workflow the reference exposes through
include/fss/vdpf.cuh and include/fss/vdmpf.cuh: dealer key generation
with the retry contract, per-party evaluation that returns proof
material alongside the shares, proof folding, cross-party verification,
and how verification catches a tampered evaluation. 10-bit domain,
ChaCha PRG + BLAKE3 hashes (the GPU-parity configuration).

Run: python samples/vdpf_vdmpf_verified.py
"""

import numpy as np

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.api import Vdmpf, Vdpf

IN_BITS = 10
N = 1 << IN_BITS


def vdpf_sample(rng):
    g = groups.Uint(32)
    vdpf = Vdpf(IN_BITS, group=g)
    alpha, beta = 345, blk.block([604, 0, 0, 0])

    # Dealer: gen can fail (vdpf.cuh:97); resample seeds until it
    # doesn't. Both keys ship (cws, cs, ocw); s0 stays per party.
    s0s, cws, cs, ocw = vdpf.gen_retry(rng, alpha, beta)

    # Parties: eval returns (share, pi-tilde) per point; the proof folds
    # all queried points into one 32-byte pi (vdpf.cuh:256-262).
    xs = rng.integers(0, N, size=64, dtype=np.uint32)
    xs[7] = alpha  # make sure the special point is queried
    y0, pt0 = vdpf.eval(0, s0s[0], cws, cs, ocw, xs)
    y1, pt1 = vdpf.eval(1, s0s[1], cws, cs, ocw, xs)
    pi0 = vdpf.prove(pt0, cs)
    pi1 = vdpf.prove(pt1, cs)

    # Verifier: equal proofs == every queried point evaluated honestly.
    assert Vdpf.verify(pi0, pi1), "honest proofs must match"
    rec = np.asarray(g.add(y0, y1))
    exp = np.where(xs == alpha, 604, 0)
    assert np.array_equal(rec[:, 0], exp)
    print(f"VDPF: 64 points evaluated, f({alpha}) = 604, proofs match. OK")

    # A tampered evaluation (flip one bit of one pi-tilde) must not
    # verify.
    pt0_bad = np.asarray(pt0).copy()
    pt0_bad[3, 0, 0] ^= 1
    assert not Vdpf.verify(vdpf.prove(pt0_bad, cs), pi1)
    print("VDPF: tampered evaluation rejected by Verify. OK")


def vdmpf_sample(rng):
    g = groups.Uint(32)
    vm = Vdmpf(IN_BITS, max_points=30, group=g)

    # t = 30 distinct special points with per-point payloads.
    alphas = rng.choice(N, size=30, replace=False).astype(np.uint64)
    betas = blk.block(np.stack([
        np.arange(1, 31, dtype=np.uint32),
        np.zeros(30, np.uint32),
        np.zeros(30, np.uint32),
        np.zeros(30, np.uint32)], axis=1))
    k0, k1 = vm.gen_retry(rng, alphas, betas)

    xs = rng.integers(0, N, size=256, dtype=np.uint64)
    xs[:30] = alphas  # query every special point once
    y0, pi0 = vm.batch_eval(0, k0, xs)
    y1, pi1 = vm.batch_eval(1, k1, xs)

    assert Vdmpf.verify(pi0, pi1), "honest proofs must match"
    rec = np.asarray(g.add(y0, y1))
    lut = {int(a): int(b) for a, b in zip(alphas, betas[:, 0])}
    exp = np.array([lut.get(int(x), 0) for x in xs], dtype=np.uint32)
    assert np.array_equal(rec[:, 0], exp)
    print("VDMPF: 30-point function, 256 queries reconstruct, "
          "proofs match. OK")


def main():
    rng = np.random.default_rng(2026)
    vdpf_sample(rng)
    vdmpf_sample(rng)


if __name__ == "__main__":
    main()
