"""VDMPF tests, mirroring reference src/vdmpf_test.cu: t=30 points in a
16-bit domain with bucket_bits=14; BatchEval at alphas / non-alphas /
Verify; standalone Cuckoo Compact test; PRP permutation property."""

import numpy as np
import pytest

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.api import Vdmpf
from fss_tpu.prg.chacha import ChaCha
from fss_tpu.prp.feistel import Aes128Feistel
from fss_tpu.schemes import cuckoo

IN_BITS = 16
T = 30


def test_prp_is_permutation_and_matches_host(rng):
    domain = 1000
    prp = Aes128Feistel(bytes(rng.integers(0, 256, size=16, dtype=np.uint8)),
                        domain)
    xs = np.arange(domain, dtype=np.uint32)
    _, ys = prp.permu(xs)
    ys = np.asarray(ys)
    assert sorted(ys.tolist()) == list(range(domain)), "not a permutation"
    for x in rng.integers(0, domain, size=10):
        assert prp.permu_host(int(x)) == int(ys[int(x)])


def test_wide_route_matches_host_locate(rng):
    """route() on the wide (in_bits > 29) path == the scalar Locate
    oracle: bucket = y // b, index = y % b, dup only on EXACT
    (bucket, index) repeats. Regression for the lane-axis dedup bug
    (two hash functions sharing a bucket falsely flagged dup)."""
    from fss_tpu.schemes import vdmpf as vm

    in_bits, kappa = 33, 3
    n = 1 << in_bits
    sigma = bytes(rng.integers(0, 256, size=16, dtype=np.uint8))
    prp = Aes128Feistel(sigma, n * kappa)
    m_rt = 53
    b_rt = (n * kappa + m_rt - 1) // m_rt
    key = vm.VdmpfKey(sigma, m_rt, b_rt,
                      np.zeros((m_rt, 4), np.uint32),
                      np.zeros((m_rt, 30, 8), np.uint32),
                      np.zeros((m_rt, 4, 4), np.uint32),
                      np.zeros((m_rt, 4), np.uint32))
    xs = [int(v) for v in rng.choice(n, size=64, replace=False)]
    bucket, index, dup = vm.route(key, in_bits, xs, kappa)
    bucket, dup = np.asarray(bucket), np.asarray(dup)
    idx = np.asarray(index)
    same_bucket_diff_idx = 0
    for e, x in enumerate(xs):
        seen = set()
        for k in range(kappa):
            y = prp.permu_host(x + n * k)
            want_b, want_j = y // b_rt, y % b_rt
            got_j = sum(int(idx[e, k, i]) << (32 * i) for i in range(4))
            assert bucket[e, k] == want_b, (e, k)
            assert got_j == want_j, (e, k)
            assert bool(dup[e, k]) == ((want_b, want_j) in seen), (e, k)
            if any(b == want_b for b, j in seen if j != want_j):
                same_bucket_diff_idx += 1
            seen.add((want_b, want_j))
    # The regression scenario must actually occur in this sample.
    assert same_bucket_diff_idx > 0, "sample never hit a shared bucket"


def test_cuckoo_compact(rng):
    """Standalone Compact placement (vdmpf_test.cu:190-218)."""
    n = 1 << IN_BITS
    kappa = 3
    m = cuckoo.ch_bucket(T, 80)
    b_size = (n * kappa + m - 1) // m
    alphas = sorted(rng.choice(n, size=T, replace=False).tolist())
    prp = Aes128Feistel(bytes(rng.integers(0, 256, size=16, dtype=np.uint8)),
                        n * kappa)
    table = cuckoo.compact_run(prp, alphas, m, n, b_size)
    assert table is not None
    placed = [(j, k) for j, k in table if j != -1]
    assert sorted(j for j, _ in placed) == list(range(T))
    for bucket, (j, k) in enumerate(table):
        if j == -1:
            continue
        got_bucket, _ = cuckoo.locate_host(prp, alphas[j], k, n, b_size)
        assert got_bucket % m == bucket


@pytest.fixture(scope="module")
def vdmpf_setup():
    rng = np.random.default_rng(0xD00D)
    d = Vdmpf(IN_BITS, max_points=T, bucket_bits=14, group=groups.Bytes(),
              prg=ChaCha(mul=2, nonce=(11, 22)))
    n = 1 << IN_BITS
    alphas = sorted(rng.choice(n, size=T, replace=False).tolist())
    betas = blk.block(rng.integers(1, 2**32, size=(T, 4)))
    k0, k1 = d.gen_retry(rng, alphas, betas)
    return rng, d, alphas, betas, k0, k1


def test_batch_eval_at_alphas(vdmpf_setup):
    rng, d, alphas, betas, k0, k1 = vdmpf_setup
    xs = np.array(alphas, dtype=np.uint32)
    y0, pi0 = d.batch_eval(0, k0, xs)
    y1, pi1 = d.batch_eval(1, k1, xs)
    rec = np.asarray(y0) ^ np.asarray(y1)
    exp = np.asarray(blk.clear_lsb(betas))
    assert np.array_equal(rec, exp)
    assert d.verify(pi0, pi1)


def test_batch_eval_at_non_alphas(vdmpf_setup):
    rng, d, alphas, betas, k0, k1 = vdmpf_setup
    n = 1 << IN_BITS
    aset = set(alphas)
    xs = np.array([x for x in rng.choice(n, size=60, replace=False)
                   if int(x) not in aset][:30], dtype=np.uint32)
    y0, pi0 = d.batch_eval(0, k0, xs)
    y1, pi1 = d.batch_eval(1, k1, xs)
    rec = np.asarray(y0) ^ np.asarray(y1)
    assert np.all(rec == 0)
    assert d.verify(pi0, pi1)


def test_batch_eval_mixed_and_tamper(vdmpf_setup):
    rng, d, alphas, betas, k0, k1 = vdmpf_setup
    xs = np.array(alphas[:5] + [alphas[0] ^ 1, alphas[1] ^ 3],
                  dtype=np.uint32)
    y0, pi0 = d.batch_eval(0, k0, xs)
    y1, pi1 = d.batch_eval(1, k1, xs)
    rec = np.asarray(y0) ^ np.asarray(y1)
    exp = np.asarray(blk.clear_lsb(betas))[:5]
    assert np.array_equal(rec[:5], exp)
    assert np.all(rec[5:] == 0)
    assert d.verify(pi0, pi1)
    # Tampered key (flip one check-seed bit) must break verification.
    k1_bad = k1._replace(cs=np.asarray(k1.cs).copy())
    k1_bad.cs[3, 2, 0] ^= 1
    _, pi1_bad = d.batch_eval(1, k1_bad, xs)
    assert not d.verify(pi0, pi1_bad)
