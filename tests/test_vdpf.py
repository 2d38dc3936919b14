"""VDPF property tests, mirroring reference src/vdpf_test.cu: Gen-retry,
EvalAtAlpha / EvalAtNonAlpha, VerifyEval over random points, EvalAll +
Verify. Plus BLAKE3 bit-exactness vs a NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.api import Vdpf
from fss_tpu.hash.blake3 import Blake3, compress_reference
from fss_tpu.prg.chacha import ChaCha

NONCE = (0x12345678, 0x9ABCDEF0)

GROUPS = [
    ("bytes", groups.Bytes()),
    ("uint127", groups.Uint(128, mod=1 << 127)),
]


def _reconstruct(g, y0, y1):
    return np.asarray(g.add(g.from_block(y0), g.from_block(y1)))


def _setup(g, rng, in_bits, alpha):
    d = Vdpf(in_bits, group=g, prg=ChaCha(mul=2, nonce=NONCE))
    beta = blk.block(rng.integers(0, 2**32, size=(4,)))
    s0s, cws, cs, ocw = d.gen_retry(rng, alpha, beta)
    assert cws.shape == (in_bits, 8)
    assert cs.shape == (4, 4)
    return d, s0s, beta, cws, cs, ocw


def test_blake3_vs_oracle(rng):
    iv = tuple(int(v) for v in rng.integers(0, 2**32, size=8))
    h = Blake3(iv)
    msg = rng.integers(0, 2**32, size=(5, 4, 4), dtype=np.uint32)
    out = np.asarray(h.hash64(msg))
    for i in range(5):
        ref = compress_reference(iv, msg[i].reshape(16), 64)
        assert np.array_equal(out[i].reshape(8), ref[:8]), f"row {i}"

    a = rng.integers(0, 2**32, size=(3, 4), dtype=np.uint32)
    b = rng.integers(0, 2**32, size=(3, 4), dtype=np.uint32)
    xh = np.asarray(h.xor_hash(a, b))
    assert xh.shape == (3, 4, 4)
    for i in range(3):
        a0 = a[i].copy()
        a0[3] &= 0xFFFFFFFE
        m = np.concatenate([a0, b[i], np.zeros(8, np.uint32)])
        r0 = compress_reference(iv, m, 32)
        a1 = a[i].copy()
        a1[3] |= 1
        m1 = np.concatenate([a1, b[i], np.zeros(8, np.uint32)])
        r1 = compress_reference(iv, m1, 32)
        assert np.array_equal(xh[i].reshape(16),
                              np.concatenate([r0[:8], r1[:8]]))


@pytest.mark.parametrize("gname,g", GROUPS, ids=[n for n, _ in GROUPS])
def test_eval_at_alpha_and_non_alpha(gname, g, rng):
    in_bits = 16
    alpha = 107
    d, s0s, beta, cws, cs, ocw = _setup(g, rng, in_bits, alpha)

    y0, _ = d.eval(0, s0s[0], cws, cs, ocw, np.uint32([alpha]))
    y1, _ = d.eval(1, s0s[1], cws, cs, ocw, np.uint32([alpha]))
    expected = np.asarray(g.from_block(blk.clear_lsb(beta)))
    assert np.array_equal(_reconstruct(g, y0, y1)[0], expected)

    xs = rng.integers(0, 2**in_bits, size=50, dtype=np.uint32)
    xs = np.where(xs == alpha, (xs + 1) % (2**in_bits), xs).astype(np.uint32)
    y0, _ = d.eval(0, s0s[0], cws, cs, ocw, xs)
    y1, _ = d.eval(1, s0s[1], cws, cs, ocw, xs)
    assert np.all(_reconstruct(g, y0, y1) == 0)


def test_verify_eval_random_points(rng):
    """Both parties' proofs agree over 50 random points
    (vdpf_test.cu:114-139)."""
    g = groups.Bytes()
    in_bits = 16
    alpha = 107
    d, s0s, beta, cws, cs, ocw = _setup(g, rng, in_bits, alpha)
    xs = rng.integers(0, 2**in_bits, size=50, dtype=np.uint32)
    _, pt0 = d.eval(0, s0s[0], cws, cs, ocw, xs)
    _, pt1 = d.eval(1, s0s[1], cws, cs, ocw, xs)
    pi0 = d.prove(pt0, cs)
    pi1 = d.prove(pt1, cs)
    assert d.verify(pi0, pi1)
    # A tampered pi_tilde must break verification.
    pt0_bad = np.asarray(pt0).copy()
    pt0_bad[3, 0, 0] ^= 1
    pi0_bad = d.prove(pt0_bad, cs)
    assert not d.verify(pi0_bad, pi1)


def test_eval_all_and_verify(rng):
    g = groups.Bytes()
    in_bits = 10
    alpha = 107
    d, s0s, beta, cws, cs, ocw = _setup(g, rng, in_bits, alpha)
    ys0, pi0 = d.eval_all(0, s0s[0], cws, cs, ocw)
    ys1, pi1 = d.eval_all(1, s0s[1], cws, cs, ocw)
    assert ys0.shape == (2**in_bits, 4)
    rec = _reconstruct(g, np.asarray(ys0), np.asarray(ys1))
    nz = np.nonzero(rec.any(axis=-1))[0]
    assert list(nz) == [alpha]
    expected = np.asarray(g.from_block(blk.clear_lsb(beta)))
    assert np.array_equal(rec[alpha], expected)
    assert d.verify(pi0, pi1)


def test_eval_all_matches_eval_points(rng):
    g = groups.Bytes()
    in_bits = 8
    d, s0s, beta, cws, cs, ocw = _setup(g, rng, in_bits, 42)
    ys_all, pi_all = d.eval_all(0, s0s[0], cws, cs, ocw)
    xs = np.arange(2**in_bits, dtype=np.uint32)
    ys_pts, pts = d.eval(0, s0s[0], cws, cs, ocw, xs)
    assert np.array_equal(np.asarray(ys_all), np.asarray(ys_pts))
    assert np.array_equal(np.asarray(pi_all),
                          np.asarray(d.prove(pts, cs)))


def test_gen_fail_flag_shape(rng):
    """fail is a well-defined uint32 so batched gen can mask retries."""
    d = Vdpf(8, group=groups.Bytes(), prg=ChaCha(mul=2, nonce=NONCE))
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    beta = blk.block(rng.integers(0, 2**32, size=(4,)))
    cws, cs, ocw, fail = d.gen(s0s, 3, beta)
    assert int(fail) in (0, 1)


def test_eval_all_chunked_fold(rng):
    """Chunked-fold eval_all: same shares as the reference fold, proofs
    agree between parties, tamper detection still works."""
    g = groups.Bytes()
    in_bits = 10
    alpha = 321
    d, s0s, beta, cws, cs, ocw = _setup(g, rng, in_bits, alpha)
    ys0, pi0 = d.eval_all(0, s0s[0], cws, cs, ocw, fold="chunked")
    ys1, pi1 = d.eval_all(1, s0s[1], cws, cs, ocw, fold="chunked")
    ys_ref, pi_ref = d.eval_all(0, s0s[0], cws, cs, ocw)
    assert np.array_equal(np.asarray(ys0), np.asarray(ys_ref))
    assert d.verify(pi0, pi1)
    # Different fold structure than the reference chain (documented).
    assert not np.array_equal(np.asarray(pi0), np.asarray(pi_ref))
    rec = np.asarray(ys0) ^ np.asarray(ys1)
    assert list(np.nonzero(rec.any(-1))[0]) == [alpha]


def test_eval_all_tree_fold(rng):
    g = groups.Bytes()
    in_bits = 10
    alpha = 555
    d, s0s, beta, cws, cs, ocw = _setup(g, rng, in_bits, alpha)
    ys0, pi0 = d.eval_all(0, s0s[0], cws, cs, ocw, fold="tree")
    ys1, pi1 = d.eval_all(1, s0s[1], cws, cs, ocw, fold="tree")
    assert d.verify(pi0, pi1)
    rec = np.asarray(ys0) ^ np.asarray(ys1)
    assert list(np.nonzero(rec.any(-1))[0]) == [alpha]
    # Tampered share stream changes the tree root.
    ys_ref, _ = d.eval_all(0, s0s[0], cws, cs, ocw)
    assert np.array_equal(np.asarray(ys0), np.asarray(ys_ref))


def test_gen_batch_masked_retry(rng):
    """Batched gen retries failed lanes only; every key must verify."""
    g = groups.Bytes()
    in_bits = 8
    B = 64
    d = Vdpf(in_bits, group=g, prg=ChaCha(mul=2, nonce=NONCE))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    s0s, cws, cs, ocw = d.gen_batch(rng, alphas, betas)
    assert cws.shape == (B, in_bits, 8)
    # Per-instance verification: reconstruct at alpha, proofs agree.
    y0, p0 = d.eval(0, s0s[:, 0], cws, cs, ocw, alphas)
    y1, p1 = d.eval(1, s0s[:, 1], cws, cs, ocw, alphas)
    rec = np.asarray(y0) ^ np.asarray(y1)
    assert np.array_equal(rec, np.asarray(blk.clear_lsb(betas)))
    assert np.array_equal(np.asarray(p0), np.asarray(p1) ^ 0)  # shapes
    # fail flags all cleared: re-run gen on returned seeds reproduces keys
    cws2, cs2, ocw2, fail2 = jax.vmap(
        lambda s, a, b: __import__("fss_tpu.schemes.vdpf",
                                   fromlist=["gen"]).gen(
            d.prg, d.xor_hash, d.group, in_bits, s, a, b))(
        s0s, blk.pack_inputs(alphas, in_bits), jnp.asarray(betas))
    assert not np.any(np.asarray(fail2))
    assert np.array_equal(np.asarray(cws2), np.asarray(cws))
