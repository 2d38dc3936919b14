"""DPF property tests, mirroring reference src/dpf_test.cu.

EvalAtAlpha / EvalAtNonAlpha / EvalAll correctness against the functional
spec (not golden vectors), over Group x PRG sweeps.
"""

import numpy as np
import pytest

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.api import Dpf
from fss_tpu.prg.chacha import ChaCha

NONCE = (0xDEADBEEF, 0xCAFEBABE)

GROUPS = [
    ("bytes", groups.Bytes()),
    ("uint64", groups.Uint(64)),
    ("uint127", groups.Uint(128, mod=1 << 127)),
]


def _reconstruct(g, y0, y1):
    return np.asarray(g.add(g.from_block(y0), g.from_block(y1)))


def _setup(g, rng, in_bits, alpha):
    d = Dpf(in_bits, group=g, prg=ChaCha(mul=2, nonce=NONCE))
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    beta = blk.block(rng.integers(0, 2**32, size=(4,)))
    cws = d.gen(s0s, alpha, beta)
    assert cws.shape == (in_bits + 1, 8)
    return d, s0s, beta, cws


@pytest.mark.parametrize("gname,g", GROUPS, ids=[n for n, _ in GROUPS])
def test_eval_at_alpha(gname, g, rng):
    in_bits = 16
    alpha = int(rng.integers(0, 2**in_bits))
    d, s0s, beta, cws = _setup(g, rng, in_bits, alpha)

    y0 = d.eval(0, s0s[0], cws, np.uint32([alpha]))
    y1 = d.eval(1, s0s[1], cws, np.uint32([alpha]))
    expected = np.asarray(g.from_block(blk.clear_lsb(beta)))
    assert np.array_equal(_reconstruct(g, y0, y1)[0], expected)


@pytest.mark.parametrize("gname,g", GROUPS, ids=[n for n, _ in GROUPS])
def test_eval_at_non_alpha_batch(gname, g, rng):
    in_bits = 16
    alpha = int(rng.integers(0, 2**in_bits))
    d, s0s, beta, cws = _setup(g, rng, in_bits, alpha)

    xs = rng.integers(0, 2**in_bits, size=100, dtype=np.uint32)
    xs = np.where(xs == alpha, (xs + 1) % (2**in_bits), xs).astype(np.uint32)
    y0 = d.eval(0, s0s[0], cws, xs)
    y1 = d.eval(1, s0s[1], cws, xs)
    rec = _reconstruct(g, y0, y1)
    assert np.all(rec == 0), f"nonzero at {np.nonzero(rec.sum(-1))}"


@pytest.mark.parametrize("gname,g", GROUPS, ids=[n for n, _ in GROUPS])
def test_eval_all(gname, g, rng):
    in_bits = 10
    alpha = int(rng.integers(0, 2**in_bits))
    d, s0s, beta, cws = _setup(g, rng, in_bits, alpha)

    ys0 = np.asarray(d.eval_all(0, s0s[0], cws))
    ys1 = np.asarray(d.eval_all(1, s0s[1], cws))
    assert ys0.shape == (2**in_bits, 4)
    rec = _reconstruct(g, ys0, ys1)
    expected = np.asarray(g.from_block(blk.clear_lsb(blk.block(beta))))
    nz = np.nonzero(rec.any(axis=-1))[0]
    assert list(nz) == [alpha]
    assert np.array_equal(rec[alpha], expected)


def test_eval_all_matches_eval_points(rng):
    g = groups.Uint(64)
    in_bits = 8
    d, s0s, beta, cws = _setup(g, rng, in_bits, 42)
    all0 = np.asarray(d.eval_all(0, s0s[0], cws))
    xs = np.arange(2**in_bits, dtype=np.uint32)
    pts0 = np.asarray(d.eval(0, s0s[0], cws, xs))
    assert np.array_equal(all0, pts0)


def test_batched_keys(rng):
    """Per-instance keys (the GPU-bench shape: one key per batch element)."""
    g = groups.Bytes()
    in_bits = 8
    d = Dpf(in_bits, group=g, prg=ChaCha(mul=2, nonce=NONCE))
    B = 16
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))

    cws = d.gen_batch(s0s, alphas, betas)
    assert cws.shape == (B, in_bits + 1, 8)

    y0 = d.eval(0, s0s[:, 0], cws, alphas)
    y1 = d.eval(1, s0s[:, 1], cws, alphas)
    rec = _reconstruct(g, y0, y1)
    exp = np.asarray(blk.clear_lsb(betas))
    assert np.array_equal(rec, exp)


def test_in_bits_edge_cases(rng):
    g = groups.Bytes()
    for in_bits in (1, 2, 33):
        d = Dpf(in_bits, group=g, prg=ChaCha(mul=2, nonce=NONCE))
        alpha = int(rng.integers(0, 2**min(in_bits, 31)))
        s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
        beta = blk.block(rng.integers(0, 2**32, size=(4,)))
        cws = d.gen(s0s, alpha, beta)
        y0 = d.eval(0, s0s[0], cws, alpha)
        y1 = d.eval(1, s0s[1], cws, alpha)
        rec = _reconstruct(g, y0, y1)
        assert np.array_equal(rec, np.asarray(blk.clear_lsb(beta)))
        x_other = alpha ^ 1
        y0 = d.eval(0, s0s[0], cws, x_other)
        y1 = d.eval(1, s0s[1], cws, x_other)
        assert np.all(_reconstruct(g, y0, y1) == 0)
