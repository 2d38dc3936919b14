"""Half-Tree DPF property tests, mirroring reference
src/half_tree_dpf_test.cu: EvalAtAlpha / EvalAtNonAlpha / EvalAll plus the
in_bits=1 edge fixture (last-level-only path)."""

import numpy as np
import pytest

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.api import HalfTreeDpf
from fss_tpu.prg.chacha import ChaCha

NONCE = (0x1357FDB9, 0x2468ACE0)

GROUPS = [
    ("bytes", groups.Bytes()),
    ("uint64", groups.Uint(64)),
    ("uint127", groups.Uint(128, mod=1 << 127)),
]


def _reconstruct(g, y0, y1):
    return np.asarray(g.add(g.from_block(y0), g.from_block(y1)))


def _setup(g, rng, in_bits, alpha):
    d = HalfTreeDpf(in_bits, group=g, prg=ChaCha(mul=1, nonce=NONCE),
                    hash_key=rng.integers(0, 2**32, size=4, dtype=np.uint32))
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    beta = blk.block(rng.integers(0, 2**32, size=(4,)))
    cws, ocw = d.gen(s0s, alpha, beta)
    assert cws.shape == (in_bits, 8)
    assert ocw.shape == (4,)
    return d, s0s, beta, cws, ocw


@pytest.mark.parametrize("gname,g", GROUPS, ids=[n for n, _ in GROUPS])
def test_eval_at_alpha(gname, g, rng):
    in_bits = 16
    alpha = int(rng.integers(0, 2**in_bits))
    d, s0s, beta, cws, ocw = _setup(g, rng, in_bits, alpha)
    y0 = d.eval(0, s0s[0], cws, ocw, np.uint32([alpha]))
    y1 = d.eval(1, s0s[1], cws, ocw, np.uint32([alpha]))
    expected = np.asarray(g.from_block(blk.clear_lsb(beta)))
    assert np.array_equal(_reconstruct(g, y0, y1)[0], expected)


@pytest.mark.parametrize("gname,g", GROUPS, ids=[n for n, _ in GROUPS])
def test_eval_at_non_alpha_batch(gname, g, rng):
    in_bits = 16
    alpha = int(rng.integers(0, 2**in_bits))
    d, s0s, beta, cws, ocw = _setup(g, rng, in_bits, alpha)
    xs = rng.integers(0, 2**in_bits, size=100, dtype=np.uint32)
    xs = np.where(xs == alpha, (xs + 1) % (2**in_bits), xs).astype(np.uint32)
    y0 = d.eval(0, s0s[0], cws, ocw, xs)
    y1 = d.eval(1, s0s[1], cws, ocw, xs)
    rec = _reconstruct(g, y0, y1)
    assert np.all(rec == 0), f"nonzero at {np.nonzero(rec.sum(-1))}"


@pytest.mark.parametrize("gname,g", GROUPS, ids=[n for n, _ in GROUPS])
def test_eval_all(gname, g, rng):
    in_bits = 10
    alpha = int(rng.integers(0, 2**in_bits))
    d, s0s, beta, cws, ocw = _setup(g, rng, in_bits, alpha)
    ys0 = np.asarray(d.eval_all(0, s0s[0], cws, ocw))
    ys1 = np.asarray(d.eval_all(1, s0s[1], cws, ocw))
    assert ys0.shape == (2**in_bits, 4)
    rec = _reconstruct(g, ys0, ys1)
    expected = np.asarray(g.from_block(blk.clear_lsb(beta)))
    nz = np.nonzero(rec.any(axis=-1))[0]
    assert list(nz) == [alpha]
    assert np.array_equal(rec[alpha], expected)


def test_eval_all_matches_eval_points(rng):
    g = groups.Uint(64)
    in_bits = 8
    d, s0s, beta, cws, ocw = _setup(g, rng, in_bits, 42)
    all0 = np.asarray(d.eval_all(0, s0s[0], cws, ocw))
    xs = np.arange(2**in_bits, dtype=np.uint32)
    pts0 = np.asarray(d.eval(0, s0s[0], cws, ocw, xs))
    assert np.array_equal(all0, pts0)


def test_in_bits_1_edge(rng):
    """Last-level-only path (reference half_tree_dpf_test.cu:380-451)."""
    g = groups.Bytes()
    for alpha in (0, 1):
        d, s0s, beta, cws, ocw = _setup(g, rng, 1, alpha)
        y0a = d.eval(0, s0s[0], cws, ocw, alpha)
        y1a = d.eval(1, s0s[1], cws, ocw, alpha)
        assert np.array_equal(_reconstruct(g, y0a, y1a),
                              np.asarray(blk.clear_lsb(beta)))
        y0n = d.eval(0, s0s[0], cws, ocw, alpha ^ 1)
        y1n = d.eval(1, s0s[1], cws, ocw, alpha ^ 1)
        assert np.all(_reconstruct(g, y0n, y1n) == 0)
        # eval_all covers both leaves at once
        a0 = np.asarray(d.eval_all(0, s0s[0], cws, ocw))
        a1 = np.asarray(d.eval_all(1, s0s[1], cws, ocw))
        rec = _reconstruct(g, a0, a1)
        assert list(np.nonzero(rec.any(axis=-1))[0]) == [alpha]


def test_batched_keys(rng):
    g = groups.Uint(32)
    in_bits = 8
    d = HalfTreeDpf(in_bits, group=g, prg=ChaCha(mul=1, nonce=NONCE),
                    hash_key=rng.integers(0, 2**32, size=4, dtype=np.uint32))
    B = 16
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    cws, ocws = d.gen_batch(s0s, alphas, betas)
    assert cws.shape == (B, in_bits, 8)
    assert ocws.shape == (B, 4)
    y0 = d.eval(0, s0s[:, 0], cws, ocws, alphas)
    y1 = d.eval(1, s0s[:, 1], cws, ocws, alphas)
    rec = _reconstruct(g, y0, y1)
    exp = np.asarray(g.from_block(blk.clear_lsb(betas)))
    assert np.array_equal(rec, exp)
