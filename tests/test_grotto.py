"""Grotto DCF tests, mirroring reference src/grotto_dcf_test.cu.

share_0 XOR share_1 = 1[alpha <= x]; Preprocess+Eval vs EvalAll
cross-check; alpha = 0 and alpha = N-1 edges.
"""

import numpy as np

from fss_tpu import block as blk
from fss_tpu.api import GrottoDcf
from fss_tpu.prg.chacha import ChaCha

NONCE = (0x33333333, 0x44444444)


def _setup(rng, in_bits, alpha):
    gd = GrottoDcf(in_bits, prg=ChaCha(mul=2, nonce=NONCE))
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    cws = gd.gen(s0s, alpha)
    return gd, s0s, cws


def test_eval_all_semantics(rng):
    in_bits = 9
    n = 2**in_bits
    alpha = int(rng.integers(0, n))
    gd, s0s, cws = _setup(rng, in_bits, alpha)

    ys0 = np.asarray(gd.eval_all(0, s0s[0], cws))
    ys1 = np.asarray(gd.eval_all(1, s0s[1], cws))
    rec = ys0 ^ ys1
    exp = (np.arange(n) >= alpha).astype(np.uint32)
    assert np.array_equal(rec, exp)


def test_preprocess_eval_matches_eval_all(rng):
    in_bits = 8
    n = 2**in_bits
    alpha = int(rng.integers(0, n))
    gd, s0s, cws = _setup(rng, in_bits, alpha)

    all0 = np.asarray(gd.eval_all(0, s0s[0], cws))
    all1 = np.asarray(gd.eval_all(1, s0s[1], cws))

    pt0 = gd.preprocess(0, s0s[0], cws)
    pt1 = gd.preprocess(1, s0s[1], cws)
    xs = np.arange(n, dtype=np.uint32)
    q0 = np.asarray(gd.eval(pt0, xs))
    q1 = np.asarray(gd.eval(pt1, xs))

    assert np.array_equal(q0, all0)
    assert np.array_equal(q1, all1)
    rec = q0 ^ q1
    assert np.array_equal(rec, (xs >= alpha).astype(np.uint32))


def test_alpha_edges(rng):
    in_bits = 7
    n = 2**in_bits
    for alpha in (0, n - 1):
        gd, s0s, cws = _setup(rng, in_bits, alpha)
        ys0 = np.asarray(gd.eval_all(0, s0s[0], cws))
        ys1 = np.asarray(gd.eval_all(1, s0s[1], cws))
        rec = ys0 ^ ys1
        exp = (np.arange(n) >= alpha).astype(np.uint32)
        assert np.array_equal(rec, exp), alpha


def test_eval_endpoint_wrap(rng):
    """x = N - 1 queries e = N (full-domain parity = root)."""
    in_bits = 6
    n = 2**in_bits
    alpha = 13
    gd, s0s, cws = _setup(rng, in_bits, alpha)
    pt0 = gd.preprocess(0, s0s[0], cws)
    pt1 = gd.preprocess(1, s0s[1], cws)
    q = np.asarray(gd.eval(pt0, n - 1)) ^ np.asarray(gd.eval(pt1, n - 1))
    assert q == 1  # alpha <= N-1 always


def test_prefix_table_matches_tree_queries(rng):
    """PrefixTable point queries == ParityTree queries == eval_all."""
    from fss_tpu.api import GrottoDcf

    in_bits = 10
    d = GrottoDcf(in_bits, prg=ChaCha(mul=2, nonce=NONCE))
    alpha = int(rng.integers(0, 2**in_bits))
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    cws = d.gen(s0s, alpha)
    xs = rng.integers(0, 2**in_bits, size=200, dtype=np.uint32)
    for party in (0, 1):
        pt = d.preprocess(party, s0s[party], cws)
        tbl = d.preprocess_prefix(party, s0s[party], cws)
        tree_ys = np.asarray(d.eval(pt, xs))
        tbl_ys = np.asarray(d.eval(tbl, xs))
        all_ys = np.asarray(d.eval_all(party, s0s[party], cws))
        assert np.array_equal(tbl_ys, tree_ys)
        assert np.array_equal(tbl_ys, all_ys[xs])
