"""DCF property tests, mirroring reference src/dcf_test.cu.

Correctness of y0 + y1 = b iff pred(x, alpha), over Group x pred sweeps.
"""

import numpy as np
import pytest

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.api import Dcf
from fss_tpu.prg.chacha import ChaCha

NONCE = (0x11111111, 0x22222222)

GROUPS = [
    ("bytes", groups.Bytes()),
    ("uint64", groups.Uint(64)),
    ("uint127", groups.Uint(128, mod=1 << 127)),
]


def _reconstruct(g, y0, y1):
    return np.asarray(g.add(g.from_block(y0), g.from_block(y1)))


def _setup(g, rng, in_bits, alpha, pred):
    c = Dcf(in_bits, group=g, prg=ChaCha(mul=4, nonce=NONCE), pred=pred)
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    beta = blk.block(rng.integers(0, 2**32, size=(4,)))
    cws = c.gen(s0s, alpha, beta)
    assert cws.shape == (in_bits + 1, 8)
    return c, s0s, beta, cws


@pytest.mark.parametrize("pred", ["lt", "gt"])
@pytest.mark.parametrize("gname,g", GROUPS, ids=[n for n, _ in GROUPS])
def test_eval_random_points(gname, g, pred, rng):
    in_bits = 16
    alpha = int(rng.integers(1, 2**in_bits - 1))
    c, s0s, beta, cws = _setup(g, rng, in_bits, alpha, pred)

    xs = rng.integers(0, 2**in_bits, size=64, dtype=np.uint32)
    xs = np.concatenate([xs, np.uint32([alpha, alpha - 1, alpha + 1, 0,
                                        2**in_bits - 1])]).astype(np.uint32)
    y0 = c.eval(0, s0s[0], cws, xs)
    y1 = c.eval(1, s0s[1], cws, xs)
    rec = _reconstruct(g, y0, y1)

    beta_val = np.asarray(g.from_block(blk.clear_lsb(beta)))
    zero = np.zeros_like(beta_val)
    for i, x in enumerate(xs):
        hit = (int(x) < alpha) if pred == "lt" else (int(x) > alpha)
        exp = beta_val if hit else zero
        assert np.array_equal(rec[i], exp), (pred, int(x), alpha)


@pytest.mark.parametrize("pred", ["lt", "gt"])
@pytest.mark.parametrize("gname,g", GROUPS[:2], ids=[n for n, _ in GROUPS[:2]])
def test_eval_all(gname, g, pred, rng):
    in_bits = 9
    alpha = int(rng.integers(0, 2**in_bits))
    c, s0s, beta, cws = _setup(g, rng, in_bits, alpha, pred)

    ys0 = np.asarray(c.eval_all(0, s0s[0], cws))
    ys1 = np.asarray(c.eval_all(1, s0s[1], cws))
    rec = _reconstruct(g, ys0, ys1)

    beta_val = np.asarray(g.from_block(blk.clear_lsb(beta)))
    xs = np.arange(2**in_bits)
    hits = (xs < alpha) if pred == "lt" else (xs > alpha)
    exp = np.where(hits[:, None], beta_val[None, :], 0)
    assert np.array_equal(rec, exp)


def test_eval_all_matches_eval_points(rng):
    g = groups.Uint(64)
    c, s0s, beta, cws = _setup(g, rng, 8, 77, "lt")
    all0 = np.asarray(c.eval_all(0, s0s[0], cws))
    pts0 = np.asarray(c.eval(0, s0s[0], cws,
                             np.arange(256, dtype=np.uint32)))
    assert np.array_equal(all0, pts0)


def test_alpha_edges(rng):
    g = groups.Uint(64)
    in_bits = 8
    for alpha in (0, 2**in_bits - 1):
        for pred in ("lt", "gt"):
            c, s0s, beta, cws = _setup(g, rng, in_bits, alpha, pred)
            xs = np.arange(2**in_bits, dtype=np.uint32)
            y0 = c.eval(0, s0s[0], cws, xs)
            y1 = c.eval(1, s0s[1], cws, xs)
            rec = _reconstruct(g, y0, y1)
            beta_val = np.asarray(g.from_block(blk.clear_lsb(beta)))
            hits = (xs < alpha) if pred == "lt" else (xs > alpha)
            exp = np.where(hits[:, None], beta_val[None, :], 0)
            assert np.array_equal(rec, exp), (alpha, pred)


def test_gen_batch_fallback_host_chunked(rng, monkeypatch):
    """The XLA-fallback gen_batch path (AES PRG: no fused DCF gen
    kernel) splits large batches into separate host dispatches
    (api._SAFE_DISPATCH_ROWS; TPU-worker dispatch-size crash) — chunked
    output must equal single-dispatch output."""
    import fss_tpu.api as api
    from fss_tpu.prg.aes import Aes128Mmo

    keys4 = tuple(bytes(range(16 * i, 16 * i + 16)) for i in range(4))
    c = Dcf(8, group=groups.Uint(64),
            prg=Aes128Mmo(mul=4, keys=keys4, backend="table"))
    B = 8
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**8, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    whole = np.asarray(c.gen_batch(s0s, alphas, betas))
    monkeypatch.setattr(api, "_SAFE_DISPATCH_ROWS", 2)
    chunked = np.asarray(c.gen_batch(s0s, alphas, betas))
    assert np.array_equal(whole, chunked)
