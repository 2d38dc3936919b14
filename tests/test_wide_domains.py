"""Wide input domains: in_bits > 32 up to 128 (reference supports
In = uint8..__uint128_t for point eval; dpf.cuh:61-63). Inputs are Python
ints or pre-packed [., 4] uint32 lane arrays."""

import numpy as np
import pytest

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.api import Dcf, Dpf
from fss_tpu.prg.chacha import ChaCha

NONCE = (0xAAAA5555, 0x5555AAAA)


@pytest.mark.parametrize("in_bits", [48, 64, 100, 128])
def test_dpf_wide_domain(in_bits, rng):
    g = groups.Bytes()
    d = Dpf(in_bits, group=g, prg=ChaCha(mul=2, nonce=NONCE))
    alpha = int(rng.integers(0, 2**63)) | (1 << (in_bits - 1))
    alpha &= (1 << in_bits) - 1
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    beta = blk.block(rng.integers(0, 2**32, size=(4,)))
    cws = d.gen(s0s, alpha, beta)
    assert cws.shape == (in_bits + 1, 8)

    y0 = d.eval(0, s0s[0], cws, alpha)
    y1 = d.eval(1, s0s[1], cws, alpha)
    rec = np.asarray(y0) ^ np.asarray(y1)
    assert np.array_equal(rec, np.asarray(blk.clear_lsb(beta)))

    # Batched non-alpha points as pre-packed lanes.
    others = [(alpha ^ (1 << i)) for i in (0, in_bits // 2, in_bits - 1)]
    x_lanes = np.stack([blk.pack_int(v) for v in others])
    y0 = np.asarray(d.eval(0, s0s[0], cws, x_lanes))
    y1 = np.asarray(d.eval(1, s0s[1], cws, x_lanes))
    assert np.all((y0 ^ y1) == 0)


def test_dcf_wide_domain_comparison(rng):
    in_bits = 64
    g = groups.Uint(64)
    d = Dcf(in_bits, group=g, prg=ChaCha(mul=4, nonce=NONCE), pred="lt")
    alpha = int(rng.integers(1, 2**63))
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    beta = blk.block([604, 0, 0, 0])
    cws = d.gen(s0s, alpha, beta)

    below = [0, alpha - 1, alpha // 2]
    above = [alpha, alpha + 1, (1 << in_bits) - 1]
    for x, expect in [(v, 604) for v in below] + [(v, 0) for v in above]:
        y0 = d.eval(0, s0s[0], cws, x)
        y1 = d.eval(1, s0s[1], cws, x)
        rec = np.asarray(g.add(g.from_block(y0), g.from_block(y1)))
        val = int(rec[0]) | (int(rec[1]) << 32)
        assert val == expect, f"x={x}"


@pytest.mark.parametrize("in_bits", [48, 128])
def test_wide_domain_kernel_path(in_bits, rng):
    """The fused Pallas eval kernel accepts packed-lane inputs for
    in_bits > 32 (interpret mode; golden 48/128-bit vectors pin the same
    math against the compiled reference in test_golden.py)."""
    from fss_tpu.ops import dpf_pallas
    from fss_tpu.schemes import dpf as _dpf

    g = groups.Bytes()
    prg = ChaCha(mul=2, nonce=NONCE)
    B = 128
    alphas = [(int(rng.integers(0, 2**63)) | (1 << (in_bits - 1)))
              & ((1 << in_bits) - 1) for _ in range(B)]
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    a_lanes = blk.pack_inputs(alphas, in_bits)
    import jax
    cws = jax.jit(jax.vmap(
        lambda s, a, b: _dpf.gen(prg, g, in_bits, s, a, b)))(
        s0s, a_lanes, betas)

    want = np.asarray(_dpf.eval_points(prg, g, in_bits, 0, s0s[:, 0],
                                       cws, a_lanes))
    got = np.asarray(dpf_pallas.eval_points(
        NONCE, g, in_bits, 0, s0s[:, 0], cws, a_lanes, block_rows=1,
        interpret=True))
    assert np.array_equal(got, want)


@pytest.mark.slow
@pytest.mark.parametrize("in_bits", [48, 64])
def test_vdmpf_wide_domain(in_bits, rng):
    """VDMPF routing over wide domains: the PRP runs the 4-lane Feistel
    walk (parity with the reference PRP's __uint128_t domain,
    prp.cuh:22-25 / cuckoo_hash.cuh:94-124); bucket/index come from the
    compare-accumulate divide. Reconstruction and Verify close over a
    t=30 multi-point function."""
    from fss_tpu.api import Vdmpf

    g = groups.Uint(64)
    d = Vdmpf(in_bits, group=g, prg=ChaCha(mul=2, nonce=NONCE))
    assert d.bucket_bits > 32  # the wide inner-domain path
    alphas = sorted(int(v) | (1 << (in_bits - 1))
                    for v in rng.integers(0, 2**47, size=30))
    b = np.zeros((30, 4), dtype=np.uint32)
    b[:, 0] = rng.integers(1, 2**31, size=30)
    betas = blk.block(b)
    k0, k1 = d.gen_retry(rng, alphas, betas)

    xs = alphas[:4] + [a ^ 1 for a in alphas[:2]] + [0, 123456789]
    ys0, pi0 = d.batch_eval(0, k0, xs)
    ys1, pi1 = d.batch_eval(1, k1, xs)
    rec = np.asarray(g.add(g.from_block(ys0), g.from_block(ys1)))
    for i, x in enumerate(xs):
        want = int(b[alphas.index(x), 0]) if x in alphas else 0
        got = int(rec[i][0]) | (int(rec[i][1]) << 32)
        assert got == want, f"x={x}"
    assert d.verify(pi0, pi1)


def test_wide_domain_dcf_ht_vdpf_kernels(rng):
    """Wide packed-lane inputs on the DCF / Half-Tree / VDPF eval kernels
    (interpret mode) match the scheme paths."""
    import jax
    from fss_tpu.ops import dcf_pallas, ht_pallas, vdpf_pallas
    from fss_tpu.schemes import dcf as _dcf
    from fss_tpu.schemes import half_tree_dpf as _ht
    from fss_tpu.schemes import vdpf as _vdpf

    in_bits, B = 40, 128
    g = groups.Uint(64)
    prg4 = ChaCha(mul=4, nonce=NONCE)
    prg2 = ChaCha(mul=2, nonce=NONCE)
    prg1 = ChaCha(mul=1, nonce=NONCE)
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = [int(v) | (1 << (in_bits - 1))
              for v in rng.integers(0, 2**39, size=B)]
    a_lanes = blk.pack_inputs(alphas, in_bits)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))

    # DCF
    cws = jax.jit(jax.vmap(lambda s, a, b: _dcf.gen(
        prg4, g, in_bits, "lt", s, a, b)))(s0s, a_lanes, betas)
    want = np.asarray(_dcf.eval_points(prg4, g, in_bits, None, 0,
                                       s0s[:, 0], cws, a_lanes))
    got = np.asarray(dcf_pallas.eval_points(
        NONCE, g, in_bits, 0, s0s[:, 0], cws, a_lanes, block_rows=1,
        interpret=True))
    assert np.array_equal(got, want), "dcf wide kernel"

    # Half-Tree
    hk = blk.block(rng.integers(0, 2**32, size=4, dtype=np.uint32))
    hcws, ocws = jax.jit(jax.vmap(lambda s, a, b: _ht.gen(
        prg1, g, in_bits, hk, s, a, b)))(s0s, a_lanes, betas)
    want = np.asarray(_ht.eval_points(prg1, g, in_bits, 0, hk, s0s[:, 0],
                                      hcws, ocws, a_lanes))
    got = np.asarray(ht_pallas.eval_points(
        NONCE, g, in_bits, 0, np.asarray(hk), s0s[:, 0], hcws, ocws,
        a_lanes, block_rows=1, interpret=True))
    assert np.array_equal(got, want), "ht wide kernel"

    # VDPF (first key whose gen succeeds)
    from fss_tpu.hash.blake3 import Blake3
    h = Blake3(tuple(range(8)))
    cws_v, cs, ocw, fail = jax.jit(jax.vmap(lambda s, a, b: _vdpf.gen(
        prg2, h.xor_hash, g, in_bits, s, a, b)))(s0s, a_lanes, betas)
    ok = np.nonzero(~np.asarray(fail).astype(bool))[0][:16]
    wys, wpts = _vdpf.eval_points(
        prg2, h.xor_hash, g, in_bits, 0, s0s[ok, 0], cws_v[ok], cs[ok],
        ocw[ok], a_lanes[ok])
    gys, gpts = vdpf_pallas.eval_points(
        NONCE, h.xor_hash, g, in_bits, 0, s0s[ok, 0], cws_v[ok], cs[ok],
        ocw[ok], a_lanes[ok], block_rows=1, interpret=True)
    assert np.array_equal(np.asarray(gys), np.asarray(wys)), "vdpf wide y"
    assert np.array_equal(np.asarray(gpts), np.asarray(wpts)), \
        "vdpf wide pi"
