"""Pallas DPF eval kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.ops import dpf_pallas
from fss_tpu.prg.chacha import ChaCha
from fss_tpu.schemes import dpf as _dpf

NONCE = (0xABCD1234, 0x55AA55AA)


@pytest.mark.parametrize("gname,g", [
    ("uint32", groups.Uint(32)),
    ("bytes", groups.Bytes()),
    ("uint127", groups.Uint(128, mod=1 << 127)),
])
def test_pallas_eval_matches_reference(gname, g, rng):
    in_bits = 8
    B = 300  # not a multiple of the tile => exercises padding
    prg = ChaCha(mul=2, nonce=NONCE)
    import jax
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    cws = jax.vmap(
        lambda s, a, b: _dpf.gen(prg, g, in_bits, s,
                                 blk.pack_inputs(a, in_bits), b))(
                                     s0s, alphas, betas)
    xs = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    for party in (0, 1):
        ref = np.asarray(_dpf.eval_points(prg, g, in_bits, party,
                                          s0s[:, party], cws, xs))
        got = np.asarray(dpf_pallas.eval_points(
            NONCE, g, in_bits, party, s0s[:, party], cws, xs,
            block_rows=8, interpret=True))
        assert np.array_equal(got, ref), f"party {party}"


def test_pallas_gen_matches_reference(rng):
    import jax
    in_bits = 8
    B = 300
    g = groups.Uint(32)
    prg = ChaCha(mul=2, nonce=NONCE)
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    ref = np.asarray(jax.vmap(
        lambda s, a, b: _dpf.gen(prg, g, in_bits, s,
                                 blk.pack_inputs(a, in_bits), b))(
                                     s0s, alphas, betas))
    got = np.asarray(dpf_pallas.gen_batch(
        NONCE, g, in_bits, s0s, alphas, betas, block_rows=8,
        interpret=True))
    assert np.array_equal(got, ref)


def test_eval_all_pallas_matches_reference(rng):
    from fss_tpu.ops import eval_all_pallas
    in_bits = 13  # smallest kernel-path domain (one tile)
    g = groups.Uint(32)
    prg = ChaCha(mul=2, nonce=NONCE)
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    beta = blk.block(rng.integers(0, 2**32, size=(4,)))
    cws = _dpf.gen(prg, g, in_bits, s0s, blk.pack_inputs(777, in_bits),
                   beta)
    for party in (0, 1):
        ref = np.asarray(_dpf.eval_all(prg, g, in_bits, party, s0s[party],
                                       cws))
        got = np.asarray(eval_all_pallas.eval_all(
            prg, g, in_bits, party, s0s[party], cws, interpret=True))
        assert np.array_equal(got, ref), f"party {party}"


def test_eval_all_pallas_multi_tile(rng):
    from fss_tpu.ops import eval_all_pallas
    in_bits = 15  # 4 tiles
    g = groups.Bytes()
    prg = ChaCha(mul=2, nonce=NONCE)
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    beta = blk.block(rng.integers(0, 2**32, size=(4,)))
    cws = _dpf.gen(prg, g, in_bits, s0s, blk.pack_inputs(31000, in_bits),
                   beta)
    ref = np.asarray(_dpf.eval_all(prg, g, in_bits, 0, s0s[0], cws))
    got = np.asarray(eval_all_pallas.eval_all(
        prg, g, in_bits, 0, s0s[0], cws, interpret=True))
    assert np.array_equal(got, ref)


def test_grotto_eval_all_pallas(rng):
    from fss_tpu.ops import eval_all_pallas
    from fss_tpu.schemes import grotto_dcf as _gr
    in_bits = 13
    prg = ChaCha(mul=2, nonce=NONCE)
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    cws = _gr.gen(prg, groups.Bytes(), in_bits, s0s,
                  blk.pack_inputs(1234, in_bits))
    ref = np.asarray(_gr.eval_all(prg, in_bits, 0, s0s[0], cws))
    got = np.asarray(eval_all_pallas.grotto_eval_all(
        prg, in_bits, 0, s0s[0], cws, interpret=True))
    assert np.array_equal(got, ref)


def test_packed_key_pipeline_matches_wire(rng):
    """gen_batch_packed -> eval_points_packedkey is bit-exact with the
    wire-format kernel path AND the XLA reference (the packed layout
    skips wire-row assembly and streams 5/8 cw words; api.PackedDpfKeys)."""
    import jax
    in_bits = 9
    B = 300  # not a tile multiple => padding exercised
    g = groups.Uint(32)
    prg = ChaCha(mul=2, nonce=NONCE)
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    xs = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)

    wire = np.asarray(dpf_pallas.gen_batch(
        NONCE, g, in_bits, s0s, alphas, betas, block_rows=8,
        interpret=True))
    cws_t, ocw, _ = dpf_pallas.gen_batch_packed(
        NONCE, g, in_bits, jax.numpy.asarray(s0s), alphas,
        jax.numpy.asarray(betas), block_rows=8, interpret=True)

    # Packed planes carry the same bytes as the wire rows.
    from fss_tpu.api import PackedDpfKeys
    pk = PackedDpfKeys(cws_t, ocw)
    assert np.array_equal(np.asarray(pk.to_wire(in_bits)), wire)
    rt = PackedDpfKeys.from_wire(wire, in_bits, block_rows=8)
    assert np.array_equal(np.asarray(rt.to_wire(in_bits)), wire)

    for party in (0, 1):
        ref = np.asarray(_dpf.eval_points(prg, g, in_bits, party,
                                          s0s[:, party], wire, xs))
        got = np.asarray(dpf_pallas.eval_points_packedkey(
            NONCE, g, in_bits, party, s0s[:, party], cws_t, ocw, xs,
            interpret=True))
        assert np.array_equal(got, ref), f"party {party}"


def test_api_packed_layout(rng):
    """api.Dpf: gen_batch(layout='packed') + eval on the packed key give
    the wire path's bytes (CPU fallback path: from_wire/to_wire)."""
    from fss_tpu.api import Dpf, PackedDpfKeys
    in_bits = 8
    B = 64
    g = groups.Uint(32)
    d = Dpf(in_bits, group=g, prg=ChaCha(mul=2, nonce=NONCE))
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    wire = np.asarray(d.gen_batch(s0s, alphas, betas))
    pk = d.gen_batch(s0s, alphas, betas, layout="packed")
    assert isinstance(pk, PackedDpfKeys)
    assert np.array_equal(np.asarray(pk.to_wire(in_bits)), wire)
    for party in (0, 1):
        ref = np.asarray(d.eval(party, s0s[:, party], wire, alphas))
        got = np.asarray(d.eval(party, s0s[:, party], pk, alphas))
        assert np.array_equal(got, ref), f"party {party}"
