"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.api import Dpf
from fss_tpu.parallel import mesh as pmesh
from fss_tpu.prg.chacha import ChaCha

NONCE = (0x55555555, 0x66666666)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 host devices"
    return pmesh.make_mesh(8, axis_names=("domain",))


def test_eval_all_sharded_matches_single(rng, mesh8):
    g = groups.Uint(64)
    in_bits = 9
    d = Dpf(in_bits, group=g, prg=ChaCha(mul=2, nonce=NONCE))
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    beta = blk.block(rng.integers(0, 2**32, size=(4,)))
    cws = d.gen(s0s, 321, beta)

    ys_single = np.asarray(d.eval_all(0, s0s[0], cws))
    ys_sharded = pmesh.dpf_eval_all_sharded(
        d.prg, g, in_bits, 0, s0s[0], cws, mesh8, axis="domain")
    assert np.array_equal(np.asarray(ys_sharded), ys_single)
    # Output really is sharded on the domain axis.
    shard_shapes = {s.data.shape for s in ys_sharded.addressable_shards}
    assert shard_shapes == {(2**in_bits // 8, 4)}


def test_data_sharded_eval(rng, mesh8):
    """Keys/points batch sharded over the data axis, evaluated under jit."""
    g = groups.Bytes()
    in_bits = 8
    d = Dpf(in_bits, group=g, prg=ChaCha(mul=2, nonce=NONCE))
    B = 64
    mesh = pmesh.make_mesh(8, axis_names=("data",))
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    cws = d.gen_batch(s0s, alphas, betas)

    s0_sh = pmesh.shard_batch(mesh, s0s[:, 0])
    cws_sh = pmesh.shard_batch(mesh, cws)
    xs_sh = pmesh.shard_batch(mesh, alphas)
    s1_sh = pmesh.shard_batch(mesh, s0s[:, 1])

    y0 = d.eval(0, s0_sh, cws_sh, xs_sh)
    y1 = d.eval(1, s1_sh, cws_sh, xs_sh)
    rec = np.asarray(g.add(g.from_block(y0), g.from_block(y1)))
    assert np.array_equal(rec, np.asarray(blk.clear_lsb(betas)))


def test_dcf_eval_all_sharded(rng, mesh8):
    from fss_tpu.api import Dcf
    g = groups.Uint(32)
    in_bits = 9
    d = Dcf(in_bits, group=g, prg=ChaCha(mul=4, nonce=NONCE), pred="lt")
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    beta = blk.block([604, 0, 0, 0])
    cws = d.gen(s0s, 321, beta)
    single = np.asarray(d.eval_all(1, s0s[1], cws))
    sharded = pmesh.dcf_eval_all_sharded(d.prg, g, in_bits, 1, s0s[1], cws,
                                         mesh8, axis="domain")
    assert np.array_equal(np.asarray(sharded), single)


def test_grotto_eval_all_sharded(rng, mesh8):
    from fss_tpu.api import GrottoDcf
    in_bits = 9
    d = GrottoDcf(in_bits, prg=ChaCha(mul=2, nonce=NONCE))
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    cws = d.gen(s0s, 100)
    t0 = np.asarray(pmesh.grotto_eval_all_sharded(
        d.prg, in_bits, 0, s0s[0], cws, mesh8, axis="domain"))
    t1 = np.asarray(pmesh.grotto_eval_all_sharded(
        d.prg, in_bits, 1, s0s[1], cws, mesh8, axis="domain"))
    exp = (np.arange(2**in_bits) >= 100).astype(np.uint32)
    assert np.array_equal(t0 ^ t1, exp)
    assert np.array_equal(t0, np.asarray(d.eval_all(0, s0s[0], cws)))


def test_half_tree_eval_all_sharded(rng, mesh8):
    from fss_tpu.api import HalfTreeDpf
    g = groups.Uint(64)
    in_bits = 9
    d = HalfTreeDpf(in_bits, group=g, prg=ChaCha(mul=1, nonce=NONCE),
                    hash_key=rng.integers(0, 2**32, size=4, dtype=np.uint32))
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    beta = blk.block(rng.integers(0, 2**32, size=(4,)))
    cws, ocw = d.gen(s0s, 77, beta)
    single = np.asarray(d.eval_all(0, s0s[0], cws, ocw))
    sharded = pmesh.half_tree_eval_all_sharded(
        d.prg, g, in_bits, 0, d.hash_key, s0s[0], cws, ocw, mesh8,
        axis="domain")
    assert np.array_equal(np.asarray(sharded), single)


def test_vdpf_eval_all_sharded(rng, mesh8):
    from fss_tpu.api import Vdpf
    g = groups.Bytes()
    in_bits = 9
    d = Vdpf(in_bits, group=g, prg=ChaCha(mul=2, nonce=NONCE))
    beta = blk.block(rng.integers(0, 2**32, size=(4,)))
    s0s, cws, cs, ocw = d.gen_retry(rng, 123, beta)
    ys0, pi0 = pmesh.vdpf_eval_all_sharded(
        d.prg, d.xor_hash, d.hash64, g, in_bits, 0, s0s[0], cws, cs, ocw,
        mesh8, axis="domain")
    ys1, pi1 = pmesh.vdpf_eval_all_sharded(
        d.prg, d.xor_hash, d.hash64, g, in_bits, 1, s0s[1], cws, cs, ocw,
        mesh8, axis="domain")
    rec = np.asarray(ys0) ^ np.asarray(ys1)
    nz = np.nonzero(rec.any(-1))[0]
    assert list(nz) == [123]
    # Sharded proofs agree between the parties (documented fold variant).
    assert np.array_equal(np.asarray(pi0), np.asarray(pi1))
    # Output shares match the single-device path.
    ys_single, _ = d.eval_all(0, s0s[0], cws, cs, ocw)
    assert np.array_equal(np.asarray(ys0), np.asarray(ys_single))
