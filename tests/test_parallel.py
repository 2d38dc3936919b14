"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
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


def test_pir_lookup_sharded(rng, mesh8):
    g = groups.Uint(32)
    in_bits = 9
    d = Dpf(in_bits, group=g, prg=ChaCha(mul=2, nonce=NONCE))
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    idx = 321
    cws = d.gen(s0s, idx, blk.block([1, 0, 0, 0]))
    db = rng.integers(0, 2**32, size=(2**in_bits, 8),
                      dtype=np.uint32).astype(np.int32)
    db_sh = jax.device_put(
        db, jax.sharding.NamedSharding(
            mesh8, jax.sharding.PartitionSpec("domain", None)))
    a0 = pmesh.pir_lookup_sharded(d.prg, in_bits, 0, s0s[0], cws, db_sh,
                                  mesh8, axis="domain")
    a1 = pmesh.pir_lookup_sharded(d.prg, in_bits, 1, s0s[1], cws, db_sh,
                                  mesh8, axis="domain")
    row = (np.asarray(a0).astype(np.uint32)
           + np.asarray(a1).astype(np.uint32))
    assert np.array_equal(row, db[idx].astype(np.uint32))


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


def test_2d_mesh_data_and_domain(rng):
    """Both axes at once: a batch of keys sharded on `data`, each key's
    full domain expanded across `domain` — the mesh layout a production
    deployment uses (data across hosts/DCN, domain across ICI)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from fss_tpu.schemes import _tree, dpf as _dpf

    g = groups.Uint(32)
    in_bits = 8
    prg = ChaCha(mul=2, nonce=NONCE)
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "domain"))
    k = 2  # log2(domain shards)

    B = 4
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    d = Dpf(in_bits, group=g, prg=ChaCha(mul=2, nonce=NONCE))
    cws = d.gen_batch(s0s, alphas, betas)

    def one_key(s0, cws):
        # [1, ...] block per data shard; expand domain across the axis.
        s = blk.clear_lsb(s0)[None, :]
        t = jnp.full((1,), np.uint32(0), dtype=jnp.uint32)
        for i in range(k):
            s_cw, tl_cw, tr_cw = _tree.unpack_cw_row(cws[i])
            s, t = _tree.expand_level(prg, s, t, s_cw, tl_cw, tr_cw)
        idx = jax.lax.axis_index("domain")
        s_l = jax.lax.dynamic_slice_in_dim(s, idx, 1, 0)
        t_l = jax.lax.dynamic_slice_in_dim(t, idx, 1, 0)
        for i in range(k, in_bits):
            s_cw, tl_cw, tr_cw = _tree.unpack_cw_row(cws[i])
            s_l, t_l = _tree.expand_level(prg, s_l, t_l, s_cw, tl_cw,
                                          tr_cw)
        return _dpf.finalize_leaves(g, in_bits, 0, s_l, t_l, cws)

    def shard_fn(s0b, cwsb):
        # s0b: [B/2, 4] local keys; map over them, domain axis inside.
        return jax.vmap(one_key)(s0b, cwsb)

    body = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data", None), P("data", None, None)),
        out_specs=P("data", "domain", None))
    ys0 = jax.jit(body)(jnp.asarray(s0s[:, 0]), cws)
    assert ys0.shape == (B, 2**in_bits, 4)
    # Cross-check against the single-device path for each key.
    for i in range(B):
        ref = np.asarray(d.eval_all(0, s0s[i, 0], cws[i]))
        assert np.array_equal(np.asarray(ys0[i]), ref), f"key {i}"


def test_vdmpf_batch_eval_sharded(rng):
    """Data-sharded VDMPF BatchEval: outputs match the single-device
    path; shard-merged proofs agree between parties."""
    from fss_tpu.api import Vdmpf

    in_bits = 10
    g = groups.Uint(64)
    v = Vdmpf(in_bits, group=g, prg=ChaCha(mul=2, nonce=NONCE))
    alphas = sorted(rng.choice(1 << in_bits, size=30,
                               replace=False).tolist())
    betas = blk.block(np.concatenate(
        [rng.integers(0, 2**31, size=(30, 1)),
         np.zeros((30, 3), np.uint32)], axis=1))
    k0, k1 = v.gen_retry(rng, alphas, betas)

    xs = np.uint32(alphas[:10] + [3, 5, 9])  # 13 points (pads to 16)
    mesh = pmesh.make_mesh(8, axis_names=("data",))
    pis = {}
    for party, key in ((0, k0), (1, k1)):
        ys, pi = pmesh.vdmpf_batch_eval_sharded(
            v.prg, v.xor_hash, v.hash64, g, in_bits, v.bucket_bits,
            party, key, xs, mesh)
        ys_ref, _ = v.batch_eval(party, key, xs)
        assert np.array_equal(np.asarray(ys), np.asarray(ys_ref))
        pis[party] = np.asarray(pi)
    assert np.array_equal(pis[0], pis[1])
