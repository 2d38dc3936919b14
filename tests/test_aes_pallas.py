"""Bitsliced plane-domain AES DPF eval kernel vs the word-domain path.

Runs the Pallas kernel in interpret mode (CPU) and asserts bit equality
with schemes.dpf driven by the FIPS-197-tested table AES, which is itself
golden-checked against the compiled reference in test_golden.py.
"""

import numpy as np
import pytest

import jax

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.ops import aes_pallas
from fss_tpu.prg.aes import Aes128Mmo
from fss_tpu.schemes import dpf as _dpf

KEYS = (bytes(range(16)), bytes(range(16, 32)))


def _setup(rng, in_bits, B):
    prg = Aes128Mmo(mul=2, keys=KEYS, backend="table")
    g = groups.Uint(64)
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    xs = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    cws = jax.jit(jax.vmap(
        lambda s, a, b: _dpf.gen(prg, g, in_bits, s,
                                 blk.pack_inputs(a, in_bits), b)))(
        s0s, alphas, betas)
    return prg, g, s0s, cws, xs


@pytest.mark.parametrize("party", [0, 1])
def test_eval_kernel_batched_keys(rng, party):
    in_bits, B = 10, 4096
    prg, g, s0s, cws, xs = _setup(rng, in_bits, B)
    want = np.asarray(_dpf.eval_points(
        prg, g, in_bits, party, s0s[:, party], cws,
        blk.pack_inputs(xs, in_bits)))
    got = np.asarray(aes_pallas.eval_points(
        KEYS, g, in_bits, party, s0s[:, party], cws, xs, block_rows=1,
        interpret=True))
    assert np.array_equal(got, want)


def test_eval_kernel_shared_key(rng):
    in_bits, B = 10, 4096
    prg, g, s0s, cws, xs = _setup(rng, in_bits, B)
    want = np.asarray(_dpf.eval_points(
        prg, g, in_bits, 0, s0s[0, 0], cws[0],
        blk.pack_inputs(xs, in_bits)))
    got = np.asarray(aes_pallas.eval_points(
        KEYS, g, in_bits, 0, s0s[0, 0], cws[0], xs, block_rows=1,
        interpret=True))
    assert np.array_equal(got, want)


def test_vdpf_eval_kernel(rng):
    """VDPF on the plane-domain AES kernel == schemes.vdpf (interpret)."""
    from fss_tpu.hash.sha256 import Sha256
    from fss_tpu.schemes import vdpf as _vdpf

    in_bits, B = 10, 4096
    prg = Aes128Mmo(mul=2, keys=KEYS, backend="table")
    g = groups.Uint(64)
    h = Sha256(tuple(range(4)))
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    a_lanes = blk.pack_inputs(alphas, in_bits)
    cws, cs, ocw, fail = jax.jit(jax.vmap(
        lambda s, a, b: _vdpf.gen(prg, h.xor_hash, g, in_bits, s, a, b)))(
        s0s, a_lanes, betas)
    ok = np.nonzero(~np.asarray(fail).astype(bool))[0][:1024]
    wys, wpts = _vdpf.eval_points(prg, h.xor_hash, g, in_bits, 1,
                                  s0s[ok, 1], cws[ok], cs[ok], ocw[ok],
                                  blk.pack_inputs(alphas[ok], in_bits))
    gys, gpts = aes_pallas.vdpf_eval_points(
        KEYS, h.xor_hash, g, in_bits, 1, s0s[ok, 1], cws[ok], cs[ok],
        ocw[ok], alphas[ok], block_rows=1, interpret=True)
    assert np.array_equal(np.asarray(gys), np.asarray(wys))
    assert np.array_equal(np.asarray(gpts), np.asarray(wpts))


def test_ht_eval_kernel(rng):
    """Half-Tree on the plane-domain AES CCR kernel == schemes path."""
    from fss_tpu.schemes import half_tree_dpf as _ht

    in_bits, B = 10, 4096
    key1 = (KEYS[0],)
    prg = Aes128Mmo(mul=1, keys=key1, backend="table")
    g = groups.Uint(64)
    hash_key = rng.integers(0, 2**32, size=4, dtype=np.uint32)
    hk = blk.block(hash_key)
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    a_lanes = blk.pack_inputs(alphas, in_bits)
    cws, ocws = jax.jit(jax.vmap(
        lambda s, a, b: _ht.gen(prg, g, in_bits, hk, s, a, b)))(
        s0s, a_lanes, betas)
    for party in (0, 1):
        want = np.asarray(_ht.eval_points(prg, g, in_bits, party, hk,
                                          s0s[:, party], cws, ocws,
                                          a_lanes))
        got = np.asarray(aes_pallas.ht_eval_points(
            key1, g, in_bits, party, hash_key, s0s[:, party], cws, ocws,
            alphas, block_rows=1, interpret=True))
        assert np.array_equal(got, want), f"party {party}"


def test_dcf_eval_kernel(rng):
    """DCF on the plane-domain AES kernel (mul=4, in-kernel bitsliced
    value accumulation) == schemes.dcf (interpret)."""
    from fss_tpu.schemes import dcf as _dcf

    in_bits, B = 8, 2048
    keys4 = tuple(bytes(range(16 * i, 16 * i + 16)) for i in range(4))
    prg = Aes128Mmo(mul=4, keys=keys4, backend="table")
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    a_lanes = blk.pack_inputs(alphas, in_bits)
    for g in (groups.Uint(64), groups.Bytes()):
        cws = jax.jit(jax.vmap(lambda s, a, b: _dcf.gen(
            prg, g, in_bits, "lt", s, a, b)))(s0s, a_lanes, betas)
        want = np.asarray(_dcf.eval_points(prg, g, in_bits, None, 0,
                                           s0s[:, 0], cws, a_lanes))
        got = np.asarray(aes_pallas.dcf_eval_points(
            keys4, g, in_bits, 0, s0s[:, 0], cws, alphas, block_rows=1,
            interpret=True))
        assert np.array_equal(got, want), str(g)


def test_dcf_eval_kernel_chunked(rng):
    """Chunked dispatch (max_t < T, the 2^19-crash mitigation) == the
    single-dispatch kernel == schemes.dcf. Forces the lax.map path with
    max_t=1 over T=2 row tiles."""
    from fss_tpu.schemes import dcf as _dcf

    in_bits, B = 6, 8192  # block_rows=1 -> tile 4096 -> T=2
    keys4 = tuple(bytes(range(16 * i, 16 * i + 16)) for i in range(4))
    prg = Aes128Mmo(mul=4, keys=keys4, backend="table")
    g = groups.Uint(64)
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    a_lanes = blk.pack_inputs(alphas, in_bits)
    cws = jax.jit(jax.vmap(lambda s, a, b: _dcf.gen(
        prg, g, in_bits, "lt", s, a, b)))(s0s, a_lanes, betas)
    want = np.asarray(_dcf.eval_points(prg, g, in_bits, None, 0,
                                       s0s[:, 0], cws, a_lanes))
    got = np.asarray(aes_pallas.dcf_eval_points(
        keys4, g, in_bits, 0, s0s[:, 0], cws, alphas, block_rows=1,
        interpret=True, max_t=1))
    assert np.array_equal(got, want)

    # Chunked pack (the 2^19 pack-crash mitigation) == single-shot pack.
    one = aes_pallas.dcf_pack_eval(s0s[:, 0], cws, alphas, in_bits,
                                   block_rows=1)
    chk = aes_pallas.dcf_pack_eval(s0s[:, 0], cws, alphas, in_bits,
                                   block_rows=1, max_rows=4096)
    for a, b in zip(one[:4], chk[:4]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_gen_kernel(rng):
    """Plane-domain AES Gen kernel == schemes.dpf.gen (interpret):
    identical [B, in_bits+1, 8] key bytes, and eval at alpha
    reconstructs beta."""
    in_bits, B = 8, 2048
    prg, g, s0s, _, _ = _setup(rng, in_bits, B)
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    want = np.asarray(jax.jit(jax.vmap(
        lambda s, a, b: _dpf.gen(prg, g, in_bits, s,
                                 blk.pack_inputs(a, in_bits), b)))(
        s0s, alphas, betas))
    got = np.asarray(aes_pallas.gen_batch(
        KEYS, g, in_bits, s0s, alphas, betas, block_rows=1,
        interpret=True))
    assert np.array_equal(got, want)


def test_dcf_gen_kernel(rng):
    """Plane-domain DCF-AES Gen kernel == schemes.dcf.gen (interpret):
    identical [B, in_bits+1, 8] key bytes over Bytes/Uint32/Uint64
    groups and both predicates."""
    from fss_tpu.schemes import dcf as _dcf

    in_bits, B = 8, 2048
    keys4 = tuple(bytes(range(16 * i, 16 * i + 16)) for i in range(4))
    prg = Aes128Mmo(mul=4, keys=keys4, backend="table")
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    a_lanes = blk.pack_inputs(alphas, in_bits)
    for g, pred in ((groups.Uint(32), "lt"), (groups.Uint(64), "gt"),
                    (groups.Bytes(), "lt")):
        want = np.asarray(jax.jit(jax.vmap(lambda s, a, b: _dcf.gen(
            prg, g, in_bits, pred, s, a, b)))(s0s, a_lanes, betas))
        got = np.asarray(aes_pallas.dcf_gen_batch(
            keys4, g, in_bits, pred, s0s, alphas, betas, block_rows=1,
            interpret=True))
        assert np.array_equal(got, want), f"{g} {pred}"
