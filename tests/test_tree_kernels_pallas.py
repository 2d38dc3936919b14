"""DCF and Half-Tree Pallas kernels vs the XLA reference paths
(interpret mode on CPU)."""

import jax
import numpy as np
import pytest

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.ops import dcf_pallas, ht_pallas
from fss_tpu.prg.chacha import ChaCha
from fss_tpu.schemes import dcf as _dcf
from fss_tpu.schemes import half_tree_dpf as _ht

NONCE = (0x600DCAFE, 0x0BADF00D)


@pytest.mark.parametrize("gname,g", [
    ("uint32", groups.Uint(32)),
    ("uint64", groups.Uint(64)),
    ("bytes", groups.Bytes()),
    # Modular accumulator modes (group/uint.cuh:27-93 generality):
    ("uint127", groups.Uint(128, mod=1 << 127)),       # mod128
    ("uint32_mod1e9+7", groups.Uint(32, mod=10**9 + 7)),  # mod64
    ("uint16_mod1000", groups.Uint(16, mod=1000)),     # mod64, masked
    ("uint64_mod", groups.Uint(64, mod=(1 << 61) - 1)),   # mod64, wide
    ("uint32_mod2e16", groups.Uint(32, mod=1 << 16)),  # pow2 -> wrap
    # 128-bit NON-pow2 moduli (mod128np 160-bit exact accumulator):
    ("uint127_mersenne", groups.Uint(128, mod=(1 << 127) - 1)),
    ("uint126_odd", groups.Uint(128, mod=(1 << 126) + 12345)),
])
def test_dcf_pallas_matches_reference(gname, g, rng):
    in_bits = 8
    B = 200
    prg = ChaCha(mul=4, nonce=NONCE)
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    cws = jax.vmap(
        lambda s, a, b: _dcf.gen(prg, g, in_bits, "lt", s,
                                 blk.pack_inputs(a, in_bits), b))(
                                     s0s, alphas, betas)
    xs = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    assert dcf_pallas.kernel_supports_group(g)
    for party in (0, 1):
        ref = np.asarray(_dcf.eval_points(prg, g, in_bits, None, party,
                                          s0s[:, party], cws, xs))
        got = np.asarray(dcf_pallas.eval_points(
            NONCE, g, in_bits, party, s0s[:, party], cws, xs,
            block_rows=8, interpret=True))
        assert np.array_equal(got, ref), f"party {party}"


def test_dcf_pallas_group_support():
    # Every reference group mode takes the fused kernel now, including
    # bits=128 with a non-pow2 modulus (mod128np, r4 VERDICT #8).
    assert dcf_pallas.kernel_supports_group(groups.Uint(128, mod=1 << 127))
    assert dcf_pallas.kernel_supports_group(groups.Uint(32, mod=1000))
    assert dcf_pallas.kernel_supports_group(
        groups.Uint(128, mod=(1 << 127) - 1))
    from fss_tpu.ops import aes_pallas
    # The plane-domain AES DCF kernel remains wrap/xor-only.
    assert aes_pallas.dcf_kernel_supports_group(groups.Uint(64))
    assert not aes_pallas.dcf_kernel_supports_group(
        groups.Uint(32, mod=1000))


@pytest.mark.parametrize("gname,g", [
    ("uint32", groups.Uint(32)),
    ("uint127", groups.Uint(128, mod=1 << 127)),
    ("bytes", groups.Bytes()),
])
def test_half_tree_pallas_matches_reference(gname, g, rng):
    in_bits = 8
    B = 200
    prg = ChaCha(mul=1, nonce=NONCE)
    hash_key = rng.integers(0, 2**32, size=4, dtype=np.uint32)
    hk = jax.numpy.asarray(hash_key)
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    cws, ocw = jax.vmap(
        lambda s, a, b: _ht.gen(prg, g, in_bits, hk, s,
                                blk.pack_inputs(a, in_bits), b))(
                                    s0s, alphas, betas)
    xs = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    for party in (0, 1):
        ref = np.asarray(_ht.eval_points(prg, g, in_bits, party, hk,
                                         s0s[:, party], cws, ocw, xs))
        got = np.asarray(ht_pallas.eval_points(
            NONCE, g, in_bits, party, hash_key, s0s[:, party], cws, ocw,
            xs, block_rows=8, interpret=True))
        assert np.array_equal(got, ref), f"party {party}"


def test_vdpf_pallas_matches_reference(rng):
    from fss_tpu.hash.blake3 import Blake3
    from fss_tpu.ops import vdpf_pallas
    from fss_tpu.schemes import vdpf as _vdpf

    in_bits = 8
    B = 200
    g = groups.Bytes()
    prg = ChaCha(mul=2, nonce=NONCE)
    h = Blake3(tuple(range(1, 9)))
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = blk.pack_inputs(
        rng.integers(0, 2**in_bits, size=B, dtype=np.uint32), in_bits)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    cws, cs, ocw, _ = jax.vmap(
        lambda s, a, b: _vdpf.gen(prg, h.xor_hash, g, in_bits, s, a, b))(
            s0s, alphas, betas)
    xs = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    for party in (0, 1):
        y_ref, p_ref = _vdpf.eval_points(prg, h.xor_hash, g, in_bits,
                                         party, s0s[:, party], cws, cs,
                                         ocw, xs)
        y_got, p_got = vdpf_pallas.eval_points(
            NONCE, h.xor_hash, g, in_bits, party, s0s[:, party], cws, cs,
            ocw, xs, block_rows=8, interpret=True)
        assert np.array_equal(np.asarray(y_got), np.asarray(y_ref))
        assert np.array_equal(np.asarray(p_got), np.asarray(p_ref))


@pytest.mark.parametrize("in_bits", [8, 64])
def test_vdpf_pallas_sha256_matches_reference(in_bits, rng):
    """Same as test_vdpf_pallas_matches_reference but with the SHA-256
    XorHash, exercising the sha256_pallas plane-kernel pi~ path."""
    from fss_tpu.hash.sha256 import Sha256
    from fss_tpu.ops import vdpf_pallas
    from fss_tpu.schemes import vdpf as _vdpf

    B = 200
    g = groups.Bytes()
    prg = ChaCha(mul=2, nonce=NONCE)
    h = Sha256(tuple(range(11, 15)))
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = blk.pack_inputs(
        [int(v) for v in rng.integers(0, 2**min(in_bits, 63), size=B)],
        in_bits)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    cws, cs, ocw, _ = jax.vmap(
        lambda s, a, b: _vdpf.gen(prg, h.xor_hash, g, in_bits, s, a, b))(
            s0s, alphas, betas)
    xs = blk.pack_inputs(
        [int(v) for v in rng.integers(0, 2**min(in_bits, 63), size=B)],
        in_bits) if in_bits > 32 else \
        rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    for party in (0, 1):
        y_ref, p_ref = _vdpf.eval_points(prg, h.xor_hash, g, in_bits,
                                         party, s0s[:, party], cws, cs,
                                         ocw, xs)
        y_got, p_got = vdpf_pallas.eval_points(
            NONCE, h.xor_hash, g, in_bits, party, s0s[:, party], cws, cs,
            ocw, xs, block_rows=8, interpret=True)
        assert np.array_equal(np.asarray(y_got), np.asarray(y_ref))
        assert np.array_equal(np.asarray(p_got), np.asarray(p_ref))


def test_sha256_kernel_matches_jnp(rng):
    from fss_tpu.hash.sha256 import Sha256
    from fss_tpu.ops import sha256_pallas as shk

    key = tuple(int(v) for v in rng.integers(0, 2**32, size=4))
    h = Sha256(key)
    a = rng.integers(0, 2**32, size=(300, 4), dtype=np.uint32)
    b = rng.integers(0, 2**32, size=(300, 4), dtype=np.uint32)
    assert np.array_equal(
        np.asarray(shk.xor_hash_batch(a, b, key, block_rows=8,
                                      interpret=True)),
        np.asarray(h.xor_hash(a, b)))
    assert shk.sha256_key_of(h.xor_hash) == tuple(
        int(w) for w in h.key)
    from fss_tpu.hash.blake3 import Blake3
    assert shk.sha256_key_of(Blake3(key + key).xor_hash) is None


def test_blake3_kernels_match_jnp(rng):
    from fss_tpu.hash.blake3 import Blake3
    from fss_tpu.ops import blake3_pallas as b3k

    iv = tuple(int(v) for v in rng.integers(0, 2**32, size=8))
    h = Blake3(iv)
    a = rng.integers(0, 2**32, size=(300, 4), dtype=np.uint32)
    b = rng.integers(0, 2**32, size=(300, 4), dtype=np.uint32)
    assert np.array_equal(
        np.asarray(b3k.xor_hash_batch(a, b, iv, block_rows=8,
                                      interpret=True)),
        np.asarray(h.xor_hash(a, b)))
    msg = rng.integers(0, 2**32, size=(300, 4, 4), dtype=np.uint32)
    assert np.array_equal(
        np.asarray(b3k.hash64_batch(msg, iv, block_rows=8,
                                    interpret=True)),
        np.asarray(h.hash64(msg)))


def test_ht_eval_all_pallas(rng):
    from fss_tpu.ops import eval_all_pallas
    in_bits = 13
    g = groups.Uint(32)
    prg = ChaCha(mul=1, nonce=NONCE)
    hash_key = rng.integers(0, 2**32, size=4, dtype=np.uint32)
    hk = jax.numpy.asarray(hash_key)
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    beta = blk.block(rng.integers(0, 2**32, size=(4,)))
    cws, ocw = _ht.gen(prg, g, in_bits, hk, s0s,
                       blk.pack_inputs(4321, in_bits), beta)
    for party in (0, 1):
        ref = np.asarray(_ht.eval_all(prg, g, in_bits, party, hk,
                                      s0s[party], cws, ocw))
        got = np.asarray(eval_all_pallas.ht_eval_all(
            prg, g, in_bits, party, hash_key, s0s[party], cws, ocw,
            interpret=True))
        assert np.array_equal(got, ref), f"party {party}"


@pytest.mark.parametrize("gname,g", [
    ("uint32", groups.Uint(32)),
    ("bytes", groups.Bytes()),
])
def test_dcf_eval_all_pallas(gname, g, rng):
    from fss_tpu.ops import eval_all_pallas
    in_bits = 13
    prg = ChaCha(mul=4, nonce=NONCE)
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    beta = blk.block([604, 0, 0, 0])
    cws = _dcf.gen(prg, g, in_bits, "lt", s0s,
                   blk.pack_inputs(5000, in_bits), beta)
    for party in (0, 1):
        ref = np.asarray(_dcf.eval_all(prg, g, in_bits, party, s0s[party],
                                       cws))
        got = np.asarray(eval_all_pallas.dcf_eval_all(
            prg, g, in_bits, party, s0s[party], cws, interpret=True))
        assert np.array_equal(got, ref), f"party {party}"


def test_vdpf_gen_batch_kernel_matches_reference(rng):
    from fss_tpu.hash.blake3 import Blake3
    from fss_tpu.ops import vdpf_pallas
    from fss_tpu.schemes import vdpf as _vdpf

    in_bits = 8
    B = 300
    g = groups.Uint(32)
    prg = ChaCha(mul=2, nonce=NONCE)
    h = Blake3(tuple(range(1, 9)))
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    ref = jax.vmap(
        lambda s, a, b: _vdpf.gen(prg, h.xor_hash, g, in_bits, s, a, b))(
            s0s, blk.pack_inputs(alphas, in_bits), betas)
    got = vdpf_pallas.gen_batch(NONCE, h.xor_hash, g, in_bits, s0s,
                                alphas, betas, block_rows=8,
                                interpret=True)
    for name, r, o in zip(("cws", "cs", "ocw", "fail"), ref, got):
        assert np.array_equal(np.asarray(o), np.asarray(r)), name


def test_dcf_gen_kernel_matches_scheme(rng):
    """Fused DCF Gen kernel == XLA scan gen, both preds, 3 groups."""
    from fss_tpu.ops import dcf_pallas
    from fss_tpu.schemes import dcf as _dcf

    B, in_bits = 128, 8
    prg = ChaCha(mul=4, nonce=NONCE)
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    for g in (groups.Uint(32), groups.Uint(64), groups.Bytes()):
        for pred in ("lt", "gt"):
            want = np.asarray(jax.jit(jax.vmap(
                lambda s, a, b: _dcf.gen(prg, g, in_bits, pred, s,
                                         blk.pack_inputs(a, in_bits), b)))(
                s0s, alphas, betas))
            got = np.asarray(dcf_pallas.gen_batch(
                NONCE, g, in_bits, pred, s0s, alphas, betas, block_rows=1,
                interpret=True))
            assert np.array_equal(got, want), f"{g} {pred}"


def test_ht_gen_kernel_matches_scheme(rng):
    """Fused Half-Tree Gen kernel == XLA scan gen (incl. in_bits=2)."""
    from fss_tpu.ops import ht_pallas
    from fss_tpu.schemes import half_tree_dpf as _ht

    B = 128
    hash_key = rng.integers(0, 2**32, size=4, dtype=np.uint32)
    prg = ChaCha(mul=1, nonce=NONCE)
    for in_bits in (2, 8):
        g = groups.Uint(64)
        s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
        alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
        betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
        hk = blk.block(hash_key)
        want_cws, want_ocw = jax.jit(jax.vmap(
            lambda s, a, b: _ht.gen(prg, g, in_bits, hk, s,
                                    blk.pack_inputs(a, in_bits), b)))(
            s0s, alphas, betas)
        got_cws, got_ocw = ht_pallas.gen_batch(
            NONCE, g, in_bits, hash_key, s0s, alphas, betas, block_rows=1,
            interpret=True)
        assert np.array_equal(np.asarray(got_cws), np.asarray(want_cws))
        assert np.array_equal(np.asarray(got_ocw), np.asarray(want_ocw))
