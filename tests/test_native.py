"""Native C++ engine tests: bit-exactness vs the JAX implementations
(ChaCha + AES-NI PRGs, DPF gen/eval/eval_all over all groups)."""

import numpy as np
import pytest

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu import native
from fss_tpu.prg.aes import Aes128Mmo, aes128_encrypt_reference
from fss_tpu.prg.chacha import chacha_prg_reference
from fss_tpu.schemes import dpf as _dpf
from fss_tpu.prg.chacha import ChaCha

NONCE = (0x13572468, 0x90ABCDEF)
KEYS = (bytes(range(1, 17)), bytes(range(16, 0, -1)))


@pytest.fixture(scope="module")
def eng():
    return native.engine()


def test_chacha_prg_vs_oracle(eng, rng):
    for mul in (1, 2, 4):
        seed = rng.integers(0, 2**32, size=4, dtype=np.uint32)
        got = eng.prg(native.PRG_CHACHA, mul, seed, nonce=NONCE)
        exp = chacha_prg_reference(seed, NONCE, mul)
        assert np.array_equal(got, exp), f"mul={mul}"


def test_aes_prg_vs_oracle(eng, rng):
    if not eng.has_aesni:
        pytest.skip("no AES-NI on this host")
    seed = rng.integers(0, 2**32, size=4, dtype=np.uint32)
    got = eng.prg(native.PRG_AES128_MMO, 2, seed, aes_keys=KEYS)
    for i, key in enumerate(KEYS):
        enc = aes128_encrypt_reference(key, seed.astype("<u4").tobytes())
        exp = np.frombuffer(enc, dtype="<u4") ^ seed
        assert np.array_equal(got[i], exp), f"lane {i}"


GROUPS = [
    (native.GROUP_BYTES, 0, groups.Bytes()),
    (native.GROUP_UINT, 32, groups.Uint(32)),
    (native.GROUP_UINT, 64, groups.Uint(64)),
    (native.GROUP_UINT, 128, groups.Uint(128, mod=1 << 127)),
]


@pytest.mark.parametrize("gk,gb,g", GROUPS,
                         ids=["bytes", "u32", "u64", "u127"])
def test_dpf_gen_eval_matches_jax(eng, gk, gb, g, rng):
    in_bits = 10
    alpha = int(rng.integers(0, 2**in_bits))
    prg = ChaCha(mul=2, nonce=NONCE)
    s0s = rng.integers(0, 2**32, size=(2, 4), dtype=np.uint32)
    beta = rng.integers(0, 2**32, size=4, dtype=np.uint32)

    import jax.numpy as jnp
    cws_jax = np.asarray(_dpf.gen(prg, g, in_bits, jnp.asarray(s0s),
                                  blk.pack_inputs(alpha, in_bits),
                                  jnp.asarray(beta)))
    cws_nat = eng.dpf_gen(in_bits, native.PRG_CHACHA, gk, gb, s0s, alpha,
                          beta, nonce=NONCE)
    assert np.array_equal(cws_nat, cws_jax)

    xs = rng.integers(0, 2**in_bits, size=32, dtype=np.uint32)
    for party in (0, 1):
        y_jax = np.asarray(_dpf.eval_points(prg, g, in_bits, party,
                                            s0s[party], cws_jax, xs))
        y_nat = eng.dpf_eval(in_bits, native.PRG_CHACHA, gk, gb, party,
                             s0s[party], cws_nat, xs, nonce=NONCE)
        assert np.array_equal(y_nat, y_jax), f"party {party}"

    a_jax = np.asarray(_dpf.eval_all(prg, g, in_bits, 0, s0s[0], cws_jax))
    a_nat = eng.dpf_eval_all(in_bits, native.PRG_CHACHA, gk, gb, 0,
                             s0s[0], cws_nat, nonce=NONCE)
    assert np.array_equal(a_nat, a_jax)


def test_dpf_aes_end_to_end(eng, rng):
    if not eng.has_aesni:
        pytest.skip("no AES-NI on this host")
    in_bits = 8
    alpha = 42
    prg = Aes128Mmo(mul=2, keys=KEYS)
    g = groups.Bytes()
    s0s = rng.integers(0, 2**32, size=(2, 4), dtype=np.uint32)
    beta = np.array([7, 0, 0, 0], dtype=np.uint32)
    import jax.numpy as jnp
    cws_jax = np.asarray(_dpf.gen(prg, g, in_bits, jnp.asarray(s0s),
                                  blk.pack_inputs(alpha, in_bits),
                                  jnp.asarray(beta)))
    cws_nat = eng.dpf_gen(in_bits, native.PRG_AES128_MMO,
                          native.GROUP_BYTES, 0, s0s, alpha, beta,
                          aes_keys=KEYS)
    assert np.array_equal(cws_nat, cws_jax)
    y0 = eng.dpf_eval(in_bits, native.PRG_AES128_MMO, native.GROUP_BYTES,
                      0, 0, s0s[0], cws_nat, [alpha], aes_keys=KEYS)
    y1 = eng.dpf_eval(in_bits, native.PRG_AES128_MMO, native.GROUP_BYTES,
                      0, 1, s0s[1], cws_nat, [alpha], aes_keys=KEYS)
    assert np.array_equal(y0[0] ^ y1[0], beta)


def test_dpf_eval_batch(eng, rng):
    in_bits = 8
    B = 16
    prg = ChaCha(mul=2, nonce=NONCE)
    g = groups.Uint(32)
    import jax
    s0s = rng.integers(0, 2**32, size=(B, 2, 4), dtype=np.uint32)
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = rng.integers(0, 2**32, size=(B, 4), dtype=np.uint32)
    cws = np.asarray(jax.vmap(
        lambda s, a, b: _dpf.gen(prg, g, in_bits, s,
                                 blk.pack_inputs(a, in_bits), b))(
                                     s0s, alphas, betas))
    y0 = eng.dpf_eval_batch(in_bits, native.PRG_CHACHA, native.GROUP_UINT,
                            32, 0, s0s[:, 0].copy(), cws,
                            alphas.astype(np.uint64), nonce=NONCE)
    y1 = eng.dpf_eval_batch(in_bits, native.PRG_CHACHA, native.GROUP_UINT,
                            32, 1, s0s[:, 1].copy(), cws,
                            alphas.astype(np.uint64), nonce=NONCE)
    rec = (y0.astype(np.uint64) + y1.astype(np.uint64)) % 2**32
    assert np.array_equal(rec[:, 0], betas[:, 0])


def test_dpf_gen_batch_matches_single(eng, rng):
    in_bits = 8
    n = 10
    s0sb = rng.integers(0, 2**32, size=(n, 2, 4), dtype=np.uint32)
    alphas = rng.integers(0, 2**in_bits, size=n, dtype=np.uint64)
    betas = rng.integers(0, 2**32, size=(n, 4), dtype=np.uint32)
    cwsb = eng.dpf_gen_batch(in_bits, native.PRG_CHACHA, native.GROUP_UINT,
                             32, s0sb, alphas, betas, nonce=NONCE)
    for i in (0, 3, n - 1):
        one = eng.dpf_gen(in_bits, native.PRG_CHACHA, native.GROUP_UINT,
                          32, s0sb[i], int(alphas[i]), betas[i],
                          nonce=NONCE)
        assert np.array_equal(one, cwsb[i]), f"row {i}"

    # AES path: the batch loop interleaves two keys per step; every row
    # (both interleave slots + the odd tail) must equal the single-key gen.
    keys = tuple(bytes(rng.integers(0, 256, 16, dtype=np.uint8))
                 for _ in range(2))
    cwsa = eng.dpf_gen_batch(in_bits, native.PRG_AES128_MMO,
                             native.GROUP_UINT, 32, s0sb, alphas, betas,
                             aes_keys=keys)
    for i in range(n):
        one = eng.dpf_gen(in_bits, native.PRG_AES128_MMO,
                          native.GROUP_UINT, 32, s0sb[i], int(alphas[i]),
                          betas[i], aes_keys=keys)
        assert np.array_equal(one, cwsa[i]), f"aes row {i}"


@pytest.mark.parametrize("gk,gb,g", GROUPS,
                         ids=["bytes", "u32", "u64", "u127"])
def test_dcf_gen_eval_matches_jax(eng, gk, gb, g, rng):
    from fss_tpu.schemes import dcf as _dcf
    import jax.numpy as jnp
    in_bits = 8
    alpha = int(rng.integers(1, 2**in_bits))
    prg = ChaCha(mul=4, nonce=NONCE)
    s0s = rng.integers(0, 2**32, size=(2, 4), dtype=np.uint32)
    beta = rng.integers(0, 2**32, size=4, dtype=np.uint32)
    for pred in ("lt", "gt"):
        cws_jax = np.asarray(_dcf.gen(prg, g, in_bits, pred,
                                      jnp.asarray(s0s),
                                      blk.pack_inputs(alpha, in_bits),
                                      jnp.asarray(beta)))
        cws_nat = eng.dcf_gen(in_bits, native.PRG_CHACHA, gk, gb, pred,
                              s0s, alpha, beta, nonce=NONCE)
        assert np.array_equal(cws_nat, cws_jax), pred
        xs = rng.integers(0, 2**in_bits, size=16, dtype=np.uint32)
        for party in (0, 1):
            y_jax = np.asarray(_dcf.eval_points(
                prg, g, in_bits, None, party, s0s[party], cws_jax, xs))
            y_nat = eng.dcf_eval(in_bits, native.PRG_CHACHA, gk, gb,
                                 party, s0s[party], cws_nat, xs,
                                 nonce=NONCE)
            assert np.array_equal(y_nat, y_jax), (pred, party)


def test_dcf_eval_all_matches_jax(eng, rng):
    from fss_tpu.schemes import dcf as _dcf
    import jax.numpy as jnp
    in_bits = 9
    g = groups.Uint(32)
    prg = ChaCha(mul=4, nonce=NONCE)
    s0s = rng.integers(0, 2**32, size=(2, 4), dtype=np.uint32)
    beta = np.array([604, 0, 0, 0], dtype=np.uint32)
    cws = np.asarray(_dcf.gen(prg, g, in_bits, "lt", jnp.asarray(s0s),
                              blk.pack_inputs(300, in_bits),
                              jnp.asarray(beta)))
    for party in (0, 1):
        ref = np.asarray(_dcf.eval_all(prg, g, in_bits, party,
                                       s0s[party], cws))
        got = eng.dcf_eval_all(in_bits, native.PRG_CHACHA,
                               native.GROUP_UINT, 32, party, s0s[party],
                               cws, nonce=NONCE)
        assert np.array_equal(got, ref), f"party {party}"


@pytest.mark.slow
@pytest.mark.parametrize("gk,gb,g", GROUPS + [
    (native.GROUP_UINT, 16, groups.Uint(16))],
    ids=["bytes", "u32", "u64", "u127", "u16"])
@pytest.mark.parametrize("in_bits", [5, 9])
def test_dcf_eval_all_aes_matches_jax(eng, gk, gb, g, in_bits, rng):
    """AES-config full-domain walk vs the JAX scheme, all value-lane
    layouts: packed-u64 scratch (Uint<=64, incl. the in_bits=5 scalar
    tail below the VAES width), Block scratch (Bytes XOR / u128)."""
    if not eng.has_aesni:
        pytest.skip("no AES-NI on this host")
    from fss_tpu.schemes import dcf as _dcf
    import jax.numpy as jnp
    keys4 = tuple(bytes(rng.integers(0, 256, 16, dtype=np.uint8))
                  for _ in range(4))
    prg = Aes128Mmo(mul=4, keys=keys4)
    alpha = int(rng.integers(1, 2**in_bits))
    s0s = rng.integers(0, 2**32, size=(2, 4), dtype=np.uint32)
    beta = rng.integers(0, 2**32, size=4, dtype=np.uint32)
    cws = np.asarray(_dcf.gen(prg, g, in_bits, "lt", jnp.asarray(s0s),
                              blk.pack_inputs(alpha, in_bits),
                              jnp.asarray(beta)))
    for party in (0, 1):
        ref = np.asarray(_dcf.eval_all(prg, g, in_bits, party,
                                       s0s[party], cws))
        got = eng.dcf_eval_all(in_bits, native.PRG_AES128_MMO, gk, gb,
                               party, s0s[party], cws, aes_keys=keys4)
        assert np.array_equal(got, ref), f"party {party}"


def test_ht_gen_eval_matches_jax(eng, rng):
    from fss_tpu.schemes import half_tree_dpf as _ht
    import jax.numpy as jnp
    in_bits = 9
    g = groups.Uint(64)
    prg = ChaCha(mul=1, nonce=NONCE)
    hash_key = rng.integers(0, 2**32, size=4, dtype=np.uint32)
    s0s = rng.integers(0, 2**32, size=(2, 4), dtype=np.uint32)
    beta = rng.integers(0, 2**32, size=4, dtype=np.uint32)
    alpha = int(rng.integers(0, 2**in_bits))
    cws_j, ocw_j = _ht.gen(prg, g, in_bits, jnp.asarray(hash_key),
                           jnp.asarray(s0s),
                           blk.pack_inputs(alpha, in_bits),
                           jnp.asarray(beta))
    cws_n, ocw_n = eng.ht_gen(in_bits, native.PRG_CHACHA,
                              native.GROUP_UINT, 64, hash_key, s0s, alpha,
                              beta, nonce=NONCE)
    assert np.array_equal(cws_n, np.asarray(cws_j))
    assert np.array_equal(ocw_n, np.asarray(ocw_j))
    xs = rng.integers(0, 2**in_bits, size=16, dtype=np.uint32)
    for party in (0, 1):
        ref = np.asarray(_ht.eval_points(prg, g, in_bits, party,
                                         jnp.asarray(hash_key),
                                         s0s[party], cws_j, ocw_j, xs))
        got = eng.ht_eval(in_bits, native.PRG_CHACHA, native.GROUP_UINT,
                          64, party, hash_key, s0s[party], cws_n, ocw_n,
                          xs, nonce=NONCE)
        assert np.array_equal(got, ref), f"party {party}"


def test_ht_gen_batch_matches_single(eng, rng):
    """AES batch gen interleaves 4 keys per step (ht_gen_aesni_k<4>);
    every row (all interleave slots + the tail) must equal single-key gen."""
    in_bits = 9
    n = 7  # one x4 step + a 3-key tail
    keys = (bytes(rng.integers(0, 256, 16, dtype=np.uint8)),)
    hash_key = rng.integers(0, 2**32, size=4, dtype=np.uint32)
    s0sb = rng.integers(0, 2**32, size=(n, 2, 4), dtype=np.uint32)
    alphas = rng.integers(0, 2**in_bits, size=n, dtype=np.uint64)
    betas = rng.integers(0, 2**32, size=(n, 4), dtype=np.uint32)
    cwsb, ocwb = eng.ht_gen_batch(in_bits, native.PRG_AES128_MMO,
                                  native.GROUP_UINT, 32, hash_key, s0sb,
                                  alphas, betas, aes_keys=keys)
    for i in range(n):
        one, ocw1 = eng.ht_gen(in_bits, native.PRG_AES128_MMO,
                               native.GROUP_UINT, 32, hash_key, s0sb[i],
                               int(alphas[i]), betas[i], aes_keys=keys)
        assert np.array_equal(one, cwsb[i]), f"row {i}"
        assert np.array_equal(ocw1, ocwb[i]), f"ocw {i}"


def test_dcf_gen_batch_matches_single(eng, rng):
    """AES batch gen takes the key-sliced VAES path where the host has it;
    every row (all slots + tails, both predicates) must equal single-key
    gen."""
    in_bits = 9
    n = 7
    keys = tuple(bytes(rng.integers(0, 256, 16, dtype=np.uint8))
                 for _ in range(4))
    s0sb = rng.integers(0, 2**32, size=(n, 2, 4), dtype=np.uint32)
    alphas = rng.integers(0, 2**in_bits, size=n, dtype=np.uint64)
    betas = rng.integers(0, 2**32, size=(n, 4), dtype=np.uint32)
    for pred_s, pred_i in (("lt", 1), ("gt", 0)):
        cwsb = eng.dcf_gen_batch(in_bits, native.PRG_AES128_MMO,
                                 native.GROUP_UINT, 32, pred_i, s0sb,
                                 alphas, betas, aes_keys=keys)
        for i in range(n):
            one = eng.dcf_gen(in_bits, native.PRG_AES128_MMO,
                              native.GROUP_UINT, 32, pred_s, s0sb[i],
                              int(alphas[i]), betas[i], aes_keys=keys)
            assert np.array_equal(one, np.asarray(cwsb)[i]), \
                f"{pred_s} row {i}"
