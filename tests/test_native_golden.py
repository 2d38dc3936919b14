"""Native C++ engine vs golden vectors from the compiled reference.

Round-1's native engine covered DPF/DCF/Half-Tree; these tests pin the
round-2 additions (VDPF, Grotto, ht_eval_all, SHA-256/BLAKE3, VDMPF
routing) byte-for-byte against vectors produced by the reference's own
code (tests/golden/README.md)."""

import hashlib

import numpy as np
import pytest

from fss_tpu import native
from tests.test_golden import (
    _GROTTO_CASES,
    _HT_CASES,
    _VDPF_CASES,
    h2b,
    h2u32,
    ints,
    load,
    rows,
)

_GK = {"bytes": (native.GROUP_BYTES, 0), "uint32": (native.GROUP_UINT, 32),
       "uint64": (native.GROUP_UINT, 64),
       "uint127": (native.GROUP_UINT, 128)}


@pytest.fixture(scope="module")
def eng():
    return native.engine()


def _prg_args(case):
    if case["prg"] == "chacha":
        return native.PRG_CHACHA, dict(
            nonce=(case["nonce_lo"], case["nonce_hi"]))
    return native.PRG_AES128_MMO, dict(
        aes_keys=tuple(h2b(k) for k in case["aes_keys"]))


def _hash_args(case):
    if case["hash"] == "sha256":
        return 0, h2b(case["hash_key"])
    return 1, b"".join(h2b(h) for h in case["blake3_iv"])


def test_sha256_known_answer(eng):
    for msg in (b"", b"abc", b"x" * 200):
        assert eng.sha256(msg) == hashlib.sha256(msg).digest()


def test_blake3_compress_golden(eng):
    for entry in load("primitives")["blake3"]:
        iv = h2u32(entry["iv"])
        m = h2u32(entry["msg"])
        out = eng.blake3_compress(iv, m, 64)
        assert out[:8].tobytes() == h2b(entry["hash"])


@pytest.mark.parametrize("case", _VDPF_CASES,
                         ids=lambda c: f"{c['prg']}-{c['hash']}-"
                                       f"{c['group']}-{c['in_bits']}")
def test_vdpf_native_golden(eng, case):
    if case["prg"] == "aes" and not eng.has_aesni:
        pytest.skip("no AES-NI")
    n = case["in_bits"]
    pk, pargs = _prg_args(case)
    hk, hkey = _hash_args(case)
    gk, gb = _GK[case["group"]]
    s0s = np.stack([h2u32(h) for h in case["s0s"]])

    cws, cs, ocw, fail = eng.vdpf_gen(
        n, pk, hk, hkey, gk, gb, s0s, int(case["alpha"], 0),
        h2u32(case["beta"]), **pargs)
    assert not fail
    assert cws.tobytes() == rows(case["cws"]).tobytes()
    assert cs.tobytes() == b"".join(h2b(h) for h in case["cs"])
    assert ocw.tobytes() == h2b(case["ocw"])

    xs = ints(case["xs"])
    for party in (0, 1):
        ys, pts = eng.vdpf_eval_batch(n, pk, hk, hkey, gk, gb, party,
                                      s0s[party], cws, cs, ocw, xs, **pargs)
        for i in range(len(xs)):
            assert ys[i].tobytes() == h2b(case[f"ys{party}"][i])
            assert pts[i].tobytes() == h2b(case[f"pi_tildes{party}"][i])
        pi = eng.vdpf_prove(hk, hkey, pts, cs)
        assert pi.tobytes() == h2b(case[f"prove_pi{party}"])
        # Independent single-fold proofs == Prove over each pt alone.
        pis1 = eng.vdpf_prove1_batch(hk, hkey, pts, cs)
        for i in range(len(xs)):
            one = eng.vdpf_prove(hk, hkey, pts[i:i + 1], cs)
            assert pis1[i].tobytes() == one.tobytes()

        if "eval_all_digest0" in case:
            ys_all, pi_all = eng.vdpf_eval_all(
                n, pk, hk, hkey, gk, gb, party, s0s[party], cws, cs, ocw,
                **pargs)
            assert hashlib.sha256(ys_all.tobytes()).hexdigest() == \
                case[f"eval_all_digest{party}"]
            assert pi_all.tobytes() == h2b(case[f"eval_all_pi{party}"])


@pytest.mark.parametrize("case", _HT_CASES,
                         ids=lambda c: f"{c['prg']}-{c['group']}-"
                                       f"{c['in_bits']}")
def test_ht_eval_all_native_golden(eng, case):
    if case["prg"] == "aes" and not eng.has_aesni:
        pytest.skip("no AES-NI")
    n = case["in_bits"]
    if "eval_all_digest0" not in case:
        pytest.skip("no eval_all in this case")
    pk, pargs = _prg_args(case)
    gk, gb = _GK[case["group"]]
    s0s = np.stack([h2u32(h) for h in case["s0s"]])
    cws = rows(case["cws"])
    for party in (0, 1):
        ys = eng.ht_eval_all(n, pk, gk, gb, party,
                             h2u32(case["hash_key"]), s0s[party], cws,
                             h2u32(case["ocw"]), **pargs)
        assert hashlib.sha256(ys.tobytes()).hexdigest() == \
            case[f"eval_all_digest{party}"]
        assert ys[:4].tobytes() == h2b(case[f"eval_all_head{party}"])


@pytest.mark.parametrize("case", _GROTTO_CASES,
                         ids=lambda c: f"{c['prg']}-{c['in_bits']}-"
                                       f"{c['alpha']}")
def test_grotto_native_golden(eng, case):
    n = case["in_bits"]
    pk, pargs = _prg_args(case)
    s0s = np.stack([h2u32(h) for h in case["s0s"]])
    cws = rows(case["cws"])
    xs = ints(case["xs"])
    for party in (0, 1):
        pt = eng.grotto_preprocess(n, pk, party, s0s[party], cws, **pargs)
        out = eng.grotto_eval_batch(n, pt, xs)
        expect = [int(case[f"ys{party}"][i]) for i in range(len(xs))]
        assert [int(v) for v in out] == expect
        packed = eng.grotto_pack_tree(pt)
        out_p = eng.grotto_eval_batch_packed(n, packed, xs)
        assert [int(v) for v in out_p] == expect

        ys = eng.grotto_eval_all(n, pk, party, s0s[party], cws, **pargs)
        assert hashlib.sha256(ys.tobytes()).hexdigest() == \
            case[f"eval_all_digest{party}"]


def test_vdmpf_route_native(eng):
    """Routing vs the host Python Locate (itself golden-checked via the
    Compact table in test_golden.py)."""
    from fss_tpu.prp.feistel import Aes128Feistel
    from fss_tpu.schemes import cuckoo

    rng = np.random.default_rng(9)
    sigma = bytes(rng.integers(0, 256, size=16, dtype=np.uint8))
    n, kappa, b_size = 1 << 12, 3, 1000
    prp = Aes128Feistel(sigma, n * kappa)
    xs = rng.integers(0, n, size=64, dtype=np.uint64)
    bucket, index = eng.vdmpf_route(sigma, n, b_size, kappa, xs)
    for i, x in enumerate(xs):
        for k in range(kappa):
            eb, ei = cuckoo.locate_host(prp, int(x), k, n, b_size, kappa)
            assert (bucket[i, k], index[i, k]) == (eb, ei)


def test_vdmpf_batch_eval_native_golden(eng):
    """Full native VDMPF BatchEval vs the compiled reference's outputs
    (ys per party + the two-level proof chain)."""
    from tests.test_golden import _VDMPF_CASES

    case = _VDMPF_CASES[0]
    n_bits = case["in_bits"]
    bb = case["bucket_bits"]
    m = case["m"]
    iv = b"".join(h2b(h) for h in case["blake3_iv"])
    nonce = (case["nonce_lo"], case["nonce_hi"])
    sigma = h2b(case["sigma"])
    xs = ints(case["xs"])
    cws = np.stack([rows(b["cws"]) for b in case["buckets"]])
    cs = np.stack([h2u32(b["cs"]).reshape(4, 4) for b in case["buckets"]])
    ocw = np.stack([h2u32(b["ocw"]) for b in case["buckets"]])
    for party, skey in ((0, "bucket_s0s0"), (1, "bucket_s0s1")):
        s0 = np.stack([h2u32(h) for h in case[skey]])
        ys, pi = eng.vdmpf_batch_eval(
            bb, native.PRG_CHACHA, 1, iv, native.GROUP_UINT, 64, party,
            sigma, 1 << n_bits, m, case["b_size_rt"], 3, s0, cws, cs,
            ocw, xs, nonce=nonce)
        for i in range(len(xs)):
            assert ys[i].tobytes() == h2b(case[f"ys{party}"][i]), \
                f"party{party} x={case['xs'][i]}"
        assert pi.tobytes() == h2b(case[f"pi{party}"])


def test_vdmpf_gen_native_golden(eng):
    """Native VDMPF Gen reproduces the reference's bucket key material."""
    from tests.test_golden import _VDMPF_CASES

    case = _VDMPF_CASES[0]
    bb, m = case["bucket_bits"], case["m"]
    iv = b"".join(h2b(h) for h in case["blake3_iv"])
    nonce = (case["nonce_lo"], case["nonce_hi"])
    s0s = np.zeros((m, 2, 4), dtype=np.uint32)
    for i in range(m):
        s0s[i, 0] = h2u32(case["bucket_s0s0"][i])
        s0s[i, 1] = h2u32(case["bucket_s0s1"][i])
    betas = np.stack([h2u32(h) for h in case["betas"]])
    cws, cs, ocw, fail = eng.vdmpf_gen(
        bb, native.PRG_CHACHA, 1, iv, native.GROUP_UINT, 64,
        h2b(case["sigma"]), 1 << case["in_bits"], m, case["m_rt"],
        case["b_size_rt"], 3, s0s, ints(case["alphas"]), betas,
        nonce=nonce)
    assert not fail
    for i, bucket in enumerate(case["buckets"]):
        assert cws[i].tobytes() == rows(bucket["cws"]).tobytes(), i
        assert cs[i].tobytes() == h2b(bucket["cs"]), i
        assert ocw[i].tobytes() == h2b(bucket["ocw"]), i
