"""Byte-equality against golden vectors from the ACTUAL reference code.

The vectors in tests/golden/vectors/*.json are produced by
tests/golden/gen_golden.cpp, which host-compiles the reference
implementation (/root/reference/include/fss/*.cuh) unmodified via the shim
headers in tests/golden/shim (see tests/golden/README.md). Every assertion
here therefore checks fss_tpu's wire bytes against bytes the reference's
own scheme logic produced — not against an oracle transcribed by the same
authors. Regenerate with `make -C tests/golden`.
"""

import hashlib
import json
import pathlib

import numpy as np
import pytest

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.api import Dcf, Dpf, GrottoDcf, HalfTreeDpf, Vdmpf, Vdpf
from fss_tpu.hash.blake3 import Blake3
from fss_tpu.hash.sha256 import Sha256
from fss_tpu.prg.aes import Aes128Mmo
from fss_tpu.prg.chacha import ChaCha
from fss_tpu.prp.feistel import Aes128Feistel
from fss_tpu.schemes import cuckoo

VEC_DIR = pathlib.Path(__file__).parent / "golden" / "vectors"


def load(name):
    return json.loads((VEC_DIR / f"{name}.json").read_text())


def h2b(h: str) -> bytes:
    return bytes.fromhex(h)


def h2u32(h: str) -> np.ndarray:
    return np.frombuffer(bytes.fromhex(h), dtype="<u4").copy()


def rows(hex_rows) -> np.ndarray:
    return np.stack([h2u32(r) for r in hex_rows])


def as_bytes(arr) -> bytes:
    return np.asarray(arr, dtype=np.uint32).tobytes()


def case_prg(case, mul):
    if case["prg"] == "chacha":
        return ChaCha(mul=mul, nonce=(case["nonce_lo"], case["nonce_hi"]))
    assert case["prg"] == "aes"
    keys = tuple(h2b(k) for k in case["aes_keys"][:mul])
    return Aes128Mmo(mul=mul, keys=keys)


def case_group(case):
    return {
        "bytes": groups.Bytes(),
        "uint32": groups.Uint(32),
        "uint64": groups.Uint(64),
        "uint127": groups.Uint(128, mod=1 << 127),
        "uint127m": groups.Uint(128, mod=(1 << 127) - 1),
    }[case["group"]]


def case_hashes(case):
    if case["hash"] == "sha256":
        return Sha256(tuple(h2u32(case["hash_key"])))
    assert case["hash"] == "blake3"
    iv = np.concatenate([h2u32(h) for h in case["blake3_iv"]])
    return Blake3(tuple(iv))


def ints(hex_list):
    return [int(h, 0) for h in hex_list]


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------


def test_chacha_primitives():
    for entry in load("primitives")["chacha"]:
        seed = blk.block(h2u32(entry["seed"]))
        nonce = (entry["nonce_lo"], entry["nonce_hi"])
        for mul, key in ((1, "out1"), (2, "out2"), (4, "out4")):
            outs = ChaCha(mul=mul, nonce=nonce)(seed)
            got = b"".join(as_bytes(o) for o in outs)
            assert got == h2b(entry[key]), f"chacha mul={mul}"


def test_aes_mmo_primitives():
    for entry in load("primitives")["aes_mmo"]:
        keys = tuple(h2b(k) for k in entry["keys"])
        seed = blk.block(h2u32(entry["seed"]))
        for backend in ("table", "bitsliced"):
            prg = Aes128Mmo(mul=4, keys=keys, backend=backend)
            got = b"".join(as_bytes(o) for o in prg(seed))
            assert got == h2b(entry["out4"]), f"aes backend={backend}"


def test_sha256_primitives():
    for entry in load("primitives")["sha256"]:
        h = Sha256(tuple(h2u32(entry["key"])))
        msg = h2u32(entry["msg"]).reshape(4, 4)
        assert as_bytes(h.hash64(msg)) == h2b(entry["hash"])
        xout = h.xor_hash(blk.block(h2u32(entry["x"])),
                          blk.block(h2u32(entry["s"])))
        assert as_bytes(xout) == h2b(entry["xor_hash"])


def test_blake3_primitives():
    for entry in load("primitives")["blake3"]:
        h = Blake3(tuple(h2u32(entry["iv"])))
        msg = h2u32(entry["msg"]).reshape(4, 4)
        assert as_bytes(h.hash64(msg)) == h2b(entry["hash"])
        xout = h.xor_hash(blk.block(h2u32(entry["x"])),
                          blk.block(h2u32(entry["s"])))
        assert as_bytes(xout) == h2b(entry["xor_hash"])


def test_feistel_primitives():
    for entry in load("primitives")["feistel"]:
        domain = int(entry["domain"], 0)
        prp = Aes128Feistel(h2b(entry["sigma"]), domain)
        for x_h, y_h in zip(entry["xs"], entry["ys"]):
            assert prp.permu_host(int(x_h, 0)) == int(y_h, 0), \
                f"feistel domain={domain} x={x_h}"


def test_cuckoo_ch_bucket():
    data = load("primitives")["cuckoo"][0]
    for t, m in zip(ints(data["t"]), ints(data["ch_bucket_80"])):
        assert cuckoo.ch_bucket(t, 80) == m, f"ch_bucket({t}, 80)"
    for lam, m in zip(ints(data["lambda"]), ints(data["ch_bucket_t30"])):
        assert cuckoo.ch_bucket(30, lam) == m, f"ch_bucket(30, {lam})"


def test_cuckoo_compact():
    data = load("primitives")["cuckoo"][1]
    m, b_size = data["m"], data["b_size"]
    alphas = ints(data["as"])
    prp = Aes128Feistel(h2b(data["sigma"]), 65536 * 3)
    table = cuckoo.compact_run(prp, alphas, m, 65536, b_size)
    expect = [tuple(int(v) for v in row.split(",")) for row in data["table"]]
    assert table is not None
    assert [tuple(e) for e in table] == expect


# ---------------------------------------------------------------------------
# Schemes
# ---------------------------------------------------------------------------

def _mark_slow_aes16(cases):
    """AES cases at 16-bit domains run their full-domain legs through the
    XLA:CPU bitsliced path (3-5 min each on this 1-core host) — slow-tier
    them for iteration; the full suite still runs them, and the native
    engine checks the same vectors byte-exactly in test_native_golden."""
    return [pytest.param(c, marks=pytest.mark.slow)
            if c["prg"] == "aes" and c["in_bits"] >= 16 else c
            for c in cases]


_DPF_CASES = _mark_slow_aes16(load("dpf")["cases"])
_DCF_CASES = load("dcf")["cases"]
_HT_CASES = load("half_tree")["cases"]
_GROTTO_CASES = _mark_slow_aes16(load("grotto")["cases"])
_VDPF_CASES = load("vdpf")["cases"]
_VDMPF_CASES = load("vdmpf")["cases"]


def _case_id(c):
    parts = [c["prg"], c.get("hash", ""), c.get("group", ""),
             str(c["in_bits"]), c.get("pred", "")]
    return "-".join(p for p in parts if p)


def _check_point_evals(obj, case, s0s, extra=()):
    for i, x_h in enumerate(case["xs"]):
        x = int(x_h, 0)
        y0 = obj.eval(0, s0s[0], *extra, [x])
        y1 = obj.eval(1, s0s[1], *extra, [x])
        assert as_bytes(y0[0]) == h2b(case["ys0"][i]), f"party0 x={x_h}"
        assert as_bytes(y1[0]) == h2b(case["ys1"][i]), f"party1 x={x_h}"


def _check_eval_all(case, fn):
    for party in (0, 1):
        ys = np.asarray(fn(party))
        raw = as_bytes(ys)
        head = h2b(case[f"eval_all_head{party}"])
        assert raw[:len(head)] == head, f"eval_all head party{party}"
        digest = hashlib.sha256(raw).hexdigest()
        assert digest == case[f"eval_all_digest{party}"], \
            f"eval_all digest party{party}"


@pytest.mark.parametrize("case", _DPF_CASES, ids=_case_id)
def test_dpf_golden(case):
    n = case["in_bits"]
    d = Dpf(n, group=case_group(case), prg=case_prg(case, 2))
    s0s = blk.block(np.stack([h2u32(h) for h in case["s0s"]]))
    cws = d.gen(s0s, int(case["alpha"], 0), blk.block(h2u32(case["beta"])))
    assert as_bytes(cws) == rows(case["cws"]).tobytes(), "gen cws bytes"
    _check_point_evals(d, case, s0s, extra=(cws,))
    if "eval_all_digest0" in case:
        _check_eval_all(case, lambda p: d.eval_all(p, s0s[p], cws))


@pytest.mark.parametrize("case", _DCF_CASES, ids=_case_id)
def test_dcf_golden(case):
    n = case["in_bits"]
    d = Dcf(n, group=case_group(case), prg=case_prg(case, 4),
            pred=case["pred"])
    s0s = blk.block(np.stack([h2u32(h) for h in case["s0s"]]))
    cws = d.gen(s0s, int(case["alpha"], 0), blk.block(h2u32(case["beta"])))
    assert as_bytes(cws) == rows(case["cws"]).tobytes(), "gen cws bytes"
    _check_point_evals(d, case, s0s, extra=(cws,))
    if "eval_all_digest0" in case:
        _check_eval_all(case, lambda p: d.eval_all(p, s0s[p], cws))


@pytest.mark.parametrize("case", _HT_CASES, ids=_case_id)
def test_half_tree_golden(case):
    n = case["in_bits"]
    d = HalfTreeDpf(n, group=case_group(case), prg=case_prg(case, 1),
                    hash_key=blk.block(h2u32(case["hash_key"])))
    s0s = blk.block(np.stack([h2u32(h) for h in case["s0s"]]))
    cws, ocw = d.gen(s0s, int(case["alpha"], 0),
                     blk.block(h2u32(case["beta"])))
    assert as_bytes(cws) == rows(case["cws"]).tobytes(), "gen cws bytes"
    assert as_bytes(ocw) == h2b(case["ocw"]), "gen ocw bytes"
    _check_point_evals(d, case, s0s, extra=(cws, ocw))
    if "eval_all_digest0" in case:
        _check_eval_all(case, lambda p: d.eval_all(p, s0s[p], cws, ocw))


@pytest.mark.parametrize("case", _GROTTO_CASES, ids=_case_id)
def test_grotto_golden(case):
    n = case["in_bits"]
    d = GrottoDcf(n, prg=case_prg(case, 2))
    s0s = blk.block(np.stack([h2u32(h) for h in case["s0s"]]))
    cws = d.gen(s0s, int(case["alpha"], 0))
    assert as_bytes(cws) == rows(case["cws"]).tobytes(), "gen cws bytes"

    pts = [d.preprocess(p, s0s[p], cws) for p in (0, 1)]
    for i, x_h in enumerate(case["xs"]):
        x = int(x_h, 0)
        got0 = int(np.asarray(d.eval(pts[0], [x]))[0])
        got1 = int(np.asarray(d.eval(pts[1], [x]))[0])
        assert got0 == int(case["ys0"][i]), f"party0 x={x_h}"
        assert got1 == int(case["ys1"][i]), f"party1 x={x_h}"

    for party in (0, 1):
        ys = np.asarray(d.eval_all(party, s0s[party], cws),
                        dtype=np.uint8)
        raw = ys.tobytes()
        assert raw[:32] == h2b(case[f"eval_all_head{party}"])
        assert hashlib.sha256(raw).hexdigest() == \
            case[f"eval_all_digest{party}"]


@pytest.mark.parametrize("case", _VDPF_CASES, ids=_case_id)
def test_vdpf_golden(case):
    n = case["in_bits"]
    d = Vdpf(n, group=case_group(case), prg=case_prg(case, 2),
             hashes=case_hashes(case))
    s0s = blk.block(np.stack([h2u32(h) for h in case["s0s"]]))
    cws, cs, ocw, fail = d.gen(s0s, int(case["alpha"], 0),
                               blk.block(h2u32(case["beta"])))
    assert not int(fail), "reference gen succeeded with these seeds"
    assert as_bytes(cws) == rows(case["cws"]).tobytes(), "gen cws bytes"
    assert as_bytes(cs) == b"".join(h2b(h) for h in case["cs"]), "cs bytes"
    assert as_bytes(ocw) == h2b(case["ocw"]), "ocw bytes"

    xs = [int(h, 0) for h in case["xs"]]
    for party, s0 in ((0, s0s[0]), (1, s0s[1])):
        pi_tildes = []
        for i, x in enumerate(xs):
            y, pt = d.eval(party, s0, cws, cs, ocw, [x])
            assert as_bytes(np.asarray(y)[0]) == h2b(case[f"ys{party}"][i])
            assert as_bytes(np.asarray(pt)[0]) == \
                h2b(case[f"pi_tildes{party}"][i])
            pi_tildes.append(np.asarray(pt)[0])
        pi_tildes = np.stack(pi_tildes)
        pi = d.prove(pi_tildes, cs)
        assert as_bytes(pi) == h2b(case[f"prove_pi{party}"]), \
            f"prove party{party}"

    if "eval_all_digest0" in case:
        for party in (0, 1):
            ys, pi = d.eval_all(party, s0s[party], cws, cs, ocw,
                                fold="reference")
            raw = as_bytes(ys)
            assert hashlib.sha256(raw).hexdigest() == \
                case[f"eval_all_digest{party}"]
            assert as_bytes(pi) == h2b(case[f"eval_all_pi{party}"]), \
                f"eval_all pi party{party}"


@pytest.mark.parametrize("case", _VDMPF_CASES, ids=_case_id)
def test_vdmpf_golden(case):
    n = case["in_bits"]
    d = Vdmpf(n, max_points=case["max_points"],
              bucket_bits=case["bucket_bits"],
              group=case_group(case), prg=case_prg(case, 2),
              hashes=case_hashes(case))
    assert d.m == case["m"], "compile-time bucket count"

    m = case["m"]
    s0s = np.zeros((m, 2, 4), dtype=np.uint32)
    for i in range(m):
        s0s[i, 0] = h2u32(case["bucket_s0s0"][i])
        s0s[i, 1] = h2u32(case["bucket_s0s1"][i])
    alphas = ints(case["alphas"])
    betas = blk.block(np.stack([h2u32(h) for h in case["betas"]]))

    k0, k1, fail = d.gen(h2b(case["sigma"]), blk.block(s0s), alphas, betas)
    assert not fail, "reference gen succeeded with these inputs"
    assert k0.m_rt == case["m_rt"]
    assert k0.b_size_rt == case["b_size_rt"]
    for i, bucket in enumerate(case["buckets"]):
        assert as_bytes(k0.cws[i]) == rows(bucket["cws"]).tobytes(), \
            f"bucket {i} cws"
        assert as_bytes(k0.cs[i]) == h2b(bucket["cs"]), f"bucket {i} cs"
        assert as_bytes(k0.ocw[i]) == h2b(bucket["ocw"]), f"bucket {i} ocw"
    assert as_bytes(k0.s0) == b"".join(
        h2b(h) for h in case["bucket_s0s0"]), "party0 seeds"
    assert as_bytes(k1.s0) == b"".join(
        h2b(h) for h in case["bucket_s0s1"]), "party1 seeds"

    xs = ints(case["xs"])
    pis = {}
    for party, key in ((0, k0), (1, k1)):
        ys, pi = d.batch_eval(party, key, xs, fold="reference")
        ys = np.asarray(ys)
        for i in range(len(xs)):
            assert as_bytes(ys[i]) == h2b(case[f"ys{party}"][i]), \
                f"party{party} x={case['xs'][i]}"
        pis[party] = np.asarray(pi)
        assert as_bytes(pi) == h2b(case[f"pi{party}"]), \
            f"batch_eval pi party{party}"
    assert d.verify(pis[0], pis[1])
