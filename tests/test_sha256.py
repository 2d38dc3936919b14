"""SHA-256 keyed hash tests: bit-exact vs hashlib (the same function the
reference computes via OpenSSL EVP_Digest, sha256.cuh:43-89), plus a VDPF
run under the SHA-256 hash config."""

import hashlib

import numpy as np

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.api import Vdpf
from fss_tpu.hash.sha256 import Sha256
from fss_tpu.prg.chacha import ChaCha


def _lanes_bytes(lanes) -> bytes:
    return np.asarray(lanes, dtype=np.uint32).astype("<u4").tobytes()


def test_hash64_vs_hashlib(rng):
    key = tuple(int(v) for v in rng.integers(0, 2**32, size=4))
    h = Sha256(key)
    msg = rng.integers(0, 2**32, size=(5, 4, 4), dtype=np.uint32)
    out = np.asarray(h.hash64(msg))
    assert out.shape == (5, 2, 4)
    for i in range(5):
        buf = _lanes_bytes(np.array(key, np.uint32)) + _lanes_bytes(msg[i])
        assert len(buf) == 80
        exp = hashlib.sha256(buf).digest()
        assert _lanes_bytes(out[i]) == exp, f"row {i}"


def test_xor_hash_vs_hashlib(rng):
    key = tuple(int(v) for v in rng.integers(0, 2**32, size=4))
    h = Sha256(key)
    a = rng.integers(0, 2**32, size=(3, 4), dtype=np.uint32)
    b = rng.integers(0, 2**32, size=(3, 4), dtype=np.uint32)
    out = np.asarray(h.xor_hash(a, b))
    assert out.shape == (3, 4, 4)
    kb = _lanes_bytes(np.array(key, np.uint32))
    for i in range(3):
        a0 = a[i].copy()
        a0[3] &= 0xFFFFFFFE
        d0 = hashlib.sha256(
            kb + _lanes_bytes(a0) + _lanes_bytes(b[i])).digest()
        a1 = a[i].copy()
        a1[3] |= 1
        d1 = hashlib.sha256(
            kb + _lanes_bytes(a1) + _lanes_bytes(b[i])).digest()
        assert _lanes_bytes(out[i]) == d0 + d1, f"row {i}"


def test_vdpf_with_sha256(rng):
    """VDPF under the SHA-256 hash pair (the reference's benchmark config,
    bench_cpu.cu VDPF registrations)."""
    in_bits = 10
    alpha = 107
    g = groups.Bytes()
    key = tuple(int(v) for v in rng.integers(0, 2**32, size=4))
    h = Sha256(key)
    d = Vdpf(in_bits, group=g, prg=ChaCha(mul=2, nonce=(1, 2)), hashes=h)
    beta = blk.block([604, 0, 0, 0])
    s0s, cws, cs, ocw = d.gen_retry(rng, alpha, beta)
    xs = rng.integers(0, 2**in_bits, size=20, dtype=np.uint32)
    y0, pt0 = d.eval(0, s0s[0], cws, cs, ocw, xs)
    y1, pt1 = d.eval(1, s0s[1], cws, cs, ocw, xs)
    rec = np.asarray(g.add(g.from_block(y0), g.from_block(y1)))
    exp = np.where(np.asarray(xs) == alpha, 604, 0)
    assert np.array_equal(rec[:, 0], exp) and np.all(rec[:, 1:] == 0)
    assert d.verify(d.prove(pt0, cs), d.prove(pt1, cs))
