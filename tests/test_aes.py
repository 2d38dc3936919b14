"""AES-128-MMO PRG tests: FIPS-197 vector, NumPy-oracle cross-check, and
DPF/DCF property tests under the AES PRG (mirroring the reference's
AES-PRG fixtures in src/dpf_test.cu / the samples' canonical config)."""

import numpy as np
import pytest

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.api import Dcf, Dpf
from fss_tpu.prg.aes import Aes128Mmo, aes128_encrypt_reference

# The reference README's canonical AES keys (README.md:118-121).
KEY0 = bytes(range(1, 17))
KEY1 = bytes(range(16, 0, -1))


def test_fips197_vector():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    assert aes128_encrypt_reference(key, pt) == ct


def test_mmo_vs_oracle(rng):
    prg = Aes128Mmo(mul=2, keys=(KEY0, KEY1))
    seeds = blk.block(rng.integers(0, 2**32, size=(5, 4)))
    outs = prg(seeds)
    assert len(outs) == 2
    seeds_np = np.asarray(seeds)
    for lane, key in enumerate((KEY0, KEY1)):
        got = np.asarray(outs[lane])
        for i in range(5):
            seed_bytes = seeds_np[i].astype("<u4").tobytes()
            enc = aes128_encrypt_reference(key, seed_bytes)
            exp = np.frombuffer(enc, dtype="<u4") ^ seeds_np[i]
            assert np.array_equal(got[i], exp), f"lane {lane} row {i}"


def test_dpf_with_aes_prg(rng):
    """The reference samples' canonical config: 8-bit domain, AES-MMO,
    Bytes group, alpha=42 (samples/dpf_dcf_cpu.cu:35-59)."""
    in_bits = 8
    alpha = 42
    g = groups.Bytes()
    d = Dpf(in_bits, group=g, prg=Aes128Mmo(mul=2, keys=(KEY0, KEY1)))
    s0s = blk.block([[0x11111111, 0x22222222, 0x33333333, 0x44444440],
                     [0x55555555, 0x66666666, 0x77777777, 0x88888880]])
    beta = blk.block([7, 0, 0, 0])
    cws = d.gen(s0s, alpha, beta)
    xs = np.arange(2**in_bits, dtype=np.uint32)
    y0 = np.asarray(d.eval(0, s0s[0], cws, xs))
    y1 = np.asarray(d.eval(1, s0s[1], cws, xs))
    rec = y0 ^ y1
    nz = np.nonzero(rec.any(-1))[0]
    assert list(nz) == [alpha]
    assert np.array_equal(rec[alpha], np.asarray(beta)[:])
    # eval_all path agrees
    a0 = np.asarray(d.eval_all(0, s0s[0], cws))
    assert np.array_equal(a0, y0)


def test_dcf_with_aes_prg(rng):
    in_bits = 8
    alpha = 107
    g = groups.Uint(32)
    keys4 = tuple(bytes([i] * 16) for i in range(1, 5))
    d = Dcf(in_bits, group=g, prg=Aes128Mmo(mul=4, keys=keys4), pred="lt")
    s0s = blk.block(rng.integers(0, 2**32, size=(2, 4)))
    beta = blk.block([604, 0, 0, 0])
    cws = d.gen(s0s, alpha, beta)
    xs = np.arange(2**in_bits, dtype=np.uint32)
    y0 = d.eval(0, s0s[0], cws, xs)
    y1 = d.eval(1, s0s[1], cws, xs)
    rec = np.asarray(g.add(g.from_block(y0), g.from_block(y1)))
    assert np.all(rec[:alpha, 0] == 604) and np.all(rec[:alpha, 1:] == 0)
    assert np.all(rec[alpha:] == 0)


def test_bitsliced_backend_matches_table(rng):
    from fss_tpu.prg.aes_bitsliced import aes128_encrypt_blocks
    seeds = blk.block(rng.integers(0, 2**32, size=(300, 4)))
    table = Aes128Mmo(mul=2, keys=(KEY0, KEY1), backend="table")
    sliced = Aes128Mmo(mul=2, keys=(KEY0, KEY1), backend="bitsliced")
    ot = table(seeds)
    ob = sliced(seeds)
    for lane in range(2):
        assert np.array_equal(np.asarray(ot[lane]), np.asarray(ob[lane]))


def test_bitsliced_fips197():
    from fss_tpu.prg.aes_bitsliced import aes128_encrypt_blocks
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = np.frombuffer(
        bytes.fromhex("00112233445566778899aabbccddeeff"), dtype="<u4")
    out = np.asarray(aes128_encrypt_blocks(key, pt[None, :]))
    assert out[0].astype("<u4").tobytes() == bytes.fromhex(
        "69c4e0d86a7b0430d8cdb78070b4c55a")
