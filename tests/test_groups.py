"""Group axiom tests, mirroring reference src/group_test.cu:39-93."""

import numpy as np
import pytest

from fss_tpu import block as blk
from fss_tpu import groups

GROUPS = [
    groups.Bytes(),
    groups.Uint(8),
    groups.Uint(16),
    groups.Uint(32),
    groups.Uint(64),
    groups.Uint(128, mod=1 << 127),
    groups.Uint(32, mod=4294967291),  # largest 32-bit prime
    groups.Uint(16, mod=65521),
    groups.Uint(64, mod=(1 << 61) - 1),  # Mersenne prime
    groups.Uint(128, mod=(1 << 127) - 1),  # Mersenne prime
    groups.Uint(8, mod=251),
]


def _rand_elems(g, rng, n=64):
    bufs = blk.block(rng.integers(0, 2**32, size=(n, 4)))
    bufs = blk.clear_lsb(bufs)
    return g.from_block(bufs)


@pytest.mark.parametrize("g", GROUPS, ids=lambda g: g.name)
def test_associativity(g, rng):
    a, b, c = (_rand_elems(g, rng) for _ in range(3))
    lhs = np.asarray(g.add(g.add(a, b), c))
    rhs = np.asarray(g.add(a, g.add(b, c)))
    assert np.array_equal(lhs, rhs)


@pytest.mark.parametrize("g", GROUPS, ids=lambda g: g.name)
def test_identity(g, rng):
    a = _rand_elems(g, rng)
    zero = g.zero(a.shape[:-1])
    assert np.array_equal(np.asarray(g.add(a, zero)), np.asarray(a))
    assert np.array_equal(np.asarray(g.add(zero, a)), np.asarray(a))


@pytest.mark.parametrize("g", GROUPS, ids=lambda g: g.name)
def test_inverses(g, rng):
    a = _rand_elems(g, rng)
    zero = g.zero(a.shape[:-1])
    assert np.array_equal(np.asarray(g.add(a, g.neg(a))), np.asarray(zero))
    assert np.array_equal(np.asarray(g.add(g.neg(a), a)), np.asarray(zero))


@pytest.mark.parametrize("g", GROUPS, ids=lambda g: g.name)
def test_from_into_roundtrip(g, rng):
    a = _rand_elems(g, rng)
    back = g.from_block(g.into_block(a))
    assert np.array_equal(np.asarray(back), np.asarray(a))


def test_uint_matches_python_ints(rng):
    """Cross-check lane arithmetic against Python bignum arithmetic."""
    for bits, mod in [(8, 0), (16, 0), (32, 0), (64, 0),
                      (32, 4294967291), (64, (1 << 61) - 1),
                      (128, 1 << 127), (128, (1 << 127) - 1)]:
        g = groups.Uint(bits, mod=mod)
        eff_mod = mod if mod else (1 << bits)
        for _ in range(20):
            raw_a = (int(rng.integers(0, 2**63))
                     | (int(rng.integers(0, 2**63)) << 64))
            raw_b = (int(rng.integers(0, 2**63))
                     | (int(rng.integers(0, 2**63)) << 64))
            raw_a &= ~1  # clamped bit zero
            raw_b &= ~1
            buf_a = blk.block(blk.pack_int(raw_a))
            buf_b = blk.block(blk.pack_int(raw_b))
            a = g.from_block(buf_a)
            b = g.from_block(buf_b)

            if bits == 128:
                exp_a = ((raw_a & ((1 << 96) - 1))
                         | (((raw_a >> 97)) << 96)) % eff_mod
            else:
                exp_a = (raw_a & ((1 << bits) - 1)) % eff_mod
            assert groups.to_int(g, a) == exp_a, (bits, mod)

            got_sum = groups.to_int(g, g.add(a, b))
            exp_sum = (groups.to_int(g, a) + groups.to_int(g, b)) % eff_mod
            assert got_sum == exp_sum, (bits, mod)

            got_neg = groups.to_int(g, g.neg(a))
            exp_neg = (-groups.to_int(g, a)) % eff_mod
            assert got_neg == exp_neg, (bits, mod)


def test_u128_clamped_bit_encoding():
    """Into()/From() packing around the clamped bit (group/uint.cuh:58-81)."""
    g = groups.Uint(128, mod=1 << 127)
    val = (0x7FFFFFFF << 96) | 0xAABBCCDD
    lanes = np.array([(val >> (32 * i)) & 0xFFFFFFFF for i in range(4)],
                     dtype=np.uint32)
    buf = np.asarray(g.into_block(blk.block(lanes)))
    assert buf[3] == (val >> 96) << 1 & 0xFFFFFFFF
    back = g.from_block(blk.block(buf))
    assert groups.to_int(g, back) == val
