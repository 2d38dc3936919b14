import jax.numpy as jnp
import numpy as np

from fss_tpu import block as blk


def test_xor_and_lsb_roundtrip(rng):
    a = blk.block(rng.integers(0, 2**32, size=(7, 4)))
    b = blk.block(rng.integers(0, 2**32, size=(7, 4)))
    x = blk.xor(a, b)
    assert np.array_equal(np.asarray(blk.xor(x, b)), np.asarray(a))

    s1 = blk.set_lsb(a, True)
    assert np.all(np.asarray(blk.get_lsb(s1)) == 1)
    s0 = blk.set_lsb(a, False)
    assert np.all(np.asarray(blk.get_lsb(s0)) == 0)
    # Only the clamped bit differs.
    assert np.array_equal(np.asarray(s1[..., :3]), np.asarray(s0[..., :3]))
    assert np.all((np.asarray(s1[..., 3]) ^ np.asarray(s0[..., 3])) == 1)


def test_set_lsb_vector_bits(rng):
    a = blk.block(rng.integers(0, 2**32, size=(5, 4)))
    bits = jnp.asarray(np.array([0, 1, 1, 0, 1], dtype=np.uint32))
    s = blk.set_lsb(a, bits)
    assert np.array_equal(np.asarray(blk.get_lsb(s)), np.asarray(bits))


def test_pack_int_roundtrip():
    for v in [0, 1, 2**32 - 1, 2**64 + 12345, (1 << 127) - 1]:
        assert blk.unpack_int(blk.pack_int(v)) == v


def test_input_bits_msb_first():
    x = 0b1011001
    lanes = blk.pack_inputs(x, 7)
    bits = np.asarray(blk.input_bits_msb_first(lanes, 7))
    assert list(bits) == [1, 0, 1, 1, 0, 0, 1]

    # Cross the 32-bit lane boundary.
    big = (1 << 100) | (1 << 40) | 3
    lanes = blk.pack_inputs(big, 128)
    bits = np.asarray(blk.input_bits_msb_first(lanes, 128))
    val = int("".join(str(b) for b in bits), 2)
    assert val == big


def test_pack_inputs_u32_array(rng):
    xs = rng.integers(0, 2**16, size=17, dtype=np.uint32)
    lanes = np.asarray(blk.pack_inputs(jnp.asarray(xs), 16))
    assert lanes.shape == (17, 4)
    assert np.array_equal(lanes[:, 0], xs)
    assert np.all(lanes[:, 1:] == 0)


def test_masked_xor(rng):
    a = blk.block(rng.integers(0, 2**32, size=(6, 4)))
    d = blk.block(rng.integers(0, 2**32, size=(6, 4)))
    cond = jnp.asarray(np.array([1, 0, 1, 0, 0, 1], dtype=np.uint32))
    out = np.asarray(blk.masked_xor(cond, a, d))
    exp = np.where(np.asarray(cond)[:, None].astype(bool),
                   np.asarray(a) ^ np.asarray(d), np.asarray(a))
    assert np.array_equal(out, exp)


def test_map_rows_chunked_equals_direct(rng):
    a = blk.block(rng.integers(0, 2**32, size=(32, 4)))
    b = blk.block(rng.integers(0, 2**32, size=(32, 4)))

    def f(args):
        x, y = args
        return blk.xor(x, y), x[:, 0] + y[:, 1]

    direct = f((a, b))
    chunked = blk.map_rows(f, (a, b), 32, 8)
    for d, c in zip(direct, chunked):
        assert np.array_equal(np.asarray(d), np.asarray(c))
    # non-divisible and small batches fall through to one call
    small = blk.map_rows(f, (a, b), 32, 40)
    odd = blk.map_rows(f, (a, b), 32, 7)
    for d, c, o in zip(direct, small, odd):
        assert np.array_equal(np.asarray(d), np.asarray(c))
        assert np.array_equal(np.asarray(d), np.asarray(o))


def test_map_rows_host_equals_direct(rng):
    a = blk.block(rng.integers(0, 2**32, size=(32, 4)))
    b = blk.block(rng.integers(0, 2**32, size=(32, 4)))

    def f(args):
        x, y = args
        return blk.xor(x, y), x[:, 0] + y[:, 1]

    direct = f((a, b))
    for mr in (8, 7, 40):
        out = blk.map_rows_host(f, (a, b), 32, mr)
        for d, c in zip(direct, out):
            assert np.array_equal(np.asarray(d), np.asarray(c)), mr
