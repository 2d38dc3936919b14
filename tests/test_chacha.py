import jax
import numpy as np

from fss_tpu import block as blk
from fss_tpu.prg.chacha import ChaCha, chacha_prg_reference

NONCE = (0x12345678, 0x9ABCDEF0)


def test_matches_numpy_reference_all_muls(rng):
    seeds = rng.integers(0, 2**32, size=(32, 4), dtype=np.uint32)
    for mul in (1, 2, 4):
        prg = ChaCha(mul=mul, nonce=NONCE)
        outs = prg(blk.block(seeds))
        assert len(outs) == mul
        got = np.stack([np.asarray(o) for o in outs], axis=1)  # [B, mul, 4]
        for b in range(seeds.shape[0]):
            exp = chacha_prg_reference(seeds[b], NONCE, mul)
            assert np.array_equal(got[b], exp), f"mul={mul} batch={b}"


def test_deterministic_and_nonce_sensitivity(rng):
    seeds = blk.block(rng.integers(0, 2**32, size=(4, 4)))
    a = ChaCha(mul=2, nonce=NONCE)(seeds)
    b = ChaCha(mul=2, nonce=NONCE)(seeds)
    assert all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))
    c = ChaCha(mul=2, nonce=(1, 2))(seeds)
    assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))


def test_output_diffusion(rng):
    # Flipping one seed bit should change ~half the output bits.
    seed = rng.integers(0, 2**32, size=(1, 4), dtype=np.uint32)
    seed2 = seed.copy()
    seed2[0, 0] ^= 1
    prg = ChaCha(mul=2, nonce=NONCE)
    o1 = np.asarray(prg(blk.block(seed))[0])
    o2 = np.asarray(prg(blk.block(seed2))[0])
    diff = bin(int.from_bytes((o1 ^ o2).tobytes(), "little")).count("1")
    assert 30 < diff < 98


def test_jit_and_vmap_consistency(rng):
    seeds = blk.block(rng.integers(0, 2**32, size=(8, 4)))
    prg = ChaCha(mul=4, nonce=NONCE)
    eager = prg(seeds)
    jitted = jax.jit(lambda s: prg(s))(seeds)
    for e, j in zip(eager, jitted):
        assert np.array_equal(np.asarray(e), np.asarray(j))
