"""Native host-engine benchmark (reference src/bench_cpu.cu shapes).

Single-core DPF gen/eval/eval_all for the AES-NI and ChaCha PRGs at
20-bit domains, printed next to the reference's published numbers
(README.md:329-358 there). Run: JAX_PLATFORMS=cpu python scripts/bench_native.py
"""

import time

import numpy as np

from fss_tpu import native

REF = {  # reference single-core numbers (Xeon 8352V)
    ("eval", "aes"): 1704, ("eval", "chacha"): 44940,
    ("gen", "aes"): 3226,
}


def main():
    eng = native.engine()
    in_bits = 20
    rng = np.random.default_rng(1)
    keys = (bytes(range(1, 17)), bytes(range(16, 0, -1)))
    s0s = rng.integers(0, 2**32, size=(2, 4), dtype=np.uint32)
    beta = np.array([604, 0, 0, 0], dtype=np.uint32)
    print(f"AES-NI available: {eng.has_aesni}")

    configs = [("chacha", native.PRG_CHACHA, dict(nonce=(1, 2)))]
    if eng.has_aesni:
        configs.insert(0, ("aes", native.PRG_AES128_MMO,
                           dict(aes_keys=keys)))

    for label, kind, kw in configs:
        cws = eng.dpf_gen(in_bits, kind, native.GROUP_UINT, 32, s0s, 12345,
                          beta, **kw)
        xs = rng.integers(0, 2**in_bits, size=20000, dtype=np.uint64)
        t0 = time.perf_counter()
        eng.dpf_eval(in_bits, kind, native.GROUP_UINT, 32, 0, s0s[0], cws,
                     xs, **kw)
        dt = (time.perf_counter() - t0) / len(xs)
        ref = REF.get(("eval", label), "-")
        print(f"dpf eval     {label:7s} uint 20-bit: {dt*1e9:7.0f} ns/op"
              f"  (reference: {ref} ns)")

        n = 5000
        s0sb = rng.integers(0, 2**32, size=(n, 2, 4), dtype=np.uint32)
        alphas = rng.integers(0, 2**in_bits, size=n, dtype=np.uint64)
        betas = rng.integers(0, 2**32, size=(n, 4), dtype=np.uint32)
        t0 = time.perf_counter()
        eng.dpf_gen_batch(in_bits, kind, native.GROUP_UINT, 32, s0sb,
                          alphas, betas, **kw)
        dt = (time.perf_counter() - t0) / n
        ref = REF.get(("gen", label), "-")
        print(f"dpf gen      {label:7s} uint 20-bit: {dt*1e9:7.0f} ns/op"
              f"  (reference: {ref} ns)")

        t0 = time.perf_counter()
        eng.dpf_eval_all(in_bits, kind, native.GROUP_UINT, 32, 0, s0s[0],
                         cws, **kw)
        dt = time.perf_counter() - t0
        print(f"dpf eval_all {label:7s} uint 20-bit: {dt*1e3:7.1f} ms = "
              f"{2**in_bits/dt/1e6:.2f} M items/s "
              f"(reference aes: 166.8 ms / 6.29 M items/s)")


if __name__ == "__main__":
    main()
