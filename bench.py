"""Headline benchmark: batched DPF Eval throughput on one TPU chip.

Mirrors the reference's GPU benchmark shape (src/bench_gpu.cu:70-93): 2^20
independent keys, each evaluated at one point, 16-bit domain, ChaCha PRG,
Uint group. Reports items/s; vs_baseline is relative to the north-star
floor of 1e8 evals/s/chip (BASELINE.json).

Prints ONE JSON line. Run standalone: `python bench.py` (uses the real TPU
via the default platform). Extra per-scheme numbers: `python bench.py --all`.
"""

import json
import sys
import time

import numpy as np

BASELINE_EVALS_PER_S = 1e8
IN_BITS = 16
LOG2_BATCH = 20


def _bench_dpf_eval(in_bits: int, log2_batch: int, iters: int = 8):
    import jax
    from fss_tpu import block as blk
    from fss_tpu import groups
    from fss_tpu.api import Dpf
    from fss_tpu.prg.chacha import ChaCha

    B = 1 << log2_batch
    rng = np.random.default_rng(42)
    d = Dpf(in_bits, group=groups.Uint(32),
            prg=ChaCha(mul=2, nonce=(0x0F0F0F0F, 0xF0F0F0F0)))

    # Per-instance keys, generated on device (batched scan).
    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    xs = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)

    cws = d.gen_batch(s0s, alphas, betas)
    cws.block_until_ready()
    s0 = jax.device_put(np.asarray(s0s[:, 0]))
    xs_d = jax.device_put(xs)

    # Warm up (compile).
    y = d.eval(0, s0, cws, xs_d)
    y.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(iters):
        y = d.eval(0, s0, cws, xs_d)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return B / dt, dt


def main():
    evals_per_s, dt = _bench_dpf_eval(IN_BITS, LOG2_BATCH)
    result = {
        "metric": f"dpf_eval_chacha_uint_{IN_BITS}bit_batch2e{LOG2_BATCH}",
        "value": round(evals_per_s, 1),
        "unit": "evals/s/chip",
        "vs_baseline": round(evals_per_s / BASELINE_EVALS_PER_S, 4),
    }
    print(json.dumps(result))

    if "--all" in sys.argv:
        for ib in (14, 16, 20):
            v, _ = _bench_dpf_eval(ib, LOG2_BATCH, iters=4)
            print(json.dumps({
                "metric": f"dpf_eval_chacha_uint_{ib}bit",
                "value": round(v, 1), "unit": "evals/s/chip",
                "vs_baseline": round(v / BASELINE_EVALS_PER_S, 4)}),
                file=sys.stderr)


if __name__ == "__main__":
    main()
