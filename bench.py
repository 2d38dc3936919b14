"""Headline benchmark: batched DPF Eval throughput on one TPU chip.

Mirrors the reference's GPU benchmark shape (src/bench_gpu.cu:70-93): 2^20
independent keys, each evaluated at one point, 16-bit domain, ChaCha PRG,
Uint group. Keys are staged on device before the timed region (as the CUDA
bench stages via cudaMemcpy, bench_gpu.cu:245-278); the timed region is the
fused Pallas eval kernel plus group finalize. A scalar checksum is fetched
after the iteration loop so the measurement covers real device execution
(device timers are not exposed through the TPU tunnel).

Prints ONE JSON line. vs_baseline is relative to the north-star floor of
1e8 evals/s/chip (BASELINE.json). `python bench.py --all` adds per-domain
numbers on stderr.
"""

import json
import sys
import time

import numpy as np

BASELINE_EVALS_PER_S = 1e8
IN_BITS = 16
LOG2_BATCH = 20


def _bench_dpf_eval(in_bits: int, log2_batch: int, iters: int = 16):
    import jax
    import jax.numpy as jnp
    from fss_tpu import block as blk
    from fss_tpu import groups
    from fss_tpu.ops import dpf_pallas
    from fss_tpu.prg.chacha import ChaCha
    from fss_tpu.schemes import dpf as _dpf

    B = 1 << log2_batch
    nonce = (0x0F0F0F0F, 0xF0F0F0F0)
    g = groups.Uint(32)
    prg = ChaCha(mul=2, nonce=nonce)
    rng = np.random.default_rng(42)

    s0s = jnp.asarray(blk.block(rng.integers(0, 2**32, size=(B, 2, 4))))
    alphas = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    betas = jnp.asarray(blk.block(rng.integers(0, 2**32, size=(B, 4))))
    xs = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)

    # Key generation on device (batched scan), outside the timed region.
    gen = jax.jit(jax.vmap(
        lambda s, a, b: _dpf.gen(prg, g, in_bits, s,
                                 blk.pack_inputs(a, in_bits), b)))
    cws = gen(s0s, alphas, betas)
    seeds4, cws_t, xs2, ocw, _ = jax.jit(
        dpf_pallas.pack_keys, static_argnames=("in_bits", "block_rows"))(
            s0s[:, 0], cws, xs, in_bits=in_bits)

    @jax.jit
    def step(seeds4, cws_t, xs2, ocw):
        so, t = dpf_pallas.eval_packed(seeds4, cws_t, xs2, in_bits=in_bits,
                                       party=0, nonce=nonce)
        y = dpf_pallas.finalize(g, 0, so, t, ocw, B)
        return jnp.sum(y[:, 0])

    chk = step(seeds4, cws_t, xs2, ocw)
    _ = int(chk)  # warm-up: compile + one full execution

    # The device queue is FIFO: fetching the LAST iteration's checksum
    # forces completion of all prior iterations. Per-iteration fetches
    # would add a host<->device round trip to every iteration (the TPU
    # here sits behind a network tunnel, so that RTT is large).
    t0 = time.perf_counter()
    for _ in range(iters):
        chk = step(seeds4, cws_t, xs2, ocw)
    _ = int(chk)
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
            v, _ = _bench_dpf_eval(ib, LOG2_BATCH, iters=8)
            print(json.dumps({
                "metric": f"dpf_eval_chacha_uint_{ib}bit",
                "value": round(v, 1), "unit": "evals/s/chip",
                "vs_baseline": round(v / BASELINE_EVALS_PER_S, 4)}),
                file=sys.stderr)


if __name__ == "__main__":
    main()
