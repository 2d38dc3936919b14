"""Batched DPF on TPU (mirror of reference samples/dpf_dcf_gpu.cu).

1024 independent key instances generated and evaluated in one batch — the
reference's per-CUDA-thread loop becomes a vmapped gen plus the fused
Pallas eval kernel. Run (on a TPU host): python samples/dpf_batched_tpu.py
"""

import numpy as np

from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.api import Dpf
from fss_tpu.ops import dpf_pallas
from fss_tpu.prg.chacha import ChaCha

IN_BITS = 16
B = 1024
NONCE = (0x12345678, 0x9ABCDEF0)


def main():
    import jax

    g = groups.Uint(32)
    dpf = Dpf(IN_BITS, group=g, prg=ChaCha(mul=2, nonce=NONCE))
    rng = np.random.default_rng(1)

    s0s = blk.block(rng.integers(0, 2**32, size=(B, 2, 4)))
    alphas = rng.integers(0, 2**IN_BITS, size=B, dtype=np.uint32)
    betas = blk.block(rng.integers(0, 2**32, size=(B, 4)))
    cws = dpf.gen_batch(s0s, alphas, betas)

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        # Fused kernel path: pack once, evaluate at the alphas.
        y0 = dpf_pallas.eval_points(NONCE, g, IN_BITS, 0, s0s[:, 0], cws,
                                    alphas)
        y1 = dpf_pallas.eval_points(NONCE, g, IN_BITS, 1, s0s[:, 1], cws,
                                    alphas)
    else:
        y0 = dpf.eval(0, s0s[:, 0], cws, alphas)
        y1 = dpf.eval(1, s0s[:, 1], cws, alphas)

    rec = np.asarray(g.add(g.from_block(np.asarray(y0)),
                           g.from_block(np.asarray(y1))))
    exp = np.asarray(g.from_block(blk.clear_lsb(betas)))
    assert np.array_equal(rec, exp)
    path = "Pallas kernel" if on_tpu else "XLA"
    print(f"{B} instances evaluated at their alphas via {path}: all "
          f"reconstruct to beta. OK")


if __name__ == "__main__":
    main()
