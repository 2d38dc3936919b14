"""Pin the DPF eval kernel's roofline with measured numbers.

docs/benchmarks.md's op-count roofline had a 67%..>100% band because the
cost of a 32-bit rotate on the VPU was unknown (1 op if the compiler emits
a funnel shift / native rotate, 3 if it stays (x<<n)|(x>>32-n)). Two
measurements collapse the band:

1. **Rotate cost** — two microkernels, identical shape and trip count, one
   doing dependent rotates and one doing dependent adds. The time ratio IS
   the rotate cost in add-units (the add chain runs at 1 op/lane/cycle).
2. **ChaCha slope** — the fused DPF eval kernel timed at rounds = 8, 12,
   16, 20. d(time)/d(double-round) isolates the pure quarter-round stream
   from the per-level fixed work (CW application, child select, loads),
   giving a measured ops/s for the dominant instruction mix.

Run on the real chip: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/roofline.py
Prints a JSON summary; paste into docs/benchmarks.md "Reading the
numbers". Reference analog: the ptxas register/occupancy report
(`make ptx_info` there) pins its kernel cost model the same way.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

V5E_U32_OPS_PER_S = 3.9e12  # nominal 8x128 VPU @ ~940 MHz, 4 ALUs


def _time_fn(fn, args, iters=32):
    chk = fn(*args)
    chk.block_until_ready()
    _ = np.asarray(chk)
    t0 = time.perf_counter()
    for _ in range(iters):
        chk = fn(*args)
    _ = np.asarray(chk)  # end-of-FIFO fetch
    return (time.perf_counter() - t0) / iters


def micro_op_cost(op: str, k: int = 4096, rows: int = 512,
                  iters: int = 32) -> float:
    """Seconds per (k ops on a [rows, 128] tile): a dependent chain of
    ``op`` inside one kernel, so issue rate = 1 chain-op per step."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        def body(_, x):
            if op == "add":
                return x + np.uint32(0x9E3779B9)
            if op == "xor":
                return x ^ np.uint32(0x9E3779B9)
            if op == "rot":
                return (x << np.uint32(13)) | (x >> np.uint32(19))
            if op == "addrot":  # 1 add + 1 rotate, the QR's critical mix
                y = x + np.uint32(0x9E3779B9)
                return (y << np.uint32(13)) | (y >> np.uint32(19))
            raise ValueError(op)

        o_ref[:] = jax.lax.fori_loop(0, k, body, x_ref[:])

    @jax.jit
    def run(x):
        return jnp.sum(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x))

    x = jnp.arange(rows * 128, dtype=jnp.uint32).reshape(rows, 128)
    return _time_fn(run, (x,), iters)


def chacha_slope(in_bits: int = 16, log2_batch: int = 19, iters: int = 16):
    """Time the fused DPF eval kernel at several ChaCha round counts;
    return {rounds: seconds_per_iter}. Keys are generated at matching
    rounds so the kernel is exercised on well-formed inputs (outputs are
    not checked here — correctness is scripts/verify_tpu.py's job)."""
    import jax
    import jax.numpy as jnp
    from fss_tpu import block as blk
    from fss_tpu import groups
    from fss_tpu.ops import dpf_pallas

    B = 1 << log2_batch
    nonce = (0x0F0F0F0F, 0xF0F0F0F0)
    g = groups.Uint(32)
    rng = np.random.default_rng(3)
    s0 = jnp.asarray(blk.block(rng.integers(0, 2**32, size=(B, 4))))
    cws = jnp.asarray(blk.block(
        rng.integers(0, 2**32, size=(B, in_bits + 1, 8))))
    xs = rng.integers(0, 2**in_bits, size=B, dtype=np.uint32)
    seeds4, cws_t, xs2, ocw, _ = jax.jit(
        dpf_pallas.pack_keys, static_argnames=("in_bits", "block_rows"))(
            s0, cws, xs, in_bits=in_bits)

    out = {}
    for rounds in (8, 12, 16, 20):
        @functools.partial(jax.jit, static_argnames=())
        def step(seeds4, cws_t, xs2, ocw, _r=rounds):
            so, t = dpf_pallas.eval_packed(
                seeds4, cws_t, xs2, in_bits=in_bits, party=0,
                nonce=nonce, rounds=_r)
            y = dpf_pallas.finalize(g, 0, so, t, ocw, B)
            return jnp.sum(y[:, 0])

        out[rounds] = _time_fn(step, (seeds4, cws_t, xs2, ocw), iters)
    return out, B


def main():
    import jax
    platform = jax.devices()[0].platform
    if platform != "tpu":
        print(f"roofline: needs the real TPU (got {platform})",
              file=sys.stderr)
        return 1

    # 1. op costs
    k, rows = 4096, 512
    costs = {op: micro_op_cost(op, k, rows) for op in
             ("add", "xor", "rot", "addrot")}
    lanes = rows * 128
    res = {"platform": platform, "tile": [rows, 128], "chain_ops": k}
    for op, t in costs.items():
        res[f"{op}_ns_per_chain_op"] = t / k * 1e9
        res[f"{op}_ops_per_s"] = lanes * k / t
    res["rot_cost_in_adds"] = costs["rot"] / costs["add"]

    # 2. ChaCha slope
    times, B = chacha_slope()
    res["eval_s_per_iter"] = {str(r): t for r, t in times.items()}
    # linear fit time = a * double_rounds + b
    ys = np.array([times[r] for r in sorted(times)])
    xs = np.array(sorted(r // 2 for r in times))
    a, b = np.polyfit(xs, ys, 1)
    # per eval: in_bits levels x 8 QRs per double round
    qr_per_eval_per_dr = 16 * 8
    s_per_qr = a / (B * qr_per_eval_per_dr)
    res["ns_per_qr_per_eval"] = s_per_qr * 1e9
    # QR = 4 adds + 4 xors + 4 rotates
    rot_c = res["rot_cost_in_adds"]
    ops_per_qr = 4 + 4 + 4 * rot_c
    res["measured_u32_ops_per_s"] = ops_per_qr / s_per_qr
    res["pct_of_nominal_vpu"] = round(
        100 * ops_per_qr / s_per_qr / V5E_U32_OPS_PER_S, 1)
    res["fixed_per_eval_ns"] = b / B * 1e9

    print(json.dumps(res, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
