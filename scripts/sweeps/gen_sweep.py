"""One-shot sweep: DPF Gen kernel config sweep on the real chip.
Run via ``python scripts/tpu_campaign.py --sweep scripts/sweeps/
gen_sweep.py`` so it rides an existing claim exactly once (it used to
live in scripts/tpu_jobs/, where every campaign re-ran it).

VERDICT r2 weak #4: the gen kernels measure ~55-57 M keys/s against a
~80 M/s roofline (two ChaCha permutations per level = half the eval
kernel's rate, and the eval kernel hits ~100% of its own). Suspects the
eval-kernel sweep never covered for gen: block_rows, and the dynamic
per-level CW store (c_ref[i] inside fori_loop) that unroll=True turns
into static indexing. Prints one JSON line per config.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import bench
from fss_tpu import block as blk
from fss_tpu import groups
from fss_tpu.ops import dpf_pallas as k
from fss_tpu.prg.chacha import ChaCha
from fss_tpu.schemes import dpf as _dpf

B, ib = 1 << 19, 16
nonce = (1, 2)
rng = np.random.default_rng(42)
s0s = jnp.asarray(blk.block(rng.integers(0, 2**32, size=(B, 2, 4))))
alphas = rng.integers(0, 2**ib, size=B, dtype=np.uint32)

# On-device equality gate: unroll=True must be byte-identical to the
# (golden-verified) rolled kernel before its timings mean anything.
_s8, _a2, _ = k.pack_gen_inputs(s0s[:1 << 12], alphas[:1 << 12], ib)
_r = k.gen_packed(_s8, _a2, ib, nonce)
_u = k.gen_packed(_s8, _a2, ib, nonce, unroll=True)
_eq = bool(jax.jit(lambda a, b: jnp.all(jnp.array(
    [jnp.array_equal(x, y) for x, y in zip(a, b)])))(_r, _u))
print(json.dumps({"unroll_matches_rolled": _eq}))
if not _eq:
    # A miscompiled unrolled kernel must not emit plausible-looking
    # throughput rows (the campaign's _exec_job records the exit).
    raise SystemExit("unroll=True mismatches the golden-verified rolled "
                     "kernel — refusing to time it")

for block_rows in (16, 32, 64):
    seeds8, a2, _ = k.pack_gen_inputs(s0s, alphas, ib,
                                      block_rows=block_rows)
    seeds8 = jax.device_put(seeds8)
    a2 = jax.device_put(a2)
    for unroll in (False, True):
        def step(s8, a2_, _br=block_rows, _u=unroll):
            outs = k.gen_packed(s8, a2_, ib, nonce, block_rows=_br,
                                unroll=_u)
            return jnp.sum(outs[0][0, 0, 0]) + jnp.sum(outs[3][0])

        t0 = time.perf_counter()
        v = bench._timeit(jax.jit(step), (seeds8, a2), B, iters=6)
        print(json.dumps({
            "cfg": {"block_rows": block_rows, "unroll": unroll},
            "keys_per_s": round(v, 1),
            "wall_s": round(time.perf_counter() - t0, 1)}))
