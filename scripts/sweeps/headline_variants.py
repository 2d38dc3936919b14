"""One-shot bounded experiment on the headline eval kernel's last ~15%
(VERDICT r4 weak #4 / next-round #7): the measured roofline says the QR
stream runs at 85.5% of the VPU u32 ceiling with ~3.3 ns/eval of fixed
scheduling overhead, and block_rows/unroll/select-rewrites were all
within +-3%. Two structurally different levers remain measurable without
a kernel rewrite:

  1. cw streaming volume: the wire-format key streams 8 words/level of
     which the kernel reads 5 — the packed key layout (cw_words=5) cuts
     cw HBM traffic 37.5%. If the walk is at all HBM-bound, this shows.
  2. grid scheduling: unroll=True turns the per-level fori_loop into
     straight-line code (static cw indexing); combined with each
     block_rows in {16, 32, 64} x each cw layout.

Prints one JSON line per variant plus a closing verdict line. If the
best variant is within noise (<5%) of the wire-format baseline, 85.5%
MFU is declared the accepted ceiling (docs/benchmarks.md closes the
optimization chapter on that basis).

Run via:
  python scripts/tpu_campaign.py --sweep scripts/sweeps/headline_variants.py
"""

import json

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
nonce = (0x0F0F0F0F, 0xF0F0F0F0)
g = groups.Uint(32)
prg = ChaCha(mul=2, nonce=nonce)
rng = np.random.default_rng(42)

s0s = jnp.asarray(blk.block(rng.integers(0, 2**32, size=(B, 2, 4))))
alphas = rng.integers(0, 2**ib, size=B, dtype=np.uint32)
betas = jnp.asarray(blk.block(rng.integers(0, 2**32, size=(B, 4))))
xs = rng.integers(0, 2**ib, size=B, dtype=np.uint32)

# Keys in both layouts (gen outside timing).
genj = jax.jit(jax.vmap(lambda s, a, b: _dpf.gen(
    prg, g, ib, s, blk.pack_inputs(a, ib), b)))
cws = genj(s0s, alphas, betas)
cws_t5, ocw5, _ = k.gen_batch_packed(nonce, g, ib, s0s,
                                     jnp.asarray(alphas), betas)

# On-device equality gate: every variant must reproduce the golden-
# verified baseline's bytes on a probe slice before timing means
# anything.
probe = slice(0, 1 << 12)
base = np.asarray(k.eval_points(nonce, g, ib, 0, s0s[probe, 0],
                                cws[probe], xs[probe]))
got5 = np.asarray(k.eval_points_packedkey(
    nonce, g, ib, 0, s0s[:, 0], cws_t5, ocw5, xs)[probe])
eq = np.array_equal(base, got5)
print(json.dumps({"packed_matches_wire": bool(eq)}))
if not eq:
    raise SystemExit("packed-key eval mismatches the wire baseline — "
                     "refusing to time it")

results = []
chk_base = None
for layout, cw_arr in (("wire8", None), ("packed5", cws_t5)):
    for block_rows in (16, 32, 64):
        if cw_arr is None:
            seeds4, cws_t, xs2, ocw, _ = jax.jit(
                k.pack_keys, static_argnames=("in_bits", "block_rows"))(
                    s0s[:, 0], cws, jnp.asarray(xs), in_bits=ib,
                    block_rows=block_rows)
        else:
            # The packed key's T is fixed by gen; repack only seeds/xs.
            T = cw_arr.shape[2]
            seeds4 = jnp.transpose(
                jnp.pad(s0s[:, 0], ((0, T * 128 - B), (0, 0))),
                (1, 0)).reshape(4, T, 128)
            xs2 = jnp.pad(jnp.asarray(xs), (0, T * 128 - B)).reshape(
                T, 128)
            cws_t, ocw = cw_arr, ocw5
            if T % block_rows:
                continue
        seeds4, cws_t, xs2, ocw = map(jax.device_put,
                                      (seeds4, cws_t, xs2, ocw))
        for unroll in (False, True):
            def step(s4, ct, x2, oc, _br=block_rows, _u=unroll):
                so, t = k.eval_packed(s4, ct, x2, in_bits=ib, party=0,
                                      nonce=nonce, block_rows=_br,
                                      unroll=_u)
                y = k.finalize(g, 0, so, t, oc, B)
                return jnp.sum(y[:, 0])

            try:
                # Every variant must reproduce the SAME finalize
                # checksum (identical keys/points) before it is timed —
                # a miscompiled unrolled kernel must not emit
                # plausible-looking throughput.
                chk = int(jax.jit(step)(seeds4, cws_t, xs2, ocw))
                if chk_base is None:
                    chk_base = chk
                elif chk != chk_base:
                    print(json.dumps({"layout": layout,
                                      "block_rows": block_rows,
                                      "unroll": unroll,
                                      "error": "checksum mismatch"}))
                    continue
                v = bench._timeit(jax.jit(step),
                                  (seeds4, cws_t, xs2, ocw), B, iters=6)
            except Exception as e:  # one bad variant must not end the sweep
                print(json.dumps({"layout": layout,
                                  "block_rows": block_rows,
                                  "unroll": unroll,
                                  "error": str(e)[:200]}))
                continue
            row = {"layout": layout, "block_rows": block_rows,
                   "unroll": unroll, "evals_per_s": round(v, 1)}
            results.append(row)
            print(json.dumps(row))

if results:
    base_rows = [r for r in results if r["layout"] == "wire8"
                 and r["block_rows"] == 32 and not r["unroll"]]
    best = max(results, key=lambda r: r["evals_per_s"])
    baseline = base_rows[0]["evals_per_s"] if base_rows else None
    verdict = {
        "baseline_wire8_br32_rolled": baseline,
        "best": best,
        "gain_pct": (round(100 * (best["evals_per_s"] / baseline - 1), 2)
                     if baseline else None),
    }
    print(json.dumps({"verdict": verdict}))
