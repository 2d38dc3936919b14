#!/usr/bin/env python
"""Isolated triage of the 2026-08-19 TPU worker crash in
``aes_pallas.dcf_eval_packed`` (bench row dcf_eval_aes_uint_16bit).

The crash ("TPU worker process crashed or restarted ... kernel fault")
killed the round-3 measurement campaign 6 rows in; a faulted worker
poisons the whole process backend, so this script's DRIVER mode runs
each escalating step as a SUBPROCESS and records rc + output tail to
``scripts/artifacts/triage_dcf_aes.jsonl`` — one crash cannot take down
the triage, and the artifact distinguishes a Mosaic kernel fault
(reproducible at a specific shape) from a pool flake (vanishes on
retry). Reference analog for checking device results for real:
samples/dpf_dcf_gpu.cu:137-166.

Steps, in order (driver stops bisecting once the culprit shape is
found):
  golden            verify_tpu DCF golden sweep on-chip (B=256 rows)
  single@2^15..19   bench-shaped batch, ONE dispatch, cross-checked
                    against the scheme-level XLA path on 4096 rows
  loop@2^19         the exact crash config (_loopify inner=8, iters=8)
  (on failure)      same batch at block_rows 4 and 16

Usage:
  python scripts/triage_dcf_aes.py                 # driver
  python scripts/triage_dcf_aes.py --step single --log2-batch 19 \
      [--block-rows 8] [--no-check]                # one step, one claim
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))
ART = REPO / "scripts" / "artifacts"
LOG = ART / "triage_dcf_aes.jsonl"

IB = 16
AES_KEYS4 = tuple(bytes(range(16 * i, 16 * (i + 1))) for i in range(4))
# CPU smoke-test of this script's own plumbing (Mosaic can't run off-TPU):
INTERPRET = os.environ.get("FSS_TRIAGE_INTERPRET", "") == "1"


def _build_inputs(log2_batch: int, block_rows: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fss_tpu import block as blk
    from fss_tpu import groups
    from fss_tpu.ops import aes_pallas as _aesk
    from fss_tpu.prg.aes import Aes128Mmo
    from fss_tpu.schemes import dcf as _dcfs

    g = groups.Uint(32)
    prgd4 = Aes128Mmo(mul=4, keys=AES_KEYS4)
    B = 1 << log2_batch
    rng = np.random.default_rng(42)
    s0sb = jnp.asarray(blk.block(rng.integers(0, 2**32, size=(B, 2, 4))))
    a_l = blk.pack_inputs(
        rng.integers(0, 2**IB, size=B, dtype=np.uint32), IB)
    betas = jnp.asarray(blk.block(rng.integers(0, 2**32, size=(B, 4))))
    xs = jnp.asarray(rng.integers(0, 2**IB, size=B, dtype=np.uint32))
    genj = jax.jit(jax.vmap(
        lambda s, a, b: _dcfs.gen(prgd4, g, IB, "lt", s, a, b)))
    cws = blk.map_rows_host(lambda t: genj(*t), (s0sb, a_l, betas),
                            B, 1 << 17)
    sp, cwp, xp, vl, _ = jax.jit(
        _aesk.dcf_pack_eval, static_argnames=("in_bits", "block_rows"))(
            s0sb[:, 0], cws, xs, in_bits=IB, block_rows=block_rows)
    return g, prgd4, s0sb, cws, xs, (sp, cwp, xp, vl), B


def _make_step_fn(g, B: int, block_rows: int):
    """The bench row's jitted step (bench.py fdca), block_rows knobbed."""
    import jax
    import jax.numpy as jnp
    from fss_tpu.ops import aes_pallas as _aesk

    @jax.jit
    def fdca(sp, cwp, xp, vl):
        vo, so, to = _aesk.dcf_eval_packed(
            sp, cwp, xp, in_bits=IB, party=0, keys=AES_KEYS4,
            group_is_xor=False, group_bits=32, block_rows=block_rows,
            interpret=INTERPRET)
        v_raw, _ = _aesk.unpack_out(vo, to, B)
        s, tb = _aesk.unpack_out(so, to, B)
        vlb = vl if vl.shape[0] == 1 else vl[:B]
        term = g.from_block(s)
        term = jnp.where(tb.astype(jnp.bool_)[:, None],
                         g.add(term, g.from_block(vlb)), term)
        y = g.add(g.from_block(v_raw), term)
        return jnp.sum(g.into_block(y)[:, 0])

    return fdca


def _bracket_step(args) -> None:
    """Bracket probes separating the 2^19 crash into pack vs kernel vs
    unpack. 2026-08-19 second finding: the crash survives dispatch
    chunking (max_t=32), so the per-pallas_call shape is NOT the
    trigger; the suspects are the pack's ~1 GB byte-plane transpose
    graph and the double unpack at B=2^19.

      pack      build+materialize dcf_pack_eval at 2^19 only
      ktile     pack at 2^17, device-tile inputs 4x to the 2^19 shape,
                run the (chunked) kernel, fetch a RAW word checksum —
                no unpack, no pack at 2^19
      unpacktile  ktile + the full unpack/finalize path
    """
    import jax
    import jax.numpy as jnp
    from fss_tpu.ops import aes_pallas as _aesk

    lb = args.log2_batch
    t0 = time.perf_counter()
    if args.step == "gen":
        # Vmapped mul=4 AES gen ALONE at the full batch (the pack probe
        # ran gen at 2^19 inside _build_inputs, so its crash did not
        # separate gen from pack).
        import numpy as np
        from fss_tpu import block as blk
        from fss_tpu import groups
        from fss_tpu.prg.aes import Aes128Mmo
        from fss_tpu.schemes import dcf as _dcfs
        g = groups.Uint(32)
        prgd4 = Aes128Mmo(mul=4, keys=AES_KEYS4)
        B = 1 << lb
        rng = np.random.default_rng(42)
        s0sb = jnp.asarray(blk.block(
            rng.integers(0, 2**32, size=(B, 2, 4))))
        a_l = blk.pack_inputs(
            rng.integers(0, 2**IB, size=B, dtype=np.uint32), IB)
        betas = jnp.asarray(blk.block(
            rng.integers(0, 2**32, size=(B, 4))))
        cws = jax.jit(jax.vmap(
            lambda s, a, b: _dcfs.gen(prgd4, g, IB, "lt", s, a, b)))(
                s0sb, a_l, betas)
        chk = int(jax.jit(jnp.sum)(cws))
        print(json.dumps({"step": "gen", "log2_batch": lb,
                          "checksum": chk, "wall_s": round(
                              time.perf_counter() - t0, 1)}), flush=True)
        return

    if args.step == "packtile":
        # Gen at the stable lb-2, tile keys/xs 4x on device, pack at the
        # full batch: isolates dcf_pack_eval with no big gen graph.
        g, prgd4, s0sb, cws, xs, _packed, Bs = _build_inputs(
            lb - 2, args.block_rows)
        s0t = jnp.tile(s0sb[:, 0], (4, 1))
        cwt = jnp.tile(cws, (4, 1, 1))
        xst = jnp.tile(xs, (4,))
        sp, cwp, xp, vl, _ = jax.jit(
            _aesk.dcf_pack_eval,
            static_argnames=("in_bits", "block_rows"))(
                s0t, cwt, xst, in_bits=IB, block_rows=args.block_rows)
        chk = int(jax.jit(lambda a, b, c: jnp.sum(a) ^ jnp.sum(b)
                          ^ jnp.sum(c))(sp, cwp, xp))
        print(json.dumps({"step": "packtile", "log2_batch": lb,
                          "tiled_from": lb - 2, "checksum": chk,
                          "wall_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
        return

    if args.step == "pack":
        g, prgd4, s0sb, cws, xs, packed, B = _build_inputs(
            lb, args.block_rows)
        sp, cwp, xp, vl = packed
        chk = int(jax.jit(lambda a, b, c: jnp.sum(a) ^ jnp.sum(b)
                          ^ jnp.sum(c))(sp, cwp, xp))
        print(json.dumps({"step": "pack", "log2_batch": lb,
                          "checksum": chk, "wall_s": round(
                              time.perf_counter() - t0, 1)}), flush=True)
        return

    # Small pack (proven stable), tiled on device to the big shape.
    g, prgd4, s0sb, cws, xs, packed, Bs = _build_inputs(
        lb - 2, args.block_rows)
    sp, cwp, xp, vl = packed
    reps = 4
    B = Bs * reps

    @jax.jit
    def tile_run(sp, cwp, xp):
        spt = jnp.tile(sp, (1, reps, 1))
        cwpt = jnp.tile(cwp, (1, 1, reps, 1))
        xpt = jnp.tile(xp, (1, reps, 1))
        return _aesk.dcf_eval_packed(
            spt, cwpt, xpt, in_bits=IB, party=0, keys=AES_KEYS4,
            group_is_xor=False, group_bits=32,
            block_rows=args.block_rows, interpret=INTERPRET)

    if args.step == "ktile":
        vo, so, to = tile_run(sp, cwp, xp)
        chk = int(jax.jit(lambda a, b, c: jnp.sum(a) ^ jnp.sum(b)
                          ^ jnp.sum(c))(vo, so, to))
    else:  # unpacktile
        @jax.jit
        def full(sp, cwp, xp, vl):
            vo, so, to = tile_run(sp, cwp, xp)
            v_raw, _ = _aesk.unpack_out(vo, to, B)
            s, tb = _aesk.unpack_out(so, to, B)
            vlb = jnp.tile(vl, (reps, 1))
            term = g.from_block(s)
            term = jnp.where(tb.astype(jnp.bool_)[:, None],
                             g.add(term, g.from_block(vlb)), term)
            y = g.add(g.from_block(v_raw), term)
            return jnp.sum(g.into_block(y)[:, 0])
        chk = int(full(sp, cwp, xp, vl))
    print(json.dumps({"step": args.step, "log2_batch": lb,
                      "tiled_from": lb - 2, "checksum": chk,
                      "wall_s": round(time.perf_counter() - t0, 1)}),
          flush=True)


def run_step(args) -> None:
    import jax
    plat = jax.devices()[0].platform
    print(json.dumps({"platform": plat}), flush=True)

    if args.step in ("pack", "ktile", "unpacktile", "gen", "packtile"):
        _bracket_step(args)
        return

    if args.step == "golden":
        sys.path.insert(0, str(REPO / "scripts"))
        import verify_tpu
        n = verify_tpu.check_dcf_eval(interpret=(plat != "tpu"))
        print(json.dumps({"step": "golden", "configs_ok": n}), flush=True)
        return

    import numpy as np
    t0 = time.perf_counter()
    g, prgd4, s0sb, cws, xs, packed, B = _build_inputs(
        args.log2_batch, args.block_rows)
    fdca = _make_step_fn(g, B, args.block_rows)
    chk = int(fdca(*packed))
    t1 = time.perf_counter()
    out = {"step": args.step, "log2_batch": args.log2_batch,
           "block_rows": args.block_rows, "checksum": chk,
           "setup_plus_first_dispatch_s": round(t1 - t0, 1)}

    if args.step == "single" and not args.no_check:
        # Cross-check 4096 rows against the scheme-level XLA path: a
        # kernel that survives but miscomputes must fail here, not in a
        # downstream consumer.
        from fss_tpu.schemes import dcf as _dcfs
        K = min(4096, B)
        got = np.asarray(fdca_rows(g, B, args.block_rows, packed))[:K]
        exp = np.asarray(jax.jit(
            lambda s0, c, x: _dcfs.eval_points(
                prgd4, g, IB, "lt", 0, s0, c, x))(
                s0sb[:K, 0], cws[:K], xs[:K]))
        if not np.array_equal(got, exp[:, :got.shape[1]]):
            bad = int(np.nonzero(
                ~(got == exp[:, :got.shape[1]]).all(axis=1))[0][0])
            out["cross_check"] = (f"MISMATCH row {bad}: "
                                  f"got={got[bad].tolist()} "
                                  f"exp={exp[bad].tolist()}")
            print(json.dumps(out), flush=True)
            raise SystemExit(3)
        out["cross_check"] = f"ok ({K} rows vs scheme path)"

    if args.step == "loop":
        import bench
        v = bench._timeit(fdca, packed, B, iters=8)
        out["evals_per_s"] = round(v, 1)

    print(json.dumps(out), flush=True)


def fdca_rows(g, B, block_rows, packed):
    """Per-row outputs (not the checksum) for the cross-check."""
    import jax
    import jax.numpy as jnp
    from fss_tpu.ops import aes_pallas as _aesk

    @jax.jit
    def f(sp, cwp, xp, vl):
        vo, so, to = _aesk.dcf_eval_packed(
            sp, cwp, xp, in_bits=IB, party=0, keys=AES_KEYS4,
            group_is_xor=False, group_bits=32, block_rows=block_rows,
            interpret=INTERPRET)
        v_raw, _ = _aesk.unpack_out(vo, to, B)
        s, tb = _aesk.unpack_out(so, to, B)
        vlb = vl if vl.shape[0] == 1 else vl[:B]
        term = g.from_block(s)
        term = jnp.where(tb.astype(jnp.bool_)[:, None],
                         g.add(term, g.from_block(vlb)), term)
        return g.into_block(g.add(g.from_block(v_raw), term))

    return f(*packed)


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


def _spawn(argv: list[str], timeout_s: float) -> dict:
    t0 = time.perf_counter()
    cmd = [sys.executable, os.path.abspath(__file__)] + argv
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout_s)
        rc, out, err = r.returncode, r.stdout, r.stderr
    except subprocess.TimeoutExpired as e:
        rc = -9
        out = (e.stdout or b"").decode() if isinstance(
            e.stdout, bytes) else (e.stdout or "")
        err = f"TIMEOUT after {timeout_s:.0f}s (claim queue or hang)"
    rec = {"argv": argv, "rc": rc, "wall_s": round(
        time.perf_counter() - t0, 1),
        "stdout": out.strip().splitlines()[-6:],
        "stderr_tail": err.strip().splitlines()[-4:]}
    ART.mkdir(parents=True, exist_ok=True)
    with open(LOG, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


def drive_bracket() -> int:
    """Run the pack/kernel/unpack bracket probes at 2^19, isolated."""
    step_timeout = float(os.environ.get("FSS_TRIAGE_STEP_TIMEOUT", 2700))
    plan = [["--step", "pack", "--log2-batch", "19"],
            ["--step", "ktile", "--log2-batch", "19"],
            ["--step", "unpacktile", "--log2-batch", "19"]]
    recs = [_spawn(argv, step_timeout) for argv in plan]
    verdict = {"bracket": {r["argv"][1]: ("ok" if r["rc"] == 0 else
                                          f"rc={r['rc']}")
                           for r in recs}}
    with open(LOG, "a") as fh:
        fh.write(json.dumps(verdict) + "\n")
    print(json.dumps(verdict), flush=True)
    return int(any(r["rc"] != 0 for r in recs))


def drive() -> int:
    step_timeout = float(os.environ.get("FSS_TRIAGE_STEP_TIMEOUT", 2700))
    plan = [["--step", "golden"],
            ["--step", "single", "--log2-batch", "15"],
            ["--step", "single", "--log2-batch", "17"],
            ["--step", "single", "--log2-batch", "19"],
            ["--step", "loop", "--log2-batch", "19"]]
    failures = []
    for argv in plan:
        rec = _spawn(argv, step_timeout)
        if rec["rc"] != 0:
            failures.append(rec)
            # Bisect the failing shape across block_rows before moving on.
            if "--log2-batch" in argv:
                base = argv[:]
                for br in ("4", "16"):
                    _spawn(base + ["--block-rows", br], step_timeout)
    verdict = ("CLEAN: all steps passed — round-3 crash looks like a "
               "pool flake; rerun once more in a different window"
               if not failures else
               f"{len(failures)} step(s) failed — see {LOG}")
    with open(LOG, "a") as fh:
        fh.write(json.dumps({"verdict": verdict}) + "\n")
    print(f"triage: {verdict}", flush=True)
    return 1 if failures else 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--step", choices=["golden", "single", "loop",
                                       "pack", "ktile", "unpacktile",
                                       "gen", "packtile"])
    ap.add_argument("--log2-batch", type=int, default=19)
    ap.add_argument("--block-rows", type=int, default=8)
    ap.add_argument("--no-check", action="store_true",
                    help="skip the scheme-path cross-check")
    ap.add_argument("--bracket", action="store_true",
                    help="drive the pack/ktile/unpacktile probes")
    args = ap.parse_args()
    if args.step is None:
        return drive_bracket() if args.bracket else drive()
    run_step(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
