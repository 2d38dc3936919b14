"""One-claim TPU measurement campaign.

The shared TPU pool makes claims expensive (each PROCESS pays its own
claim, and a claim can queue ~30 min — see CLAUDE.md). This script does
everything a window is good for in ONE process, ordered so a crash late
in the run cannot void the work before it (all artifacts stream to
``scripts/artifacts/`` in the repo, not /tmp, so every window leaves a
durable, committable record):

  1. verify gate — golden byte-check of one config per TIMED kernel
     family on-device (scripts/verify_tpu.py --quick semantics, same
     gate bench.py runs); nothing is timed on an unverified kernel;
  2. the headline bench JSON line (best of 3) -> campaign_headline.json;
  3. the full bench registry, streamed -> campaign_rows.jsonl;
  4. the roofline measurement (scripts/roofline.py) pinning the rotate
     cost and ChaCha slope -> campaign_roofline.json;
  5. the FULL 10-family verify sweep (scripts/verify_tpu.py, no
     --quick) -> campaign_verify.json. Runs after the timings on
     purpose: if a cold-path kernel faults the worker here, the
     measurements above are already on disk;
  6. any --sweep FILE.py scripts, exec'd in-process (stdout captured
     next to the file as FILE.out and copied into scripts/artifacts/);
  7. optional job-queue loop (--jobs): ``scripts/tpu_jobs/*.py`` files
     that APPEAR while the loop runs are exec'd in-process with the
     claim already held. Drop jobs atomically (write .tmp, os.rename).
     Stops after FSS_CAMPAIGN_IDLE_S (default 300 s) without new jobs,
     or when a ``scripts/tpu_jobs/STOP`` file appears.

Usage: python scripts/tpu_campaign.py [--out F] [--rows F]
           [--skip-full-verify] [--sweep FILE]... [--jobs]
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
import traceback
import contextlib

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_REPO, os.path.join(_REPO, "scripts")):
    if p not in sys.path:
        sys.path.insert(0, p)

import bench  # noqa: E402  (repo-root bench.py)

ART = os.path.join(_REPO, "scripts", "artifacts")
JOBS_DIR = os.path.join(_REPO, "scripts", "tpu_jobs")


def _arg(name: str, default: str) -> str:
    if name in sys.argv:
        i = sys.argv.index(name) + 1
        if i >= len(sys.argv):
            raise SystemExit(f"{name} requires a value")
        return sys.argv[i]
    return default


def _args_all(name: str) -> list[str]:
    out, i = [], 0
    while True:
        try:
            i = sys.argv.index(name, i) + 1
        except ValueError:
            return out
        if i >= len(sys.argv):
            raise SystemExit(f"{name} requires a value")
        out.append(sys.argv[i])


def _exec_job(path: str) -> str:
    """exec one job/sweep file in-process; returns its captured stdout.
    SystemExit is caught too: argparse/main-style scripts must not be
    able to end the campaign and forfeit the claim."""
    out = io.StringIO()
    try:
        src = open(path).read()
        with contextlib.redirect_stdout(out):
            exec(compile(src, path, "exec"),
                 {"__name__": "__job__", "__file__": path})
    except SystemExit as e:
        out.write(f"\nJOB EXITED: SystemExit({e.code})\n")
    except Exception:
        out.write("\nJOB FAILED:\n" + traceback.format_exc())
    return out.getvalue()


def _run_sweeps(paths: list[str]) -> None:
    os.makedirs(ART, exist_ok=True)
    for path in paths:
        name = os.path.basename(path)
        print(f"campaign: sweep {name}", file=sys.stderr)
        text = _exec_job(path)
        for dst in (path + ".out",
                    os.path.join(ART, name.replace(".py", ".out"))):
            with open(dst, "w") as fh:
                fh.write(text)
        print(f"campaign: sweep {name} -> "
              f"{os.path.join(ART, name.replace('.py', '.out'))}",
              file=sys.stderr)


def _run_jobs(deadline_idle_s: float) -> None:
    os.makedirs(JOBS_DIR, exist_ok=True)
    done: set[str] = set()
    last_activity = time.time()
    print(f"campaign: job loop on {JOBS_DIR} "
          f"(idle timeout {deadline_idle_s:.0f}s)", file=sys.stderr)
    while True:
        if os.path.exists(os.path.join(JOBS_DIR, "STOP")):
            print("campaign: STOP file — ending job loop", file=sys.stderr)
            return
        fresh = [f for f in sorted(os.listdir(JOBS_DIR))
                 if f.endswith(".py") and f not in done]
        for f in fresh:
            path = os.path.join(JOBS_DIR, f)
            # Half-written drops produce a SyntaxError at compile();
            # leave those NOT done so the finished rename gets retried.
            try:
                compile(open(path).read(), path, "exec")
            except SyntaxError:
                print(f"campaign: job {f} not yet parseable — waiting",
                      file=sys.stderr)
                continue
            done.add(f)
            last_activity = time.time()
            print(f"campaign: running job {f}", file=sys.stderr)
            with open(path + ".out", "w") as fh:
                fh.write(_exec_job(path))
            print(f"campaign: job {f} done -> {f}.out", file=sys.stderr)
            last_activity = time.time()
        if time.time() - last_activity > deadline_idle_s:
            print("campaign: idle timeout — releasing claim",
                  file=sys.stderr)
            return
        time.sleep(5)


def main() -> int:
    os.makedirs(ART, exist_ok=True)
    out_path = _arg("--out", os.path.join(ART, "campaign_headline.json"))
    rows_path = _arg("--rows", os.path.join(ART, "campaign_rows.jsonl"))
    wait_s = float(os.environ.get("FSS_TPU_BENCH_WAIT_S", 2400))

    bench._wait_for_device(wait_s)
    if not bench._verify_gate():
        # _verify_gate already printed an honest JSON line on stdout.
        return 1

    # 2. headline (best of 3)
    evals_per_s = max(
        bench._bench_dpf_eval(bench.IN_BITS, bench.LOG2_BATCH)[0]
        for _ in range(3))
    headline = {
        "metric": (f"dpf_eval_chacha_uint_{bench.IN_BITS}bit_"
                   f"batch2e{bench.LOG2_BATCH}"),
        "value": round(evals_per_s, 1), "unit": "evals/s/chip",
        "vs_baseline": round(
            evals_per_s / bench.BASELINE_EVALS_PER_S, 4)}
    line = json.dumps(headline)
    print(line)
    with open(out_path, "w") as fh:
        fh.write(line + "\n")

    # 3. registry rows, streamed
    with open(rows_path, "w") as fh:
        for metric, value, unit in bench._bench_registry():
            row = json.dumps({"metric": metric, "value": round(value, 1),
                              "unit": unit})
            print(row, file=sys.stderr)
            fh.write(row + "\n")
            fh.flush()

    # 4. roofline
    try:
        import roofline
        import jax
        if jax.devices()[0].platform == "tpu":
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                roofline.main()
            with open(os.path.join(ART, "campaign_roofline.json"),
                      "w") as fh:
                fh.write(buf.getvalue())
            print("campaign: roofline -> "
                  "scripts/artifacts/campaign_roofline.json",
                  file=sys.stderr)
    except Exception:
        traceback.print_exc()

    # 5. FULL verify sweep (all 10 families) — after the timings so a
    # cold-path kernel fault can't void the measurements above.
    if "--skip-full-verify" not in sys.argv:
        import verify_tpu
        try:
            n = verify_tpu.run(quick=False, interpret=False)
            rec = {"verify_tpu_full": n, "backend": "tpu"}
        except verify_tpu.Mismatch as e:
            rec = {"verify_tpu_full": "FAIL", "error": str(e)[:400]}
        with open(os.path.join(ART, "campaign_verify.json"), "w") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(f"campaign: full verify -> {rec}", file=sys.stderr)

    # 6. explicit one-shot sweeps riding this claim
    _run_sweeps(_args_all("--sweep"))

    # 7. opt-in job loop
    if "--jobs" in sys.argv:
        _run_jobs(float(os.environ.get("FSS_CAMPAIGN_IDLE_S", 300)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
