"""One-claim TPU measurement campaign.

The shared TPU pool makes claims expensive (each PROCESS pays its own
claim, and a claim can queue ~30 min — see CLAUDE.md). This script does
everything a window is good for in ONE process:

  1. verify gate — golden byte-check of every fused kernel on-device
     (scripts/verify_tpu.py --quick semantics, same as bench.py's gate);
  2. the headline bench JSON line (written to --out, best of 3);
  3. the full bench registry (streamed to --rows as JSONL);
  4. the roofline measurement (scripts/roofline.py) pinning the rotate
     cost and ChaCha slope;
  5. a short job-queue loop: any ``scripts/tpu_jobs/*.py`` file that
     appears is exec'd in-process (with the claim already held), its
     stdout captured next to it as ``<name>.out``. Lets ad-hoc kernel
     sweeps ride the same claim instead of re-queuing. Stops after
     FSS_CAMPAIGN_IDLE_S (default 300 s) with no new jobs, or when a
     ``scripts/tpu_jobs/STOP`` file appears.

Usage: python scripts/tpu_campaign.py [--out F] [--rows F] [--no-jobs]
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

JOBS_DIR = os.path.join(_REPO, "scripts", "tpu_jobs")


def _arg(name: str, default: str) -> str:
    if name in sys.argv:
        return sys.argv[sys.argv.index(name) + 1]
    return default


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
            done.add(f)
            last_activity = time.time()
            path = os.path.join(JOBS_DIR, f)
            out = io.StringIO()
            print(f"campaign: running job {f}", file=sys.stderr)
            try:
                src = open(path).read()
                with contextlib.redirect_stdout(out):
                    exec(compile(src, path, "exec"),
                         {"__name__": "__job__", "__file__": path})
            except Exception:
                out.write("\nJOB FAILED:\n" + traceback.format_exc())
            with open(path + ".out", "w") as fh:
                fh.write(out.getvalue())
            print(f"campaign: job {f} done -> {f}.py.out", file=sys.stderr)
            last_activity = time.time()
        if time.time() - last_activity > deadline_idle_s:
            print("campaign: idle timeout — releasing claim",
                  file=sys.stderr)
            return
        time.sleep(5)


def main() -> int:
    out_path = _arg("--out", "/tmp/campaign_headline.json")
    rows_path = _arg("--rows", "/tmp/campaign_rows.jsonl")
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
            with open("/tmp/campaign_roofline.json", "w") as fh:
                fh.write(buf.getvalue())
            print("campaign: roofline -> /tmp/campaign_roofline.json",
                  file=sys.stderr)
    except Exception:
        traceback.print_exc()

    # 5. job loop
    if "--no-jobs" not in sys.argv:
        _run_jobs(float(os.environ.get("FSS_CAMPAIGN_IDLE_S", 300)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
