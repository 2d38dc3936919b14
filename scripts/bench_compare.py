"""Same-silicon native comparison driver.

This VM is a shared 1-core host with ~±30% run-to-run timing noise, so a
single window of "ours" vs a different window of "theirs" is not a fair
comparison. This driver alternates the REFERENCE's own bench harness
(scripts/ref_bench, its unmodified src/bench_cpu.cu) with our
scripts/bench_native.py for ``--rounds`` rounds and keeps the best (=
least-interference) time per row on each side — both sides sampled from
the same set of windows.

Outputs: updates scripts/ref_bench/results_here.jsonl (reference bests)
and results_ours.jsonl (our bests) and prints the merged table (also
saved to scripts/ref_bench/compare.md for docs/benchmarks.md).

Unless --fresh is given, the saved bests from previous runs seed this
run's table, so repeated invocations accumulate the per-row best over
ever more time windows — symmetrically for both sides (each run always
interleaves both harnesses), which tightens the noise floor without
favoring either harness.

Run: python scripts/bench_compare.py [--rounds N] [--fresh]
(~8 min/round)
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import re
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent
REPO = HERE.parent
REF_DIR = HERE / "ref_bench"

ROW_RE = re.compile(r"^(BM_\S+)\s+([0-9.]+)\s+(ns/op|ms)")


def run_ref() -> dict[str, float]:
    """One pass of the reference harness; {name: ns}."""
    out = subprocess.run([str(REF_DIR / "ref_bench")], cwd=REF_DIR,
                         capture_output=True, text=True, check=True)
    res = {}
    for line in out.stdout.splitlines():
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            continue
        res[row["name"]] = float(row["ns_per_iter"])
    return res


def run_ours() -> dict[str, float]:
    """One pass of bench_native; {name: ns}."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO))
    out = subprocess.run([sys.executable, str(HERE / "bench_native.py")],
                         cwd=REPO, env=env, capture_output=True,
                         text=True, check=True)
    res = {}
    for line in out.stdout.splitlines():
        m = ROW_RE.match(line.strip())
        if m:
            ns = float(m.group(2))
            if m.group(3) == "ms":
                ns *= 1e6
            res[m.group(1)] = ns
    return res


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--fresh", action="store_true",
                    help="ignore bests saved by previous runs")
    args = ap.parse_args()

    best_ref: dict[str, float] = {}
    best_ours: dict[str, float] = {}
    if not args.fresh:
        for path, dst in ((REF_DIR / "results_here.jsonl", best_ref),
                          (REF_DIR / "results_ours.jsonl", best_ours)):
            if path.exists():
                for line in path.read_text().splitlines():
                    row = json.loads(line)
                    dst[row["name"]] = float(row["ns_per_iter"])
    for r in range(args.rounds):
        for name, ns in run_ref().items():
            best_ref[name] = min(best_ref.get(name, 1e30), ns)
        for name, ns in run_ours().items():
            best_ours[name] = min(best_ours.get(name, 1e30), ns)
        print(f"round {r + 1}/{args.rounds} done", file=sys.stderr)

    with open(REF_DIR / "results_here.jsonl", "w") as f:
        for name, ns in best_ref.items():
            f.write(json.dumps({"name": name, "ns_per_iter": ns}) + "\n")
    with open(REF_DIR / "results_ours.jsonl", "w") as f:
        for name, ns in best_ours.items():
            f.write(json.dumps({"name": name, "ns_per_iter": ns}) + "\n")

    lines = ["| Bench (20-bit) | fss_tpu native | reference (same host) "
             "| speedup |", "|---|---|---|---|"]
    for name in best_ref:
        ours = best_ours.get(name)
        if ours is None:
            continue
        ref = best_ref[name]

        def fmt(ns):
            return f"{ns / 1e6:.1f} ms" if ns >= 1e6 else f"{ns:.0f} ns"

        lines.append(f"| {name} | {fmt(ours)} | {fmt(ref)} "
                     f"| {ref / ours:.1f}x |")
    table = "\n".join(lines)
    (REF_DIR / "compare.md").write_text(table + "\n")
    print(table)


if __name__ == "__main__":
    main()
