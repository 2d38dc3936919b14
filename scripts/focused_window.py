"""Focused one-claim TPU window: verify a few families, re-time a few
registry rows.

The full campaign (scripts/tpu_campaign.py) re-measures everything; this
is the surgical variant for when one kernel family changed — it holds
ONE device claim (CLAUDE.md: each process pays its own claim) and does:

  1. scripts/verify_tpu.py golden byte-check of --verify families
     on-chip (nothing is timed on an unverified kernel);
  2. the registry rows matching --only (FSS_BENCH_ONLY prefixes),
     streamed to scripts/artifacts/campaign_rows.jsonl with a ts field
     so refresh_bench_doc.py keeps the newest number per row.

Usage:
  python scripts/focused_window.py --verify hash_kernels,vdpf_eval \
      --only vdpf_eval
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_REPO, os.path.join(_REPO, "scripts")):
    if p not in sys.path:
        sys.path.insert(0, p)


def _arg(name: str, default: str) -> str:
    if name in sys.argv:
        return sys.argv[sys.argv.index(name) + 1]
    return default


def main() -> int:
    fams = tuple(f for f in _arg("--verify", "").split(",") if f)
    only = _arg("--only", "")
    if only:
        os.environ["FSS_BENCH_ONLY"] = only
    rows_path = os.path.join(_REPO, "scripts", "artifacts",
                             "campaign_rows.jsonl")

    import bench
    import verify_tpu

    bench._wait_for_device(float(os.environ.get(
        "FSS_TPU_BENCH_WAIT_S", 2400)))

    if fams:
        quick = "--full" not in sys.argv
        n = verify_tpu.run(quick=quick, interpret=False, families=fams)
        print(f"focused: verified {n} configs in {fams} "
              f"(quick={quick})", flush=True)

    t0 = time.time()
    with open(rows_path, "a") as fh:
        for metric, value, unit in bench._bench_registry():
            rec = {"metric": metric, "value": round(value, 1),
                   "unit": unit, "ts": time.strftime("%Y-%m-%d")}
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(json.dumps(rec), flush=True)
    print(f"focused: registry done in {time.time() - t0:.0f}s",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
