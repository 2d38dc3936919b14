"""Plumbing test for the multi-device scaling harness
(scripts/scaling_bench.py, BASELINE.md target 3): the orchestrator must
measure both axes at n in {1, 2} on the virtual CPU mesh and report
efficiency fields. Small problem sizes via FSS_SCALING_SMALL."""

import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_scaling_bench_small(tmp_path):
    out = tmp_path / "scaling.json"
    env = dict(os.environ)
    env["FSS_SCALING_SMALL"] = "1"
    env["PYTHONPATH"] = str(REPO)
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "scaling_bench.py"),
         "--devices", "1,2", "--out", str(out)],
        capture_output=True, text=True, timeout=1200, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    doc = json.loads(out.read_text())
    assert doc["mode"] == "cpu-virtual"
    for axis in ("data_axis", "domain_axis"):
        runs = doc[axis]["runs"]
        assert set(runs) == {"1", "2"}, runs
        assert runs["1"]["efficiency_vs_1"] == 1.0
        for row in runs.values():
            assert row["per_s"] > 0
            assert row["time_s"] > 0
