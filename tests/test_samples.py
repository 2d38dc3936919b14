"""Smoke-run the user samples as real subprocesses so they can't rot
(the reference's CI builds and runs its samples/ the same way)."""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def _run(name):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # Keep the axon plugin OFF the path: it overrides JAX_PLATFORMS at
    # startup and queues on the TPU pool (see CLAUDE.md).
    env["PYTHONPATH"] = str(REPO)
    return subprocess.run(
        [sys.executable, str(REPO / "samples" / name)],
        capture_output=True, text=True, timeout=1200, env=env)


@pytest.mark.slow
@pytest.mark.parametrize("name,needle", [
    ("dpf_dcf_basic.py", "OK"),
    ("dpf_batched_tpu.py", "OK"),
    ("dpf_packed_pipeline.py", "matches the wire-format gen. OK"),
    ("vdpf_vdmpf_verified.py", "proofs match. OK"),
    ("pir_tpu.py", "retrieved privately"),
    ("dcf_mod_groups.py", "zero above. OK"),
])
def test_sample_runs(name, needle):
    r = _run(name)
    assert r.returncode == 0, r.stderr[-2000:]
    assert needle in r.stdout, r.stdout[-2000:]
