"""Regression tests for bench.py's budget discipline (the round-4 lesson).

BENCH_r04 recorded rc=124 / parsed=null because a driver timeout killed
bench.py while its pre-headline gate was still running — the completed
on-chip campaign from the day before never made it into the round's
official record. bench.py now installs SIGTERM/SIGINT handlers FIRST and
guarantees a parseable JSON line on stdout no matter where the kill
lands (docs/failures.md §3). These tests pin that contract without
needing a TPU: they spawn bench.py in an environment whose backend can
never initialise, wait until the device-wait retry loop is live (which
proves the signal handlers are installed), kill it, and assert the
honest JSON line still appears.

Reference analog: none — the reference bench (src/bench_gpu.cu) runs
attached hardware and has no driver-timeout failure mode; this is a
tunneled-shared-pool requirement.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _no_device_env():
    """Environment where `import jax; jax.devices()` always fails fast.

    Strips the axon sitecustomize entry from PYTHONPATH (it would try to
    claim the real TPU, which can queue for minutes) and names a backend
    that does not exist, so both the parent process and its probe
    subprocesses fail backend init immediately.
    """
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO  # no /root/.axon_site -> no TPU claim
    env["JAX_PLATFORMS"] = "no_such_backend"
    env["FSS_TPU_BENCH_WAIT_S"] = "600"  # keep it parked in the wait loop
    env["FSS_TPU_BENCH_DEADLINE_S"] = "1200"
    return env


def _spawn_and_wait_for_retry_loop(env, timeout_s=120.0):
    """Start bench.py and block until its retry loop prints to stderr."""
    proc = subprocess.Popen(
        [sys.executable, BENCH], cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    deadline = time.time() + timeout_s
    seen = []
    # The retry line proves main() is past signal.signal(...): the wait
    # loop runs strictly after handler installation (bench.py main()).
    while time.time() < deadline:
        line = proc.stderr.readline()
        if not line:
            if proc.poll() is not None:
                break
            continue
        seen.append(line)
        if "retrying in" in line or "device wait exhausted" in line:
            return proc, seen
    proc.kill()
    proc.wait()
    pytest.fail("bench.py never reached the device-wait retry loop; "
                "stderr so far:\n" + "".join(seen))


def test_sigterm_mid_wait_flushes_json():
    """A driver kill during the device wait must still emit one JSON line
    (the honest BENCH_INCOMPLETE record), with a nonzero exit code since
    no measurement exists."""
    proc, _ = _spawn_and_wait_for_retry_loop(_no_device_env())
    proc.send_signal(signal.SIGTERM)
    try:
        out, err = proc.communicate(timeout=60)
    except subprocess.TimeoutExpired:
        proc.kill()
        out, err = proc.communicate()
        pytest.fail("bench.py did not exit within 60s of SIGTERM")
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert lines, f"no stdout after SIGTERM; stderr tail: {err[-400:]}"
    rec = json.loads(lines[-1])
    assert rec["metric"] == "BENCH_INCOMPLETE"
    assert rec["partial"] is True
    assert set(rec) >= {"metric", "value", "unit", "vs_baseline"}
    assert proc.returncode == 1  # no measurement -> nonzero for driver


def test_exhausted_wait_emits_unavailable_json():
    """If the pool never grants a device inside the wait budget, bench.py
    proceeds to the gate, which must emit the TPU_UNAVAILABLE JSON line
    rather than a bare traceback (VERDICT r2 item: honest outage record).
    """
    env = _no_device_env()
    env["FSS_TPU_BENCH_WAIT_S"] = "1"  # exhaust the wait immediately
    proc = subprocess.Popen(
        [sys.executable, BENCH], cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    try:
        out, err = proc.communicate(timeout=180)
    except subprocess.TimeoutExpired:
        proc.kill()
        out, err = proc.communicate()
        pytest.fail("bench.py hung after an exhausted device wait")
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert lines, f"no stdout; stderr tail: {err[-400:]}"
    rec = json.loads(lines[-1])
    assert rec["metric"] in ("TPU_UNAVAILABLE", "BENCH_INCOMPLETE")
    assert rec["vs_baseline"] == 0
    assert proc.returncode != 0
