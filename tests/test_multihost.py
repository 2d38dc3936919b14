"""2-process jax.distributed execution test (SURVEY §2.7 new surface).

Spawns two coordinator-connected processes, each with 4 virtual CPU
devices, and runs the real multi-host code paths: make_multihost_mesh
(DCN-on-data layout assertion), data-sharded batched gen/eval across
processes, and a domain-sharded full-domain EvalAll whose collectives
span both processes — cross-checked bit-exactly against the
single-device path. See tests/multihost_worker.py for the checks.
"""

import pathlib
import socket
import subprocess
import sys

import pytest

_WORKER = pathlib.Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), str(i), "2", str(port),
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, p in enumerate(procs):
        tail = "\n".join(outs[i].splitlines()[-25:])
        assert p.returncode == 0, f"proc {i} failed:\n{tail}"
        assert (tmp_path / f"proc{i}.ok").exists(), f"proc {i} no marker"
