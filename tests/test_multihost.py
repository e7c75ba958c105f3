"""Multi-host (DCN analogue) sharded detection: 2 JAX processes, one mesh.

The single-process suite covers multi-DEVICE sharding on the virtual CPU
mesh; this covers multi-PROCESS operation — ``jax.distributed`` over the
CPU collectives backend standing in for DCN. Each process owns half the
``stream`` axis, feeds only its own streams' rows
(``jax.make_array_from_process_local_data``), and unpacks only its
addressable payload shards; results must equal the serial engine
(tests/multihost_worker.py asserts this in-process).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

from tests.conftest import REPO_ROOT

# Full-lane suite: excluded from the default fast lane (pyproject addopts -m 'not slow');
# run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_detect_matches_serial():
    port = _free_port()
    worker = os.path.join(REPO_ROOT, "tests", "multihost_worker.py")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = REPO_ROOT
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=REPO_ROOT,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"MULTIHOST-OK {i}" in out, f"process {i} output:\n{out}"
        assert f"MULTIHOST-MS-OK {i}" in out, f"process {i} output:\n{out}"
