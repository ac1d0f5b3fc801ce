"""Real multi-process jax.distributed test: 2 workers x 4 virtual CPU
devices, coordinator on localhost, global (dp=1, sp=8) mesh.

Each worker contributes its half of the magnitude timeline with
make_array_from_process_local_data; halos cross the process boundary through
the same lax.ppermute that crosses chips within a process.  Worker 0 checks
the globally-gathered candidates against an unsharded scan (no candidate
lost or duplicated across the PROCESS boundary) and prints MULTIHOST PASS.

This executes the initialize_from_env() True branch for real — the branch a
single-process suite can never reach.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tools" / "multihost_worker.py"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(
    bool(os.environ.get("DUMP1090_TEST_TPU")),
    reason="multi-process CPU mesh test; not meaningful against one real chip",
)
def test_two_process_distributed_decode():
    port = _free_port()
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # breaks the tunneled JAX plugin in children
    env.pop("JAX_PLATFORMS", None)  # worker pins the cpu platform itself
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:\n{out}\nstderr:\n{err}"
    assert any("MULTIHOST PASS" in out for _, out, _ in outs), outs
