"""Multi-controller (2-process) cleanliness of the sharded SDM step.

Runs tools/dryrun_2proc.py: 2 CPU processes x 4 virtual devices = one
8-device global mesh, full particles_multi_t cond+async steps with ring
migration, global invariants via replicated outputs.  Reference analog:
the MPI test oversubscribed on one node (tests/mpi/mpi_adve_test.cpp).
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_two_process_mesh():
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "dryrun_2proc.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run(
        [sys.executable, os.path.abspath(tool)], env=env,
        capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert "worker 0: rc=0 OK" in out.stdout
    assert "worker 1: rc=0 OK" in out.stdout
