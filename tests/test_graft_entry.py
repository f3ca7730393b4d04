"""The driver-facing contract of __graft_entry__.

Round-1 verdict: `dryrun_multichip(8)` was called from a process whose JAX
backend was ALREADY initialized on the 1-chip TPU tunnel, so the in-process
platform switch was a silent no-op and the dry run died with "need 8
devices, have 1". The fix re-execs the dry run in a clean subprocess; these
tests reproduce the driver's calling convention (backend initialized first,
too few devices) and assert the dry run still succeeds.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_after_backend_init(snippet: str) -> subprocess.CompletedProcess:
    """Run `snippet` in a python whose backend is initialized FIRST on a
    single CPU device (stands in for the driver's 1-chip tunnel)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""  # no virtual-device flag → 1 device
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__\n"
        + snippet
    )
    return subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=1100)


@pytest.mark.slow
def test_dryrun_multichip_survives_initialized_backend():
    proc = _run_after_backend_init("__graft_entry__.dryrun_multichip(8)\n")
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dryrun_multichip(8): mesh=(4x2)" in proc.stdout
    assert "OK" in proc.stdout


@pytest.mark.slow
def test_dryrun_multislice_survives_initialized_backend():
    proc = _run_after_backend_init(
        "__graft_entry__.dryrun_multislice(8, 2)\n")
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dryrun_multislice(8,2)" in proc.stdout
    assert "OK" in proc.stdout


def test_dryrun_multichip_inproc_on_test_mesh():
    """Under the test conftest (8 virtual CPU devices) the dry run must NOT
    spawn a subprocess — _ensure_cpu_devices sees a satisfying backend."""
    import __graft_entry__

    assert __graft_entry__._ensure_cpu_devices(8)
