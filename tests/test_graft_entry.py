"""Regression tests for the driver entry points (__graft_entry__.py).

Round-1 failure mode (MULTICHIP_r01.json rc=1): ``dryrun_multichip`` probed
``jax.default_backend()`` before forcing the CPU platform, which initialized
the session-forced axon TPU backend and crashed on a libtpu version mismatch.
These tests run the function the way the driver does — in a fresh process
with no environment preparation — so any backend-ordering regression fails
here first.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env(**overrides):
    env = dict(os.environ)
    # Simulate a driver process: no pytest conftest forcing, no preset flags.
    env.pop("PYTHONPATH", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.update(overrides)
    return env


def test_dryrun_multichip_fresh_process():
    """Driver invocation: fresh python, no XLA_FLAGS/JAX_PLATFORMS set."""
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)" % REPO
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=_clean_env(), cwd=REPO,
        capture_output=True, text=True, timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dp+zero1 train step ok" in proc.stdout
    assert "tp forward ok" in proc.stdout


def test_dryrun_multichip_backend_already_initialized():
    """If the backend was already initialized with too few devices, the
    function must re-exec in a subprocess rather than crash."""
    code = (
        "import os, sys; sys.path.insert(0, %r); "
        "os.environ['JAX_PLATFORMS']='cpu'; "
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "assert len(jax.devices()) == 1; "
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)" % REPO
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=_clean_env(), cwd=REPO,
        capture_output=True, text=True, timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dp+zero1 train step ok" in proc.stdout
