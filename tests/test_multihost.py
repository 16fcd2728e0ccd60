"""Multi-host (DCN-analog) test: 2 real processes, jax.distributed over
localhost, one GLOBAL 4-device mesh, a sharded train step, and an orbax
save/restore across processes.

The reference exercises its multi-process path only through real
`torchrun --nproc_per_node 8` (SURVEY.md §4); this is the single-machine
fixture it never had, and the only coverage of
`magicdance_tpu/parallel/multihost.py` (VERDICT r4 missing #4). CPU
cross-process collectives ride jax's built-in Gloo backend.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_step_and_checkpoint(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK pid={pid}" in out, out[-4000:]
    # SPMD invariant: both processes computed the same global loss
    l0 = [ln for ln in outs[0].splitlines() if "MULTIHOST_OK" in ln][0]
    l1 = [ln for ln in outs[1].splitlines() if "MULTIHOST_OK" in ln][0]
    assert l0.split("loss=")[1] == l1.split("loss=")[1]
