"""Multi-host smoke test: 2 CPU processes, one DP train step, equal losses.

Exercises the `train.py --distributed` machinery end-to-end on one machine:
jax.distributed.initialize with a local coordinator, a 'data' mesh spanning
both processes' devices (2 each -> 4 global), global-array assembly via
parallel.multihost, and a full jitted 2D train step with device-side GT.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_train_step():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=2")
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "multihost_worker.py"),
         coordinator, "2", str(i)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    losses = []
    for out in outs:
        lines = [ln for ln in out.splitlines()
                 if ln.startswith("MULTIHOST_LOSS")]
        assert lines, out
        losses.append(float(lines[0].split()[1]))
    import numpy as np

    assert np.isfinite(losses[0])
    assert losses[0] == losses[1], losses
