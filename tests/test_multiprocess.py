"""Two-process distributed training: cross-process gradient all-reduce.

The reference has no collective backend at all (SURVEY #2.6); this pins the
framework's multi-host path: ``jax.distributed.initialize`` + a DP train
step whose psum crosses process boundaries (Gloo locally, DCN on pods).
"""

import os
import re
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def _run_two(worker: str):
    port = str(_free_port())
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # one device per process
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", os.path.join(REPO, "tests", worker),
             str(rank), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    return outs


def test_two_process_dp_train_step():
    outs = _run_two("mp_train_worker.py")
    losses = [
        float(m.group(1))
        for out in outs
        for m in [re.search(r"RANK\d_LOSS=([\d.]+)", out)]
        if m
    ]
    assert len(losses) == 2, outs
    # both processes see the identical all-reduced loss
    assert abs(losses[0] - losses[1]) < 1e-6


def test_two_process_spatial_halo():
    """ppermute halo exchange across process boundaries equals the
    single-device blend (the DCN stand-in for pod-scale CP)."""
    outs = _run_two("mp_halo_worker.py")
    assert all("HALO_OK" in out for out in outs), outs


def test_two_process_sharded_streaming():
    """StreamingEngine.infer_sharded / infer_sharded_stack across two
    jax.distributed processes equals single-process output — the last
    SURVEY #2.6 claim to get a process-boundary test (r2 verdict #6)."""
    outs = _run_two("mp_stream_worker.py")
    assert all("STREAM_OK" in out for out in outs), outs
