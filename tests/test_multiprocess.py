"""Real multi-process jax.distributed path: 2 OS processes x 4 virtual CPU
devices, sharded BA over the GLOBAL 8-device mesh must equal the
single-device solver (VERDICT round-1 missing #5 — the last rung before a
pod run: process-boundary collectives, not just a single-process virtual
mesh)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_ba():
    port = _free_port()
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # strip any TPU-tunnel site customization
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        ASLAM_TEST_REEXEC="1",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER,
             "--coordinator", f"127.0.0.1:{port}",
             "--nproc", "2", "--pid", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out:\n"
                    + "\n---\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "MP_OK" in out, f"worker {i} missing MP_OK:\n{out}"
