"""Multi-process ("multi-host") distributed runtime test.

SURVEY.md §5.8 maps the north star to the jax.distributed multi-host
runtime. Without pod hardware, the test double is N OS processes x M
virtual CPU devices each (jax.distributed over localhost + Gloo CPU
collectives): process boundaries are real — collectives cross them — so
this exercises exactly the code that runs on a pod slice, minus the
physical fabric. conftest's in-process platform setup does not leak into
the spawned workers; they configure themselves (multihost_worker.py)."""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

WORKER = Path(__file__).with_name("multihost_worker.py")
REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_pod():
    nproc, local_devices = 2, 4
    port = _free_port()
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        JAX_PLATFORM_NAME="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={local_devices}",
        PYTHONPATH=os.pathsep.join(
            [str(REPO)] + env.get("PYTHONPATH", "").split(os.pathsep)
        ).strip(os.pathsep),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(nproc), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
        assert "MULTIHOST_OK" in out, out
