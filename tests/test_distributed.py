"""Two-process jax.distributed test: the sharded step must run across REAL
process boundaries (round-1 gap: no multi-host entry existed).  Spawns two
subprocesses running tools/run_distributed.py on a localhost coordinator,
each contributing 2 virtual CPU devices to a 1 seq x 4 map mesh."""

import json
import socket
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_step():
    port = _free_port()
    base = [
        sys.executable,
        str(ROOT / "tools" / "run_distributed.py"),
        "--coordinator",
        f"127.0.0.1:{port}",
        "--num-processes",
        "2",
        "--platform",
        "cpu",
        "--devices-per-process",
        "2",
        "--frames",
        "2",
        "--scan-points",
        "4096",
    ]
    env = {"PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/tmp"}
    import os

    env.update({k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")})
    procs = [
        subprocess.Popen(
            base + ["--process-id", str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"proc failed:\n{out[-3000:]}"
    # Process 0 prints the result line.
    result_lines = [l for l in outs[0].splitlines() if l.startswith("{")]
    assert result_lines, outs[0][-3000:]
    res = json.loads(result_lines[-1])
    assert res["distributed"] == "ok"
    assert res["processes"] == 2
    assert res["devices"] == 4
