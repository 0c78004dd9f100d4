"""Localhost multi-process launcher for the distributed decode path.

Spawns N real `jax.distributed` processes (separate interpreters, a real
coordinator service, gloo cross-process collectives) each with forced
virtual CPU devices, so `shard/distributed.py`'s per-process mmap slicing
and global-array assembly run exactly as they would with one process per
pod host.  On a real pod the workers are instead started by the cluster
runner (one per host, no --cpu-devices); this module is the validation
harness this environment can run.

The reference reader has no multi-process mode at all (SURVEY.md
section 2.5) — correctness target is bit-exact agreement with the
single-process decode of the same capture.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from typing import Dict

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def worker_env() -> Dict[str, str]:
    """Subprocess env: package importable, no TPU-tunnel sitecustomize
    (the container's PYTHONPATH sitecustomize would force the axon
    platform and rewrite JAX env vars)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    return env


def run_local(path: str, num_processes: int, cpu_devices: int,
              events_per_shard: int = 64, max_events: int = 256,
              timeout: float = 600.0) -> dict:
    """Run the capture through N localhost worker processes; return the
    stats record all processes agreed on (raises on any failure, timeout,
    or cross-process disagreement)."""
    port = free_port()
    procs = []
    for pid in range(num_processes):
        cmd = [
            sys.executable, "-m", "gen2_rfid_tpu.shard.distributed_worker",
            path,
            "--coordinator", f"127.0.0.1:{port}",
            "--num-processes", str(num_processes),
            "--process-id", str(pid),
            "--cpu-devices", str(cpu_devices),
            "--events-per-shard", str(events_per_shard),
            "--max-events", str(max_events),
        ]
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, env=worker_env(),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    records = []
    for pid, pr in enumerate(procs):
        try:
            out, err = pr.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError(f"process {pid} timed out")
        if pr.returncode != 0:
            raise RuntimeError(
                f"process {pid} exited {pr.returncode}:\n{err[-2000:]}")
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        records.append(json.loads(line))

    base = {k: v for k, v in records[0].items() if k != "process_id"}
    for r in records[1:]:
        other = {k: v for k, v in r.items() if k != "process_id"}
        if other != base:
            raise RuntimeError(f"process disagreement:\n{base}\n{other}")
    return base
