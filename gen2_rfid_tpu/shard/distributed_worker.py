"""Per-process entry point for multi-process distributed decode.

Run as ``python -m gen2_rfid_tpu.shard.distributed_worker`` once per
process (one process per host on a real pod; N localhost processes with
forced virtual CPU devices for validation — see tools/run_distributed.py).
Each process:

1. initializes the JAX distributed runtime (`init_distributed`),
2. memory-maps only its own devices' time slices of the capture file and
   decodes through `decode_file_distributed` (the same `shard_map` halo
   program as single-host),
3. all-gathers the per-channel stats to the host and writes one JSON line
   (every process writes the same values — a cheap cross-process
   consistency check for the launcher).

The reference reader is strictly single-process (SURVEY.md section 2.5);
this driver is the pod-scale replacement for "run the flowgraph longer".
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("trace", help="capture file (reference byte format)")
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (omit on auto-detecting TPU pods)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--cpu-devices", type=int, default=0,
                   help="force N virtual CPU devices per process (validation "
                        "mode; 0 = use the platform's real devices)")
    p.add_argument("--events-per-shard", type=int, default=64)
    p.add_argument("--max-events", type=int, default=256)
    p.add_argument("--out", default=None, help="write stats JSON here")
    args = p.parse_args(argv)

    if args.cpu_devices:
        # Force-override: a parent test process may itself export a
        # different device count; --cpu-devices is authoritative here.
        kept = [f for f in os.environ.get("XLA_FLAGS", "").split()
                if "xla_force_host_platform_device_count" not in f]
        kept.append(
            f"--xla_force_host_platform_device_count={args.cpu_devices}")
        os.environ["XLA_FLAGS"] = " ".join(kept)
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from ..config import ReaderConfig
    from ..runtime.stats import unique_tags
    from .distributed import decode_file_distributed, init_distributed, stats_to_host

    init_distributed(coordinator_address=args.coordinator,
                     num_processes=args.num_processes,
                     process_id=args.process_id)

    cfg = ReaderConfig(max_events=args.max_events)
    stats, _ = decode_file_distributed(
        args.trace, cfg, events_per_shard=args.events_per_shard)
    host = stats_to_host(stats)

    reads = np.asarray(host.tag_reads)[0]
    nz = np.nonzero(reads)[0]
    rec = {
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "n_devices": len(jax.devices()),
        "n_queries": int(np.asarray(host.n_queries)[0]),
        "n_epc_correct": int(np.asarray(host.n_epc_correct)[0]),
        "round": int(np.asarray(host.cur_inventory_round)[0]),
        "unique_tags": int(unique_tags(jax.tree.map(lambda a: a[0], host))),
        "tag_reads": {int(t): int(reads[t]) for t in nz},
    }
    line = json.dumps(rec, sort_keys=True)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
