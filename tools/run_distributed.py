"""CLI over `gen2_rfid_tpu.shard.launch.run_local`: N-process distributed
decode of a capture on localhost with cross-process consistency checking.

Usage:
    python tools/run_distributed.py CAPTURE --num-processes 2 \
        --cpu-devices-per-proc 4 [--expect-json '{"n_epc_correct": 6, ...}']

Writes one JSON line (the agreed stats record) and exits nonzero if any
process fails, disagrees, or misses --expect-json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gen2_rfid_tpu.shard.launch import run_local  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("trace")
    p.add_argument("--num-processes", type=int, default=2)
    p.add_argument("--cpu-devices-per-proc", type=int, default=4)
    p.add_argument("--events-per-shard", type=int, default=64)
    p.add_argument("--max-events", type=int, default=256)
    p.add_argument("--expect-json", default=None,
                   help="JSON dict of stats keys that must match exactly")
    args = p.parse_args(argv)

    rec = run_local(args.trace, args.num_processes, args.cpu_devices_per_proc,
                    args.events_per_shard, args.max_events)
    print(json.dumps(rec, sort_keys=True))
    if args.expect_json:
        want = json.loads(args.expect_json)
        bad = {k: (rec.get(k), v) for k, v in want.items() if rec.get(k) != v}
        if bad:
            print(f"MISMATCH vs expectation: {bad}", file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
