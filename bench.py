"""Benchmark: end-to-end decode throughput (I/Q samples/s) on one chip.

Baseline: the reference reader's implicit real-time budget is sustaining
2 Msps on one CPU core (README.md:40,104-106; BASELINE.md).  vs_baseline is
measured samples/s divided by 2e6.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gen2_rfid_tpu.config import ReaderConfig
    from gen2_rfid_tpu.runtime.inventory import decode_capture_planar, to_planar
    from gen2_rfid_tpu.sim.tag import Tag
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    cfg = ReaderConfig(max_events=1024)
    # ~80 rounds ~= 1.2 M samples; tile to ~9.7M samples (~4.9 s of 2 Msps
    # capture, 78 MB complex64) for a stable measurement.
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=80, seed=2)
    reps_tile = 8
    iq_np = np.concatenate([tr.iq] * reps_tile)
    iq = to_planar(iq_np)
    n = iq.shape[1]

    def run(x):
        stats, _ = decode_capture_planar(x, cfg)
        return stats.n_epc_correct

    # Warmup / compile.
    out = jax.block_until_ready(run(iq))
    n_ok = int(np.asarray(out))
    expected = tr.expected_epc_pass * reps_tile
    if n_ok != expected:
        print(f"WARNING: decode mismatch {n_ok} != {expected}", file=sys.stderr)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(iq)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    sps = n / dt
    baseline = 2e6  # reference CPU reader real-time budget, samples/s
    print(json.dumps({
        "metric": "iq_decode_throughput",
        "value": round(sps / 1e6, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(sps / baseline, 2),
    }))


if __name__ == "__main__":
    main()
