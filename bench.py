"""Benchmark: end-to-end decode throughput (I/Q samples/s) on one chip.

Baseline: the reference reader's implicit real-time budget is sustaining
2 Msps on one CPU core (README.md:40,104-106; BASELINE.md).  vs_baseline is
measured samples/s divided by 2e6.

Timing methodology (this TPU runtime is fully asynchronous - even
block_until_ready returns before execution, and only D2H transfers
synchronize, with variable latency): the pipeline is iterated K times
*inside one jit* via lax.fori_loop with a data dependency chaining
iterations, and wall time is measured dispatch->transfer of a tiny int32
result.  Per-iteration time is the difference quotient between K2 and K1
runs, cancelling the constant dispatch/transfer overhead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")


def main():
    import functools

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from gen2_rfid_tpu.config import ReaderConfig
    from gen2_rfid_tpu.runtime.inventory import (
        decode_capture_planar,
        to_planar,
    )
    from gen2_rfid_tpu.sim.tag import Tag
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    # Event capacity sized to the workload: this capture carries 1280
    # command events (80 rounds x 2 events x 8 tiles); 1536 leaves 20%
    # headroom.  Decode cost scales with the static capacity (role tables
    # are cap/2+slack rows), so a deployment sizes it to expected event
    # density - 2048 on the same capture measures ~7% slower.
    cfg = ReaderConfig(max_events=1536)
    # ~80 rounds ~= 1.2 M samples; tile to ~9.7 M ADC samples (~4.9 s of
    # 2 Msps capture) per iteration.
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=80,
                              seed=2)
    reps_tile = 8
    iq2 = to_planar(np.concatenate([tr.iq] * reps_tile))
    n = iq2.shape[1]
    expected = tr.expected_epc_pass * reps_tile

    core = decode_capture_planar.__wrapped__  # un-jitted pipeline

    @functools.partial(jax.jit, static_argnames=("k",))
    def repeat(x2, k: int):
        def body(i, carry):
            acc, x = carry
            stats, _ = core(x, cfg)
            acc = acc + stats.n_epc_correct
            # Data-dependent no-op perturbation chains iterations and stops
            # XLA from hoisting the loop body.
            x = x + acc.astype(jnp.float32) * jnp.float32(1e-30)
            return acc, x
        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.int32(0), x2))
        return acc.reshape(1)

    def timed(k: int) -> float:
        t0 = time.perf_counter()
        out = repeat(iq2, k)
        val = int(np.asarray(out)[0])   # transfer = the only real sync point
        dt = time.perf_counter() - t0
        if val != expected * k:
            # A perf number on a broken decode is worse than no number.
            print(f"FATAL: decode mismatch {val} != {expected * k} (k={k})",
                  file=sys.stderr)
            sys.exit(1)
        return dt

    # Remote-queue latency is highly variable (docs/PERF.md: same-binary
    # runs spanned 1202-1325 Msps); one slow sample must not become the
    # headline.  Take R independent paired difference quotients and report
    # the median, with the min/max band in the artifact so spread is
    # visible instead of reading as a regression.
    k1, k2, reps = 1, 9, 3
    timed(k1)          # warmup/compile for k1
    timed(k2)          # warmup/compile for k2
    quotients = []
    for _ in range(reps):
        t1 = timed(k1)
        t2 = timed(k2)
        quotients.append(max((t2 - t1) / (k2 - k1), 1e-9))
    per_iter = float(np.median(quotients))

    sps = n / per_iter
    baseline = 2e6  # reference CPU reader real-time budget, samples/s
    # BASELINE.md asks for EPC decodes/s alongside samples/s: the same
    # timed iteration decodes `expected` correct EPCs, so the rate shares
    # the difference-quotient denominator.  The reference's golden trace
    # reads ~70 EPCs in ~35 s of capture (~2 EPC/s real-time).
    print(json.dumps({
        "metric": "iq_decode_throughput",
        "value": round(sps / 1e6, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(sps / baseline, 2),
        "epc_per_s": round(expected / per_iter, 1),
        "band": [round(n / max(quotients) / 1e6, 1),
                 round(n / min(quotients) / 1e6, 1)],
    }))


if __name__ == "__main__":
    main()
