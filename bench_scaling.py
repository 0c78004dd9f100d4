"""Scaling benchmark: sharded decode throughput at 1 vs N devices.

BASELINE.md targets >=80% scaling efficiency at N hosts for the time-block
sharded pipeline (overlap-save halo exchange over ICI).  This harness runs
the identical `shard_map` program (`shard.decode_sharded`) at
n_time in {1, N} over whatever devices the runtime exposes and reports

    efficiency = throughput(N) / (N * throughput(1))

It runs unchanged in three environments:
  * this repo's CI: CPU with 8 virtual devices
    (`env -u PYTHONPATH JAX_PLATFORMS=cpu
     XLA_FLAGS=--xla_force_host_platform_device_count=8 python
     bench_scaling.py`) - validates the harness + sharding, numbers are
    NOT a TPU claim (CPU "devices" share cores, so efficiency ~1/N is
    expected here);
  * a single real TPU chip (degenerate N=1: reports per-chip throughput);
  * a real pod slice (the meaningful measurement; no code changes).

Timing uses the same async-safe difference-quotient methodology as
bench.py: K iterations inside one jit chained by a data dependency, timed
dispatch -> tiny D2H transfer, per-iteration time = (t_K2 - t_K1)/(K2 - K1).

Prints ONE JSON line:
  {"metric": "scaling_efficiency", "value": eff, "unit": "fraction",
   "n_devices": N, "msps_1": ..., "msps_n": ..., "per_device_msps_n": ...}
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")


def _measure(run, iq2, expected, k1=1, k2=5):
    """Per-iteration seconds for `run` via the difference quotient."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("k",))
    def repeat(x2, k: int):
        def body(i, carry):
            acc, x = carry
            stats, _ = run(x)
            acc = acc + stats.n_epc_correct.sum()
            x = x + acc.astype(jnp.float32) * jnp.float32(1e-30)
            return acc, x

        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.int32(0), x2))
        return acc.reshape(1)

    def timed(k: int) -> float:
        t0 = time.perf_counter()
        out = repeat(iq2, k)
        val = int(np.asarray(out)[0])  # D2H transfer = the sync point
        dt = time.perf_counter() - t0
        if val != expected * k:
            print(f"WARNING: decode mismatch {val} != {expected * k} (k={k})",
                  file=sys.stderr)
        return dt

    timed(k1)
    t1 = min(timed(k1) for _ in range(2))
    timed(k2)
    t2 = min(timed(k2) for _ in range(2))
    return max((t2 - t1) / (k2 - k1), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from gen2_rfid_tpu.config import ReaderConfig
    from gen2_rfid_tpu.shard.decode_sharded import make_sharded_decoder
    from gen2_rfid_tpu.shard.mesh import make_mesh
    from gen2_rfid_tpu.sim.tag import Tag
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    n_dev = len(jax.devices())
    cfg = ReaderConfig(max_events=2048)
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=40,
                              seed=2)
    # Tile so every device gets substantial work, pad so N divides by
    # n_time * decim for both mesh sizes.
    reps = max(2, n_dev)
    iq = np.concatenate([tr.iq] * reps)
    quantum = n_dev * cfg.decim
    pad = (-iq.size) % quantum
    iq = np.concatenate([iq, np.zeros(pad, np.complex64)])
    iq2 = jnp.asarray(
        np.stack([iq.real, iq.imag])[None].astype(np.float32))  # (1, 2, N)
    expected = tr.expected_epc_pass * reps
    n_samples = iq.size

    msps = {}
    for n_time in sorted({1, n_dev}):
        # Per-shard event capacity = global merge capacity split across
        # shards (the trace has ~2*rounds*reps events; 2048 covers it).
        run = make_sharded_decoder(cfg, make_mesh(n_time=n_time, n_chan=1),
                                   events_per_shard=cfg.max_events // n_time)
        per_iter = _measure(run, iq2, expected)
        msps[n_time] = n_samples / per_iter / 1e6

    if n_dev > 1:
        eff = msps[n_dev] / (n_dev * msps[1])
    else:
        eff = 1.0
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "fraction",
        "n_devices": n_dev,
        "msps_1": round(msps[1], 2),
        "msps_n": round(msps[max(msps)], 2),
        "per_device_msps_n": round(msps[max(msps)] / n_dev, 2),
    }))


if __name__ == "__main__":
    main()
