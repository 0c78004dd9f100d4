"""Measure the replicated sort + replay term of the pod-scaling model.

The sharded decoder's only replicated (non-sharding) stage is the
per-channel argsort + replay_inventory_batch over the gathered event
tables (shard/decode_sharded.py).  tools/scaling_model.py models it as
t_serial(E) = a + b*E; this probe measures it directly at several table
sizes with the async-safe difference-quotient harness (the scan fallback
is OFF the fast path after round-5's replay_inventory_batch, so this is
argsort + O(E) parallel reductions).

Run: timeout 3600 python tools/tpu_replay_bench.py
One JSON line per table size.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from gen2_rfid_tpu.config import ReaderConfig
    from gen2_rfid_tpu.runtime.inventory import (decode_capture_planar,
                                                 replay_inventory_batch,
                                                 to_planar)
    from gen2_rfid_tpu.sim.tag import Tag
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    base_cfg = ReaderConfig(max_events=256)
    tr = synthesize_inventory(base_cfg, [Tag.with_id(27, seed=7)],
                              n_rounds=20, seed=2)
    # Planar entry: complex64 never crosses the tunnel's jit boundary.
    _, dec = decode_capture_planar(jnp.asarray(to_planar(tr.iq)), base_cfg)
    dec_host = jax.tree.map(lambda a: np.asarray(a), dec)

    for e in (2048, 8192, 24576):
        reps = -(-e // 256)
        span = int(dec_host.index.max()) + base_cfg.epc_window + 64

        def tile(a):
            out = np.concatenate([a] * reps, axis=0)[:e]
            return out

        idx = np.concatenate(
            [dec_host.index + k * span for k in range(reps)])[:e]
        tbl = jax.tree.map(tile, dec_host)._replace(index=idx.astype(np.int32))
        cfg = ReaderConfig(max_events=e, max_num_queries=1 << 30)
        tbl_j = jax.tree.map(jnp.asarray, tbl)

        @functools.partial(jax.jit, static_argnames=("k",))
        def repeat(t, k: int):
            def it(i, carry):
                acc, tt = carry
                order = jnp.argsort(tt.index)
                flat = jax.tree.map(lambda a: a[order], tt)
                stats = replay_inventory_batch(
                    jax.tree.map(lambda a: a[None], flat), cfg)
                acc = acc + stats.n_epc_correct[0].astype(jnp.int32)
                # data dependence the compiler cannot fold away (acc*0
                # const-folds and the loop body hoists as invariant)
                tt = tt._replace(index=tt.index + jnp.minimum(acc, 0))
                return acc, tt
            acc, _ = jax.lax.fori_loop(0, k, it, (jnp.int32(0), t))
            return acc.reshape(1)

        def timed(k):
            t0 = time.perf_counter()
            np.asarray(repeat(tbl_j, k))
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        timed(1); timed(17)
        compile_s = time.perf_counter() - t0
        qs = []
        for _ in range(3):
            qs.append(max((timed(17) - timed(1)) / 16, 1e-9))
        per = float(np.median(qs))
        print(json.dumps({"table_slots": e,
                          "sort_replay_ms": round(per * 1e3, 3),
                          "band_ms": [round(min(qs) * 1e3, 3),
                                      round(max(qs) * 1e3, 3)],
                          "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
