"""Miller-4 stage isolation on TPU: why is the miller4 bench config
(decim=1, M=4) at ~97 Msps when the FM0 flagship runs 1.28 Gsps?

Two structural differences vs FM0/decim-5:

* the gate runs on 5x the post-decimation samples (decim 1 keeps the
  full 2 Msps rate);
* the per-event decode is the Miller segment cascade: per segment a
  joint (offset, chip-period) selection-table search, M=4 meaning
  segments of 4 bits and 2*M subcarrier half-cycles per bit.

Cumulative prefixes with the difference-quotient harness attribute the
gap.  Run: timeout 5400 python tools/tpu_prof_miller.py
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
    from gen2_rfid_tpu.dsp.filters import matched_filter_decimate
    from gen2_rfid_tpu.dsp.gate import gate_detect
    from gen2_rfid_tpu.runtime.inventory import (
        decode_block,
        decode_events,
        matched_taps,
        to_planar,
    )
    from gen2_rfid_tpu.sim.tag import Tag
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    cfg = ReaderConfig(miller_m=4, decim=1, max_events=1280)
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=20,
                              seed=2)
    iq2 = to_planar(np.concatenate([tr.iq] * 24))
    n_adc = iq2.shape[1]
    print(f"adc samples/iter: {n_adc}", file=sys.stderr)

    def prefix(x2, stage: str):
        iq = jax.lax.complex(x2[0], x2[1])
        y = matched_filter_decimate(iq, matched_taps(cfg), cfg.decim)
        if stage == "fir":
            return jnp.sum(jnp.real(y))
        events = gate_detect(y, cfg)
        if stage == "gate":
            return (jnp.sum(events.index).astype(jnp.float32)
                    + jnp.sum(jnp.real(events.dc)))
        dec = decode_events(y, events, cfg, specialize=True)
        if stage == "decode":
            return (jnp.sum(dec.epc_pass.astype(jnp.int32)).astype(jnp.float32)
                    + jnp.sum(dec.rn16_bits).astype(jnp.float32))
        stats, _ = decode_block(y, cfg)
        return stats.n_epc_correct.astype(jnp.float32)

    def bench(stage, k2=5):
        @functools.partial(jax.jit, static_argnames=("k",))
        def repeat(x2, k: int):
            def it(i, carry):
                acc, x = carry
                acc = acc + prefix(x, stage)
                x = x + acc * jnp.float32(1e-30)
                return acc, x
            acc, _ = jax.lax.fori_loop(0, k, it, (jnp.float32(0), x2))
            return acc.reshape(1)

        def timed(k):
            t0 = time.perf_counter()
            np.asarray(repeat(iq2, k))
            return time.perf_counter() - t0

        timed(1)
        timed(k2)
        qs = []
        for _ in range(3):
            t1 = timed(1)
            t2 = timed(k2)
            qs.append(max((t2 - t1) / (k2 - 1), 1e-9))
        ms = float(np.median(qs)) * 1e3
        print(json.dumps({"stage": stage, "ms_per_iter": round(ms, 2),
                          "band_ms": [round(min(qs) * 1e3, 2),
                                      round(max(qs) * 1e3, 2)]}), flush=True)
        return ms

    prev = 0.0
    for st in ("fir", "gate", "decode", "full"):
        ms = bench(st)
        print(json.dumps({"marginal": st, "ms": round(ms - prev, 2)}),
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
