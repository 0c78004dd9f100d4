"""TPU experiment: Precision.HIGH selection matmuls + dyadic amp average.

Both candidates from docs/PERF.md:
  1. SEL_PRECISION="high" (bf16x3) — should be exact for 0/+-1 weights
     (three bf16 splits carry a full f32 mantissa; +-1 products are exact)
     at half the MXU passes of "highest" (bf16x6).  Exactness is VERIFIED
     here on hardware (decode count must match), not assumed.
  2. Amplitude moving average via dyadic run_sum instead of the blocked
     cumsum (changes f32 summation order — native-mode-legal; decode count
     must still match on the nominal trace).
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
    from gen2_rfid_tpu.dsp import fm0
    from gen2_rfid_tpu.dsp.filters import (matched_filter_decimate, run_sum)
    from gen2_rfid_tpu.runtime.inventory import (decode_block, matched_taps,
                                                 to_planar)
    from gen2_rfid_tpu.sim.tag import Tag
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    cfg = ReaderConfig(max_events=2048)
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=80,
                              seed=2)
    iq2 = to_planar(np.concatenate([tr.iq] * 8))
    n_adc = iq2.shape[1]
    expected = tr.expected_epc_pass * 8
    taps_np = np.asarray(matched_taps(cfg), np.float32)

    def fn(x2, variant: str):
        iq = jax.lax.complex(x2[0], x2[1])
        y = matched_filter_decimate(iq, taps_np, cfg.decim)
        if variant == "dyadic_avg":
            amp = jnp.abs(y).astype(jnp.float32)
            avg = run_sum(amp, cfg.win_length) / jnp.float32(cfg.win_length)
            stats, _ = decode_block(y, cfg, amp=amp, avg=avg)
        else:
            stats, _ = decode_block(y, cfg)
        return stats.n_epc_correct.astype(jnp.float32)

    def repeat_builder(variant):
        @jax.jit
        def repeat(x2, k):
            def body(i, carry):
                acc, x = carry
                acc = acc + fn(x, variant)
                x = x + acc * jnp.float32(1e-30)
                return acc, x
            acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0), x2))
            return acc.reshape(1)
        return repeat

    def measure(variant, prec):
        fm0.SEL_PRECISION = prec
        # also rebind in modules that imported the name by value
        from gen2_rfid_tpu.dsp import sync as sync_mod, miller as miller_mod
        from gen2_rfid_tpu.dsp import collision as coll_mod
        sync_mod.SEL_PRECISION = prec
        miller_mod.SEL_PRECISION = prec
        coll_mod.SEL_PRECISION = prec
        rep = repeat_builder(f"{variant}:{prec}" if variant == "base"
                             else variant)

        def timed(k):
            t0 = time.perf_counter()
            out = rep(iq2, jnp.int32(k))
            v = float(np.asarray(out)[0])
            dt = time.perf_counter() - t0
            return dt, v

        t_c0 = time.perf_counter()
        _, v1 = timed(1)
        timed(9)
        compile_s = time.perf_counter() - t_c0
        t1 = min(timed(1)[0] for _ in range(2))
        t2, v9 = timed(9)
        t2 = min(t2, timed(9)[0])
        per = max((t2 - t1) / 8, 1e-9)
        print(json.dumps({
            "variant": variant, "prec": prec,
            "exact": bool(abs(v9 - expected * 9) < 0.5),
            "ms": round(per * 1e3, 2),
            "Msps": round(n_adc / per / 1e6, 1),
            "compile_s": round(compile_s, 1)}), flush=True)

    measure("base", "highest")
    measure("base", "high")
    measure("dyadic_avg", "highest")


if __name__ == "__main__":
    main()
