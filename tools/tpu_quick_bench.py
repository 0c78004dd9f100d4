"""Quick TPU measurement: front-only FIR + full pipeline (2 compiles).

Used between optimization steps; same K-loop difference-quotient timing as
bench.py.
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
    from gen2_rfid_tpu.runtime.inventory import (decode_block, matched_taps,
                                                 to_planar)
    from gen2_rfid_tpu.sim.tag import Tag
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    cfg = ReaderConfig(max_events=1536)
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=80,
                              seed=2)
    iq2 = to_planar(np.concatenate([tr.iq] * 8))
    n_adc = iq2.shape[1]
    expected = tr.expected_epc_pass * 8
    taps_np = np.asarray(matched_taps(cfg), np.float32)

    def fn(x2, which: str):
        iq = jax.lax.complex(x2[0], x2[1])
        y = matched_filter_decimate(iq, taps_np, cfg.decim)
        if which == "front":
            return jnp.sum(jnp.real(y)) + jnp.sum(jnp.imag(y))
        stats, _ = decode_block(y, cfg)
        return stats.n_epc_correct.astype(jnp.float32)

    @functools.partial(jax.jit, static_argnames=("which", "k"))
    def repeat(x2, which: str, k: int):
        def body(i, carry):
            acc, x = carry
            acc = acc + fn(x, which)
            x = x + acc * jnp.float32(1e-30)
            return acc, x
        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0), x2))
        return acc.reshape(1)

    def timed(which, k):
        t0 = time.perf_counter()
        out = repeat(iq2, which, k)
        v = float(np.asarray(out)[0])
        if which == "full" and abs(v - expected * k) > 0.5:
            print(json.dumps({"WARNING": "decode mismatch",
                              "got": v, "want": expected * k}), flush=True)
        return time.perf_counter() - t0

    k1, k2 = 1, 9
    for which in ("front", "full"):
        t_comp0 = time.perf_counter()
        timed(which, k1)
        timed(which, k2)
        compile_s = time.perf_counter() - t_comp0
        t1 = min(timed(which, k1) for _ in range(2))
        t2 = min(timed(which, k2) for _ in range(2))
        per = max((t2 - t1) / (k2 - k1), 1e-9)
        print(json.dumps({"which": which, "ms": round(per * 1e3, 2),
                          "Msps": round(n_adc / per / 1e6, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
