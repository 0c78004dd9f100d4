"""Hardware A/B: fused Pallas gate flag stack vs the XLA native ops.

The round-3 verdict's one remaining Pallas question: does a single-pass
fused kernel (amp -> threshold avg -> rise/qualify/marker/quiet flags,
kernels/gate_stack.py) beat XLA's elementwise chain + three dyadic
windowed sums on the same post-FIR samples?  Run on the TPU:

    timeout 2400 python tools/tpu_gate_stack_experiment.py

Prints one JSON line per variant (difference-quotient timing, K in-jit
iterations chained by a data dependency), plus an on-device equality
check of the two flag arrays.  Record the outcome in docs/PERF.md either
way — the point is to close the question with numbers.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import functools

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gen2_rfid_tpu.config import ReaderConfig
    from gen2_rfid_tpu.dsp.filters import boxcar_taps, matched_filter_decimate
    from gen2_rfid_tpu.kernels.gate_stack import (
        gate_stack_flags,
        native_flags_reference,
    )
    from gen2_rfid_tpu.sim.tag import Tag
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    cfg = ReaderConfig()
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=80,
                              seed=2)
    iq = np.concatenate([tr.iq] * 8)            # bench.py's 9.7 M ADC samples
    n_taps = int(cfg.tag_bit_us / 2 * cfg.adc_rate / 1e6)

    @jax.jit
    def front(x2):
        y = matched_filter_decimate(
            jax.lax.complex(x2[0], x2[1]),
            jnp.asarray(boxcar_taps(n_taps)), cfg.decim)
        return jnp.stack([jnp.real(y), jnp.imag(y)])

    x2 = jnp.asarray(np.stack([iq.real, iq.imag]).astype(np.float32))
    y2 = jax.block_until_ready(front(x2))
    ny = y2.shape[1]
    print(f"post-decim samples: {ny}", file=sys.stderr)

    win, pwh, nt1, frac = (cfg.win_length, cfg.n_samples_pw // 2,
                           cfg.n_samples_t1, cfg.thresh_fraction)

    def xla_body(y2_in):
        y = jax.lax.complex(y2_in[0], y2_in[1])
        return native_flags_reference(y, cfg)

    def pallas_body(y2_in):
        return gate_stack_flags(y2_in, win, pwh, nt1, frac, block=65536)

    # On-device equality first (hardware numerics, not interpret mode).
    fl_x = jax.jit(xla_body)(y2)
    fl_p = jax.jit(pallas_body)(y2)
    neq = int(np.asarray(jnp.sum((fl_x != fl_p).astype(jnp.int32))))
    print(json.dumps({"check": "flags_equal", "mismatches": neq,
                      "n": int(ny)}), flush=True)

    def bench(body, name, k2=17):
        @functools.partial(jax.jit, static_argnames=("k",))
        def repeat(y_in, k: int):
            def it(i, carry):
                acc, yy = carry
                fl = body(yy)
                acc = acc + jnp.sum(fl)
                yy = yy + acc.astype(jnp.float32) * jnp.float32(1e-30)
                return acc, yy
            acc, _ = jax.lax.fori_loop(0, k, it, (jnp.int32(0), y_in))
            return acc.reshape(1)

        def timed(k):
            t0 = time.perf_counter()
            out = repeat(y2, k)
            np.asarray(out)
            return time.perf_counter() - t0

        timed(1)
        timed(k2)
        qs = []
        for _ in range(3):
            t1 = timed(1)
            t2 = timed(k2)
            qs.append(max((t2 - t1) / (k2 - 1), 1e-9))
        per = float(np.median(qs))
        print(json.dumps({
            "variant": name,
            "ms_per_iter": round(per * 1e3, 3),
            "band_ms": [round(min(qs) * 1e3, 3), round(max(qs) * 1e3, 3)],
            "gsps_post_decim": round(ny / per / 1e9, 3),
        }), flush=True)
        return per

    px = bench(xla_body, "xla_native_flags")
    pp = bench(pallas_body, "pallas_gate_stack")
    print(json.dumps({"speedup_pallas_over_xla": round(px / pp, 3)}),
          flush=True)


if __name__ == "__main__":
    main()
