"""Empirical softfix false-accept campaign (round-4 VERDICT item 8).

runtime/softfix.py's docstring claims ~5.5e-4 false accepts per *failed*
frame analytically (36 candidates x 2^-16 CRC collision).  That analysis
ignores that native-mode validation is PC-aware: check_epc_crc_pc tests
EVERY whole-word EPC length hypothesis up to the window, so a random
candidate gets L chances to collide, not one.  This campaign measures the
real rate on the worst-case input model - uniformly random decoded bits
with random reliabilities (what noise-only or wrong-tag windows decode
to) - for both native (PC-aware) and compat (fixed-96) validation.

Run (CPU fine): env -u PYTHONPATH JAX_PLATFORMS=cpu \
    python tools/softfix_false_accept.py [--frames 200000]
One JSON line per mode with the measured rate and a 95% Wilson upper
bound.  docs/SNR.md records the result; tests/test_softfix.py pins a
smaller-N upper bound.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def wilson_upper(k: int, n: int, z: float = 1.96) -> float:
    if n == 0:
        return 1.0
    p = k / n
    den = 1 + z * z / n
    center = p + z * z / (2 * n)
    rad = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    return (center + rad) / den


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200_000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gen2_rfid_tpu.config import ReaderConfig
    from gen2_rfid_tpu.runtime.inventory import _validate_epc
    from gen2_rfid_tpu.runtime.softfix import recover_epc_batch

    for mode in ("native", "compat"):
        cfg = ReaderConfig(mode=mode, epc_softfix=8)
        n = cfg.epc_bits - 1   # decoded table width (dummy bit excluded)

        @jax.jit
        def run(bits, rel):
            def validate(b):
                return _validate_epc(b, cfg)
            _, fixed = recover_epc_batch(bits, rel, cfg, validate)
            return jnp.sum(fixed.astype(jnp.int32))

        rng = np.random.default_rng(args.seed)
        accepts = 0
        done = 0
        while done < args.frames:
            b = args.batch
            bits = rng.integers(0, 2, size=(b, n)).astype(np.int32)
            rel = rng.random((b, n)).astype(np.float32)
            accepts += int(run(jnp.asarray(bits), jnp.asarray(rel)))
            done += b
        rate = accepts / done
        print(json.dumps({
            "mode": mode, "frames": done, "false_accepts": accepts,
            "rate": round(rate, 7),
            "wilson95_upper": round(wilson_upper(accepts, done), 7),
            "analytic_single_crc": round(36 / 65536, 7),
        }), flush=True)


if __name__ == "__main__":
    main()
