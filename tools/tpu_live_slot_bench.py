"""RTT-free live-slot device-compute measurement (round-4 VERDICT item 4).

The round-4 live-loop run measured 327 ms p50/slot vs round 2's 4.2 ms and
attributed the difference to tunnel round-trip - plausibly, but the metric
conflated remote-queue RTT with on-device compute, so a real live-path
regression could hide behind "congested day".  This harness measures the
per-slot DEVICE compute alone, immune to tunnel congestion by the same
construction as bench.py: K slot decodes chained inside ONE jitted program
by a data dependency, timed dispatch->D2H, per-slot time = the
(K2-K1) difference quotient.

It times the exact shipping slot decoders (`runtime.live_decode.
_window_decoder` inner fn, modes rn16 / epc / sic) on representative slot
blocks cut from a synthesized inventory (command + T1 + reply, the block
shape the live loop feeds after bucket padding).

Run: timeout 3600 python tools/tpu_live_slot_bench.py
Prints one JSON line per mode: {"mode": ..., "per_slot_us": ...}.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")


def slot_blocks(cfg):
    """(rn16_block2, epc_block2) planar float32 ADC-rate slot blocks."""
    import jax.numpy as jnp

    from gen2_rfid_tpu.runtime.inventory import (decode_capture_planar,
                                                 to_planar)
    from gen2_rfid_tpu.sim.tag import Tag
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=2,
                              seed=1)
    # Planar entry: complex64 never crosses the tunnel's jit boundary.
    _, dec = decode_capture_planar(jnp.asarray(to_planar(tr.iq)), cfg)
    idx = np.asarray(dec.index)
    valid = np.asarray(dec.valid)
    roles = np.asarray(dec.cmd_type)
    order = np.argsort(idx[valid])
    iv = idx[valid][order]
    rv = roles[valid][order]
    blocks = []
    prev_end = 0
    for k, want_epc in ((0, False), (1, True)):
        i = iv[k]
        w = cfg.epc_window if want_epc else cfg.rn16_window
        end = (i + w) * cfg.decim + 64
        blk = tr.iq[prev_end:end]
        prev_end = 0  # both blocks start at capture head (CW lead-in)
        b2 = np.stack([blk.real, blk.imag]).astype(np.float32)
        blocks.append(b2)
    return blocks


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from gen2_rfid_tpu.config import ReaderConfig
    from gen2_rfid_tpu.runtime.live_decode import _window_decoder

    cfg = ReaderConfig()
    rn16_b, epc_b = slot_blocks(cfg)
    print(f"block sizes: rn16 {rn16_b.shape} epc {epc_b.shape}",
          file=sys.stderr)

    for mode, blk in (("rn16", rn16_b), ("epc", epc_b), ("sic", rn16_b)):
        dec = _window_decoder(cfg, mode)

        @functools.partial(jax.jit, static_argnames=("k",))
        def repeat(x2, k: int, dec=dec):
            def it(i, carry):
                acc, x = carry
                out = dec(x)
                bits = out[1]
                acc = acc + jnp.sum(bits).astype(jnp.float32)
                x = x + acc * jnp.float32(1e-30)
                return acc, x
            acc, _ = jax.lax.fori_loop(0, k, it, (jnp.float32(0), x2))
            return acc.reshape(1)

        x = jnp.asarray(blk)
        fits = bool(np.asarray(jax.jit(lambda b: dec(b)[0])(x)))
        if not fits:
            print(f"FATAL: {mode} slot block does not decode (fits=False)",
                  file=sys.stderr)
            sys.exit(1)

        def timed(k):
            t0 = time.perf_counter()
            np.asarray(repeat(x, k))
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        timed(1); timed(33)
        compile_s = time.perf_counter() - t0
        qs = []
        for _ in range(3):
            t1 = timed(1)
            t2 = timed(33)
            qs.append(max((t2 - t1) / 32, 1e-9))
        per = float(np.median(qs))
        print(json.dumps({
            "mode": mode, "per_slot_us": round(per * 1e6, 1),
            "band_us": [round(min(qs) * 1e6, 1), round(max(qs) * 1e6, 1)],
            "block_samples": int(blk.shape[1]),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
