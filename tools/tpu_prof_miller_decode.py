"""Miller-4 decode sub-stage isolation on TPU (companion to
tpu_prof_miller.py, which splits fir/gate/decode/full).

Cumulative prefixes through the role-specialized Miller decode:

* gather — gate + role compaction + aligned window gathers;
* sync   — + miller_sync_full_batch on both role window sets;
* rn16   — + the 4-segment RN16 joint cascade;
* epc    — + the 32-segment EPC joint cascade (the prime suspect: 32
  sequential (dynamic_slice -> (span,1800) selection matmul -> argmax)
  iterations per frame under vmap);
* crc    — + PC-aware CRC validation.

Same K-loop difference-quotient timing as bench.py.  Run:
timeout 5400 python tools/tpu_prof_miller_decode.py
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
    from gen2_rfid_tpu.dsp import miller
    from gen2_rfid_tpu.dsp.filters import matched_filter_decimate
    from gen2_rfid_tpu.dsp.gate import gate_detect
    from gen2_rfid_tpu.runtime.frames import gather_aligned_windows
    from gen2_rfid_tpu.runtime.inventory import (ROLE_SLACK,
                                                 classify_commands,
                                                 command_roles,
                                                 check_epc_crc_pc,
                                                 matched_taps, to_planar)
    from gen2_rfid_tpu.sim.tag import Tag
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    cfg = ReaderConfig(miller_m=4, decim=1, max_events=1280)
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=20,
                              seed=2)
    iq2 = to_planar(np.concatenate([tr.iq] * 24))
    n_adc = iq2.shape[1]
    i32 = jnp.int32
    print(f"adc samples/iter: {n_adc}", file=sys.stderr)

    def prefix(x2, stage: str):
        iq = jax.lax.complex(x2[0], x2[1])
        y = matched_filter_decimate(iq, matched_taps(cfg), cfg.decim)
        n = y.shape[0]
        events = gate_detect(y, cfg)
        cap = events.index.shape[0]
        cmd = classify_commands(events.n_pulses, cfg)
        role_q, role_a = command_roles(cmd, events.valid)
        cap_q = min(cap, cap // 2 + 1 + ROLE_SLACK)

        def compact_rows(mask):
            p = jnp.cumsum(mask.astype(i32)) - 1
            s = jnp.where(mask, jnp.minimum(p, cap_q), i32(cap_q))
            return jnp.full((cap_q,), cap, i32).at[s].set(
                jnp.arange(cap, dtype=i32), mode="drop")

        q_rows = compact_rows(role_q)
        a_rows = compact_rows(role_a)
        idx_pad = jnp.concatenate([events.index, jnp.full((1,), n, i32)])
        dc_pad = jnp.concatenate([events.dc, jnp.zeros((1,), events.dc.dtype)])

        def gather_windows(rows, width):
            start = jnp.minimum(idx_pad[rows], n - 1)
            fr = gather_aligned_windows(y, start, width) - dc_pad[rows][:, None]
            return fr

        q_frames = gather_windows(q_rows, cfg.rn16_window)
        a_frames = gather_windows(a_rows, cfg.epc_window)
        if stage == "gather":
            return jnp.sum(jnp.real(q_frames)) + jnp.sum(jnp.real(a_frames))

        q_idx, q_h, q_eps = miller.miller_sync_full_batch(q_frames, cfg)
        a_idx, a_h, a_eps = miller.miller_sync_full_batch(a_frames, cfg)
        if stage == "sync":
            return (jnp.sum(q_idx).astype(jnp.float32)
                    + jnp.sum(jnp.real(q_h)) + jnp.sum(jnp.real(a_h))
                    + jnp.sum(a_idx).astype(jnp.float32))

        q_bits, q_margin = miller.miller_rn16_soft_eps_batch(
            q_frames, q_idx, q_h, q_eps, cfg)
        if stage == "rn16":
            return jnp.sum(q_bits).astype(jnp.float32) + jnp.sum(q_margin)

        if stage.startswith("epc_seg"):
            # Latency-vs-throughput probe: same EPC cascade at different
            # segment counts (seg_bits override; decode robustness NOT
            # asserted here - timing only).  If halving the sequential
            # chain ~halves the time, the cascade is latency-bound and a
            # two-step-ahead prediction rework would pay; if not, it is
            # throughput-bound and the idea dies here.
            sb = int(stage.split("epc_seg")[1])
            det = jax.vmap(lambda f, i, h, e: miller.miller_detect(
                f, i, h, cfg, cfg.epc_data_bits, seg_bits=sb, eps0=e)[0],
                in_axes=(0, 0, 0, 0))
            ab = det(a_frames, a_idx, a_h, a_eps)
            return jnp.sum(ab).astype(jnp.float32)

        a_bits, a_thalf, a_rel = miller.miller_epc_soft_eps_batch(
            a_frames, a_idx, a_h, a_eps, cfg)
        if stage == "epc":
            return jnp.sum(a_bits).astype(jnp.float32) + jnp.sum(a_thalf)

        a_pass, _, _ = check_epc_crc_pc(a_bits)
        if stage == "crc":
            return (jnp.sum(a_pass).astype(jnp.float32)
                    + jnp.sum(a_bits).astype(jnp.float32))
        raise ValueError(stage)

    @functools.partial(jax.jit, static_argnames=("stage", "k"))
    def repeat(x2, stage: str, k: int):
        def body(i, carry):
            acc, x = carry
            acc = acc + prefix(x, stage)
            x = x + acc * jnp.float32(1e-30)
            return acc, x
        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0), x2))
        return acc.reshape(1)

    def timed(stage, k):
        t0 = time.perf_counter()
        out = repeat(iq2, stage, k)
        np.asarray(out)
        return time.perf_counter() - t0

    stages = os.environ.get(
        "MD_STAGES", "gather,sync,rn16,epc,crc").split(",")
    k1, k2 = 1, 5
    prev = 0.0
    for s in stages:
        t_comp0 = time.perf_counter()
        timed(s, k1)
        timed(s, k2)
        compile_s = time.perf_counter() - t_comp0
        t1 = min(timed(s, k1) for _ in range(2))
        t2 = min(timed(s, k2) for _ in range(2))
        per = max((t2 - t1) / (k2 - k1), 1e-9)
        ms = per * 1e3
        print(json.dumps({"stage": s, "ms": round(ms, 2),
                          "delta_ms": round(ms - prev, 2),
                          "Msps": round(n_adc / per / 1e6, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
