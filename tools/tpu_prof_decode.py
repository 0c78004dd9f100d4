"""Decode sub-stage isolation profile on TPU (companion to
tpu_prof_stages.py, which isolated the gate: compaction ~12 ms dominated).

Cumulative prefixes through the role-specialized decode, plus a final full
decode_block to measure the blocked-compaction gate fix.  Same K-loop
difference-quotient timing as bench.py.
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
    from gen2_rfid_tpu.dsp import fm0, sync
    from gen2_rfid_tpu.dsp.filters import matched_filter_decimate
    from gen2_rfid_tpu.dsp.gate import gate_detect
    from gen2_rfid_tpu.runtime.frames import gather_aligned_windows
    from gen2_rfid_tpu.runtime.inventory import (ROLE_SLACK,
                                                 check_epc_crc_batch,
                                                 classify_commands,
                                                 command_roles, decode_block,
                                                 matched_taps, to_planar)
    from gen2_rfid_tpu.sim.tag import Tag
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    cfg = ReaderConfig(max_events=1536)
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=80,
                              seed=2)
    iq2 = to_planar(np.concatenate([tr.iq] * 8))
    n_adc = iq2.shape[1]
    i32 = jnp.int32

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
            m2 = (jnp.real(fr) ** 2 + jnp.imag(fr) ** 2).astype(jnp.float32)
            return fr, m2

        q_frames, q_magn2 = gather_windows(q_rows, cfg.rn16_window)
        a_frames, a_magn2 = gather_windows(a_rows, cfg.epc_window)
        if stage == "gather":
            return jnp.sum(jnp.real(q_frames)) + jnp.sum(jnp.real(a_frames))

        q_idx, q_h = sync.tag_sync_batch(q_frames, cfg)
        a_idx, a_h = sync.tag_sync_batch(a_frames, cfg)
        if stage == "sync":
            return (jnp.sum(q_idx).astype(jnp.float32)
                    + jnp.sum(jnp.real(q_h)) + jnp.sum(jnp.real(a_h))
                    + jnp.sum(a_idx).astype(jnp.float32))

        q_bits, q_margin = fm0.rn16_detect_soft_batch(q_frames, q_idx, q_h, cfg)
        if stage == "rn16":
            return jnp.sum(q_bits).astype(jnp.float32) + jnp.sum(q_margin)

        # EPC energy grid only: slice + selection matmul + argmax.
        sel, k = fm0._energy_selection_matrix(cfg)
        selj = jnp.asarray(sel)
        cand, _ = fm0.epc_period_grid(cfg)

        def grid_one(m2, idx):
            a_start = jnp.minimum(idx, m2.shape[0] - k)
            aligned = jax.lax.dynamic_slice(m2, (a_start,), (k,))
            return jnp.argmax(aligned @ selj)

        t_sel = jax.vmap(grid_one)(a_magn2, a_idx)
        if stage == "grid":
            return jnp.sum(t_sel).astype(jnp.float32)

        a_bits, a_thalf = fm0.epc_detect_batch(a_frames, a_magn2, a_idx, a_h,
                                               cfg)
        if stage == "epc":
            return jnp.sum(a_bits).astype(jnp.float32) + jnp.sum(a_thalf)

        a_pass = check_epc_crc_batch(a_bits)
        if stage == "crc":
            return (jnp.sum(a_pass).astype(jnp.float32)
                    + jnp.sum(a_bits).astype(jnp.float32))
        raise ValueError(stage)

    def full(x2):
        iq = jax.lax.complex(x2[0], x2[1])
        y = matched_filter_decimate(iq, matched_taps(cfg), cfg.decim)
        stats, _ = decode_block(y, cfg)
        return stats.n_epc_correct.astype(jnp.float32)

    @functools.partial(jax.jit, static_argnames=("stage", "k"))
    def repeat(x2, stage: str, k: int):
        def body(i, carry):
            acc, x = carry
            r = full(x) if stage == "full" else prefix(x, stage)
            acc = acc + r
            x = x + acc * jnp.float32(1e-30)
            return acc, x
        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0), x2))
        return acc.reshape(1)

    def timed(stage, k):
        t0 = time.perf_counter()
        out = repeat(iq2, stage, k)
        np.asarray(out)
        return time.perf_counter() - t0

    stages = ["gather", "sync", "rn16", "grid", "epc", "crc", "full"]
    k1, k2 = 1, 9
    results = {}
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
        results[s] = round(ms, 2)
        print(json.dumps({"stage": s, "ms": round(ms, 2),
                          "delta_ms": round(ms - prev, 2),
                          "Msps": round(n_adc / per / 1e6, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)
        prev = ms
    print(json.dumps({"profile": results, "n_adc": n_adc}), flush=True)


if __name__ == "__main__":
    main()
