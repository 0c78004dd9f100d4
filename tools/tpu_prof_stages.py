"""Gate/decode sub-stage isolation profile on TPU.

Cumulative-prefix variants of the native decode pipeline, each timed with
the K-loop difference-quotient methodology (see bench.py: this runtime is
fully async; only D2H syncs).  The delta between successive prefixes is the
marginal cost of that sub-stage *as fused into the pipeline* — XLA fusion
means deltas are attributable but not perfectly separable.

Stages (each includes all previous):
  fir      matched filter + decimate
  ampavg   |y| + 100-sample moving average + threshold
  runsums  rise/qualify/quiet (dyadic windowed 0/1 run counts)
  pulses   segmented rises-since-reset + trigger predicate
  compact  trigger compaction (global cumsum + scatter to event table)
  gate     + per-event DC/noise window stats (= full gate_detect)
  windows  + role classification, compaction, q/a window gathers
  decode   + sync / RN16 / EPC grid / CRC (role-specialized)
  full     decode_block (adds the replay)

Run: python tools/tpu_prof_stages.py  (TPU; ~10 compiles, expect many min
under the shared remote compile queue).
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
    from gen2_rfid_tpu.dsp.filters import (matched_filter_decimate,
                                           moving_sum, run_sum)
    from gen2_rfid_tpu.dsp.gate import (_event_window_stats,
                                        _rises_since_reset, GateEvents)
    from gen2_rfid_tpu.runtime.inventory import (decode_block, decode_events,
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
        """Run the pipeline up to `stage`; return a scalar data dependency."""
        iq = jax.lax.complex(x2[0], x2[1])
        y = matched_filter_decimate(iq, matched_taps(cfg), cfg.decim)
        if stage == "fir":
            return jnp.sum(jnp.real(y))
        n = y.shape[0]
        arange = jnp.arange(n, dtype=i32)
        amp = jnp.abs(y).astype(jnp.float32)
        avg = moving_sum(amp, cfg.win_length) / jnp.float32(cfg.win_length)
        thresh = avg * jnp.float32(cfg.thresh_fraction)
        if stage == "ampavg":
            return jnp.sum(thresh)

        pw_half = cfg.n_samples_pw // 2
        nt1 = cfg.n_samples_t1
        npc = cfg.num_pulses_command
        above = amp > thresh
        prev_above = jnp.concatenate([jnp.zeros((1,), bool), above[:-1]])
        rise = above & jnp.logical_not(prev_above)
        below_run = run_sum(jnp.logical_not(prev_above), pw_half + 1)
        need = jnp.minimum(jnp.float32(pw_half + 1), arange.astype(jnp.float32))
        qualify = rise & (below_run >= need) & (arange >= pw_half)
        above_run = run_sum(above, nt1 + 1)
        shifted = jnp.concatenate(
            [above_run[nt1 + 1:], jnp.zeros((nt1 + 1,), jnp.float32)])
        quiet_after = shifted >= jnp.float32(nt1 + 1)
        if stage == "runsums":
            return (jnp.sum(qualify) + jnp.sum(quiet_after)).astype(jnp.float32)

        disq = rise & jnp.logical_not(qualify)
        cmd_us = (cfg.delim_us + 2 * cfg.pw_us + 8 * cfg.pw_us + cfg.trcal_us
                  + cfg.query_length * 4 * cfg.pw_us + cfg.t1_us)
        span = -(-int(cmd_us * cfg.sample_rate / 1e6 + 128) // 128) * 128
        marker = above_run >= jnp.float32(nt1 + 1)
        reset = disq | marker
        pulses_at = _rises_since_reset(rise, reset, span).astype(i32)
        trig = (rise & (pulses_at > npc) & quiet_after
                & (arange + nt1 + 1 < n))
        if stage == "pulses":
            return jnp.sum(trig).astype(jnp.float32)

        trig_sample = jnp.where(trig, arange + nt1 + 1, i32(n))
        cap = cfg.max_events
        # Mirrors gate_detect's block-first compaction (<=1 trigger per
        # <=nt1+1-sample block, guaranteed by the T1-quiet spacing).
        bsz = 1 << max(min(nt1 + 1, 512).bit_length() - 1, 0)
        nb = -(-n // bsz)
        s2 = jnp.pad(trig_sample, (0, nb * bsz - n),
                     constant_values=n).reshape(nb, bsz)
        bsamp = jnp.min(s2, axis=1)
        bhas = bsamp < n
        pos = jnp.cumsum(bhas.astype(i32)) - 1
        slot = jnp.where(bhas, jnp.minimum(pos, cap), i32(cap))
        ev = jnp.full((cap,), n, i32).at[slot].set(bsamp, mode="drop")
        valid = ev < n
        ev_c = jnp.minimum(ev, n - 1)
        if stage == "compact":
            return jnp.sum(ev).astype(jnp.float32)

        dc, nv = _event_window_stats(y, ev_c, cfg.dc_length)
        rise_of_ev = jnp.maximum(ev_c - (nt1 + 1), 0)
        events = GateEvents(
            index=ev.astype(i32), dc=dc, valid=valid,
            n_events=jnp.sum(trig.astype(i32)), noise_var=nv,
            n_pulses=pulses_at[rise_of_ev].astype(i32))
        if stage == "gate":
            return (jnp.sum(jnp.real(dc)) + jnp.sum(nv)
                    + jnp.sum(events.n_pulses).astype(jnp.float32))

        if stage == "windows":
            # Role classification + compaction + window gathers only.
            from gen2_rfid_tpu.runtime.inventory import (classify_commands,
                                                         command_roles,
                                                         ROLE_SLACK)
            from gen2_rfid_tpu.runtime.frames import gather_aligned_windows
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
            qs = jnp.minimum(idx_pad[q_rows], n - 1)
            as_ = jnp.minimum(idx_pad[a_rows], n - 1)
            qf = gather_aligned_windows(y, qs, cfg.rn16_window)
            af = gather_aligned_windows(y, as_, cfg.epc_window)
            return jnp.sum(jnp.real(qf)) + jnp.sum(jnp.real(af))

        dec = decode_events(y, events, cfg, specialize=True)
        if stage == "decode":
            return (jnp.sum(dec.epc_pass).astype(jnp.float32)
                    + jnp.sum(dec.rn16_bits).astype(jnp.float32)
                    + jnp.sum(dec.t_half))
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

    stages = ["fir", "ampavg", "runsums", "pulses", "compact", "gate",
              "windows", "decode", "full"]
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
