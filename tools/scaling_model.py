"""Evidence-based pod-scaling model for the time-sharded decode.

BASELINE.md targets >=80% scaling efficiency at N hosts; this single-chip
environment cannot measure a pod, so this tool builds the model the
round-4 VERDICT asked for (weak item 3) from three measurable pieces:

1. **Closed-form overlap-save overhead.**  Every time shard re-filters and
   re-gates its halos; the redundant-compute fraction is
   ``(hl_x + hr_x) / n_shard_adc`` with the exact halo arithmetic of
   ``shard.decode_sharded.halo_sizes`` (config-dependent - computed here
   per BASELINE config).

2. **Compiled-HLO validation of that closed form.**  The identical
   ``shard_map`` program is compiled at n_time in {1, 2, 4, 8} on the
   virtual CPU mesh and per-device FLOPs are read from
   ``compiled.cost_analysis()``.  The measured per-device FLOP ratio vs
   n_time=1 must track ``(1/N) * (1 + ovh(N))`` - the halo model's
   prediction - to a few percent.  (CPU lowering differs from TPU in
   fusion, but the *ratio* across N isolates the sharding arithmetic.)

3. **Hardware-anchored time model.**  Per-chip decode rate R comes from the
   driver-recorded hardware benches (BENCH_r04: 1495 Msps flagship band
   1382-1569); communication terms use the public v5e datasheet numbers
   (ICI 1600 Gbps/chip aggregate; DCN taken conservatively at 25 GB/s and
   stress-tested down to 3 GB/s).  The serial (replicated) terms - event
   all-gather + argsort + O(events) replay - are bounded from the
   round-4 stage isolation (sort+replay measured 0.45 ms at a 2048-slot
   table, tools/tpu_prof_wideband.py).

Efficiency (strong scaling, one capture of S ADC samples split over N):

    T(N) = (S/N) * (1 + ovh(N)) / R   per-shard compute
         + B_halo(N) / BW             ppermute payload (ICI or DCN)
         + B_events(N) / BW           event-table all-gather
         + t_serial(E_total)          replicated sort + replay (Amdahl term)
    eff(N) = T(1) / (N * T(N))

Event capacity is demand-sized per shard (cap ~ shard length), so the
*total* table and the replay cost stay constant in N - without that, the
replicated replay would grow linearly and bind at large N (named below).

Usage: env -u PYTHONPATH JAX_PLATFORMS=cpu \
         XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python tools/scaling_model.py [--out SCALING_r05.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --- hardware constants (public v5e datasheet / measured) -----------------
R_CHIP_MSPS = 1428.0      # flagship measured this round (band 1419-1453;
                          # r4 driver run: 1495, band 1382-1569)
ICI_GBPS = 1600.0         # v5e aggregate interchip interconnect, per chip
ICI_BYTES_S = ICI_GBPS / 8 * 1e9
DCN_BYTES_S = 25e9        # conservative per-host data-center network
DCN_WORST = 3e9           # stress case
# Replicated sort + fast-path replay term.  Round 4's 0.45 ms at a
# 2048-slot table included the O(E) sequential replay scan, which a
# vmapped lax.cond always executed (both branches); round 5 hoisted the
# cond above the vmap (replay_inventory_batch).  MEASURED on hardware
# (tools/tpu_replay_bench.py, argsort + fast replay, K-chained
# difference quotient): 0.083 ms @ 2048 slots, 0.506 @ 8192,
# 1.625 @ 24576 -> ~68 ns/slot, ~zero intercept.
T_SERIAL_S = 0.05e-3
SERIAL_SLOPE_S = 6.8e-8   # per table slot (hardware-measured)
SERIAL_TABLE_SLOTS = 2048
T_DISPATCH_S = 0.2e-3     # per-program dispatch allowance (not measurable
                          # behind the async tunnel; conservative)


def halo_overhead(cfg, n_shard_adc):
    """Redundant-compute fraction + halo payload bytes for one shard."""
    from gen2_rfid_tpu.runtime.inventory import matched_taps
    from gen2_rfid_tpu.shard.decode_sharded import halo_sizes

    hl_y, hr_y = halo_sizes(cfg)
    t = len(matched_taps(cfg))
    hl_x = hl_y * cfg.decim + (t - 1)
    hr_x = hr_y * cfg.decim
    ovh = (hl_x + hr_x) / n_shard_adc
    # planar float32, both directions exchanged per interior shard
    halo_bytes = (hl_x + hr_x) * 2 * 4
    return ovh, halo_bytes


def event_table_bytes(cfg, cap):
    """Per-shard DecodedEvents table payload (the all-gather unit)."""
    per_event = (
        4 + 1 + 1 + 1            # index, valid, rn16_fits, epc_fits
        + 16 * 4                 # rn16_bits
        + cfg.epc_bits * 4       # epc_bits (int32 lanes)
        + 1 + 4 + 4 + 8          # epc_pass, tag_id, t_half, h_est
        + 4 + 4 + 4 + 4          # slot_state, energy, margin, cmd_type
    )
    return cap * per_event


def efficiency_curve(cfg, s_total, total_cap, bw_bytes_s, n_list):
    """eff(N) rows for one capture size under one interconnect."""
    rate = R_CHIP_MSPS * 1e6
    rows = []
    t_serial = T_SERIAL_S + SERIAL_SLOPE_S * total_cap
    for n in n_list:
        s_shard = s_total / n
        ovh, halo_b = halo_overhead(cfg, s_shard)
        cap_shard = int(np.ceil(total_cap / n)) + 16
        ev_b = event_table_bytes(cfg, cap_shard) * (n - 1)  # recv per chip
        t_comp = s_shard * (1 + ovh) / rate
        t_comm = (halo_b + ev_b) / bw_bytes_s if n > 1 else 0.0
        t_n = t_comp + t_comm + t_serial + T_DISPATCH_S
        rows.append(dict(n=n, ovh_pct=round(100 * ovh, 3),
                         t_comp_ms=round(1e3 * t_comp, 3),
                         t_comm_ms=round(1e3 * t_comm, 4),
                         t_serial_ms=round(1e3 * t_serial, 3),
                         t_total_ms=round(1e3 * t_n, 3)))
    t1 = rows[0]["t_total_ms"]
    for r in rows:
        r["eff"] = round(t1 / (r["n"] * r["t_total_ms"]), 4)
    return rows


def hlo_flops_validation():
    """Compile the real shard_map program at n_time in {1,2,4,8} (CPU mesh),
    read per-device FLOPs from cost_analysis for (a) the shard body alone
    and (b) the full program (+ replicated sort/replay), and fit each to
    flops(N) = a * (1 + ovh(N)) / N + c.

    The fit decomposes the program into its sharding-scaled part (a) and
    its replicated part (c); the body's c must be small (role-cap slack
    only), and c_full - c_body is the replicated sort/replay FLOP cost the
    efficiency model's serial term accounts for.  Residuals validate the
    closed-form halo arithmetic."""
    import jax
    import jax.numpy as jnp

    from gen2_rfid_tpu.config import ReaderConfig
    from gen2_rfid_tpu.shard.decode_sharded import make_sharded_decoder
    from gen2_rfid_tpu.shard.mesh import make_mesh

    cfg = ReaderConfig(max_events=256)
    s_total = 1_966_080  # ADC samples; divides 8 * decim
    ns = (1, 2, 4, 8)

    def flops_of(fn, x):
        compiled = jax.jit(fn).lower(x).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca.get("flops", float("nan")))

    rows = []
    for n in ns:
        mesh = make_mesh(n_time=n, n_chan=1)
        fn = make_sharded_decoder(cfg, mesh, events_per_shard=256 // n + 16)

        # body-only: the shard_map stage without the replicated replay
        import functools

        from gen2_rfid_tpu.dsp.filters import boxcar_taps
        from gen2_rfid_tpu.shard.decode_sharded import (_event_out_specs,
                                                        _shard_body)
        from jax.sharding import PartitionSpec as P
        from gen2_rfid_tpu.shard.mesh import CHAN_AXIS, TIME_AXIS

        taps = jnp.asarray(boxcar_taps(
            int(cfg.tag_bit_us / 2 * cfg.adc_rate / 1e6 / cfg.miller_m)))
        body = jax.shard_map(
            functools.partial(_shard_body, cfg=cfg, taps=taps,
                              events_cap=256 // n + 16),
            mesh=mesh, in_specs=P(CHAN_AXIS, None, TIME_AXIS),
            out_specs=_event_out_specs())
        x = jnp.zeros((1, 2, s_total), jnp.float32)
        ovh, _ = halo_overhead(cfg, s_total / n)
        rows.append(dict(n_time=n, flops_full=flops_of(fn, x),
                         flops_body=flops_of(body, x),
                         scale=(1 + ovh) / n))

    def fit(key):
        # least squares on flops = a*scale + c
        s = np.array([r["scale"] for r in rows])
        f = np.array([r[key] for r in rows])
        a, c = np.linalg.lstsq(np.stack([s, np.ones_like(s)], 1), f,
                               rcond=None)[0]
        resid = float(np.abs(a * s + c - f).max() / f[0])
        return float(a), float(c), resid

    a_b, c_b, r_b = fit("flops_body")
    a_f, c_f, r_f = fit("flops_full")
    return dict(
        rows=rows,
        body_fit=dict(a=a_b, c=c_b, max_resid_frac=round(r_b, 5),
                      replicated_frac=round(c_b / (a_b + c_b), 4)),
        full_fit=dict(a=a_f, c=c_f, max_resid_frac=round(r_f, 5),
                      replicated_frac=round(c_f / (a_f + c_f), 4)),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING_r05.json")
    ap.add_argument("--skip-hlo", action="store_true")
    args = ap.parse_args()

    from gen2_rfid_tpu.config import ReaderConfig

    result = {"r_chip_msps": R_CHIP_MSPS,
              "ici_bytes_s": ICI_BYTES_S, "dcn_bytes_s": DCN_BYTES_S,
              "t_serial_ms_per_2048_slots": T_SERIAL_S * 1e3,
              "curves": {}, "hlo_validation": None}

    cfg = ReaderConfig(max_events=1536)
    n_list = [1, 2, 4, 8, 16, 32, 64]
    scenarios = {
        # capture ADC samples per *pod* (strong scaling), total event slots
        "flagship_9.7M_ici": (9_830_400, 1536, ICI_BYTES_S),
        "longcap_39M_ici": (39_321_600, 6144, ICI_BYTES_S),
        "longcap_39M_dcn25": (39_321_600, 6144, DCN_BYTES_S),
        "longcap_39M_dcn3": (39_321_600, 6144, DCN_WORST),
        "stream_157M_ici": (157_286_400, 24576, ICI_BYTES_S),
    }
    for name, (s, cap, bw) in scenarios.items():
        result["curves"][name] = efficiency_curve(cfg, s, cap, bw, n_list)

    if not args.skip_hlo:
        result["hlo_validation"] = hlo_flops_validation()

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)

    for name, rows in result["curves"].items():
        effs = " ".join(f"N={r['n']}:{r['eff']:.2f}" for r in rows)
        print(f"{name}: {effs}")
    if result["hlo_validation"]:
        hv = result["hlo_validation"]
        print("hlo body fit:", hv["body_fit"])
        print("hlo full fit:", hv["full_fit"])
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
