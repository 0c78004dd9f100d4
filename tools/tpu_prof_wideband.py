"""Wideband-8 stage isolation on TPU: the bench config runs at ~313 Msps
(23 ms per 7.3 M-sample iter) where the parts - one grouped-conv PFB,
8 x 915 k-sample decode chains vmapped under a 1-device shard_map -
should sum to ~7 ms at flagship per-sample rates.  Attribute the rest.

Stages (select via WB_STAGES=a,b,...; difference-quotient harness):
* commutator  - data movement only (the round-4 textbook-PFB prefix);
* pfb         - channelize_planar (round-5: selection-matmul taps);
* pfb_taps/pfb_deflt/pfb_high/pfb_highest - old tap-shift loop alone /
  + IDFT at each precision tier (isolated the 12 ms tap cost);
* pfbconv / pfb_flat / pfb_flat_nt - measured-LOSING alternatives kept
  for the record (dense conv 27.5 ms; flat shifted-multiplies 67.5 ms);
* events      - pfb + per-channel FIR + gate;
* decode      - + round-4 channel-VMAPPED specialized decode (the
  anomaly: +12.2 ms);
* flat_gw/flat_rn16/flat_epc/flat_val/flat_cls/flat_scat - round-5
  channel-FLATTENED decode substages (gathers / RN16 / EPC / validate /
  classify / scatter-back);
* flat        - full decode_events_multi (NOTE: this profiling-only
  reduction reproducibly crashed the remote TPU worker 4/4 while every
  substage and the shipping program run clean - an axon/XLA fusion
  fault, see docs/PERF.md);
* full        - the SHIPPING sharded decoder (flat decode + hoisted
  replay cond).

Run: WB_STAGES=pfb,events,full timeout 5400 python tools/tpu_prof_wideband.py
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

    import bench_configs as bc
    from gen2_rfid_tpu.config import ReaderConfig
    from gen2_rfid_tpu.dsp.channelizer import channelize_planar, pfb_taps
    from gen2_rfid_tpu.dsp.filters import boxcar_taps
    from gen2_rfid_tpu.dsp.gate import gate_detect
    from gen2_rfid_tpu.runtime.inventory import decode_events
    from gen2_rfid_tpu.shard.decode_sharded import (_sort_and_replay,
                                                    _with_cap,
                                                    make_sharded_decoder)
    from gen2_rfid_tpu.shard.mesh import make_mesh

    iq2_np, body_full, expected = bc.case_wideband8()
    iq2 = jnp.asarray(iq2_np)
    n_adc = iq2.shape[1]
    n_chan = 8
    cfg = ReaderConfig(max_events=256)
    m = n_adc // n_chan
    m_use = m - m % cfg.decim
    n_taps = int(cfg.tag_bit_us / 2 * cfg.adc_rate / 1e6 / cfg.miller_m)
    taps = jnp.asarray(boxcar_taps(n_taps))
    cap_cfg = _with_cap(cfg, 256)
    mesh = make_mesh(n_time=1, n_chan=1, devices=jax.devices()[:1])
    dec_fn = make_sharded_decoder(cfg, mesh, events_per_shard=256)
    print(f"adc samples/iter: {n_adc}", file=sys.stderr)

    from gen2_rfid_tpu.dsp.filters import matched_filter_decimate

    def prefix(x2, stage: str):
        if stage == "commutator":
            # Data movement only: pad + (M, N) reshape + column reversal +
            # planar stack + transpose to (2, N, M) - the shared prefix of
            # both PFB formulations.
            x = jax.lax.complex(x2[0], x2[1])
            n = x.shape[0]
            mm = n // n_chan
            xs = x[: mm * n_chan]
            xe = jnp.pad(xs, (n_chan - 1, 0))[: mm * n_chan + n_chan - 1]
            s = xe[: mm * n_chan].reshape(mm, n_chan)[:, ::-1]
            s2 = jnp.stack([jnp.real(s), jnp.imag(s)]).astype(jnp.float32)
            sp = jnp.transpose(s2, (0, 2, 1))
            return jnp.sum(sp)
        if stage == "pfbconv":
            # Experimental dense-conv PFB: fold prototype taps AND the 8x8
            # IDFT into ONE (T, N, 2N) dense conv over the commutator
            # matrix - the whole channelizer as a single MXU pass + the
            # same final transpose.  Kernel K[r, q, k||k+N] =
            # (W[k, N-1-q] * h[N-1-q + (T-1-r)N]).re/.im  (r reversed for
            # lax correlation semantics with left pad T-1).
            t = 12
            n = x2.shape[1]
            mm = n // n_chan
            h_np = pfb_taps(n_chan, t)
            k_idx = np.arange(n_chan)
            w = np.exp(2j * np.pi * np.outer(k_idx, k_idx) / n_chan)
            kern = np.zeros((t, n_chan, 2 * n_chan), np.float32)
            for r in range(t):
                for q in range(n_chan):
                    p = n_chan - 1 - q
                    c = w[:, p] * h_np[p + (t - 1 - r) * n_chan]
                    kern[r, q, :n_chan] = c.real
                    kern[r, q, n_chan:] = c.imag
            xe = jnp.pad(x2[:, : mm * n_chan], ((0, 0), (n_chan - 1, 0)))
            s2 = xe[:, : mm * n_chan].reshape(2, mm, n_chan)
            out = jax.lax.conv_general_dilated(
                s2, jnp.asarray(kern), window_strides=(1,),
                padding=[(t - 1, 0)],
                dimension_numbers=("NHC", "HIO", "NHC"),
                precision=jax.lax.Precision.HIGHEST)     # (2, M, 2N)
            yr = out[0, :, :n_chan] - out[1, :, n_chan:]
            yi = out[0, :, n_chan:] + out[1, :, :n_chan]
            chv = jnp.transpose(jnp.stack([yr, yi]), (2, 0, 1))
            return jnp.sum(chv)

        if stage in ("pfb_flat", "pfb_flat_nt"):
            # Flat channel-interleaved PFB: the (…, 8) minor-dim arrays of
            # channelize_planar run at 1/16 v5e lane utilization; here
            # every op is a shifted multiply with a period-8 tiled
            # coefficient vector on (2, M*8) flat arrays (full lanes), and
            # the (M,8)->(8,M) layout change happens once at the end
            # ("pfb_flat") or not at all ("pfb_flat_nt") - CPU-validated
            # equal to channelize_planar.
            t = 12
            ln = x2.shape[1]
            mm = ln // n_chan
            h_np = pfb_taps(n_chan, t)
            hpq = np.ascontiguousarray(h_np.reshape(t, n_chan).T[::-1, :])
            k_idx = np.arange(n_chan)
            w = np.exp(2j * np.pi * np.outer(k_idx, k_idx) / n_chan)
            wq = np.ascontiguousarray(w[:, ::-1].T)
            s2f = jnp.pad(x2[:, : mm * n_chan],
                          ((0, 0), (n_chan - 1, 0)))[:, : mm * n_chan]
            sp = jnp.pad(s2f, ((0, 0), ((t - 1) * n_chan, 0)))
            u = jnp.zeros((2, mm * n_chan), jnp.float32)
            for r in range(t):
                # tile IN-graph: a host-side np.tile would bake a 29 MB
                # constant per tap into the HLO (the remote compile
                # endpoint rejects the >700 MB program body).
                coeff = jnp.tile(jnp.asarray(hpq[:, r]), mm)
                u = u + coeff * jax.lax.slice(
                    sp, (0, (t - 1 - r) * n_chan),
                    (2, (t - 1 - r) * n_chan + mm * n_chan))
            up = jnp.pad(u, ((0, 0), (n_chan - 1, n_chan - 1)))
            yr = jnp.zeros((mm * n_chan,), jnp.float32)
            yi = jnp.zeros((mm * n_chan,), jnp.float32)
            for d in range(-(n_chan - 1), n_chan):
                cr = np.zeros(n_chan, np.float32)
                ci = np.zeros(n_chan, np.float32)
                for k in range(n_chan):
                    q = k - d
                    if 0 <= q < n_chan:
                        cr[k] = wq[q, k].real
                        ci[k] = wq[q, k].imag
                crt = jnp.tile(jnp.asarray(cr), mm)
                cit = jnp.tile(jnp.asarray(ci), mm)
                us = jax.lax.slice(up, (0, (n_chan - 1) - d),
                                   (2, (n_chan - 1) - d + mm * n_chan))
                yr = yr + crt * us[0] - cit * us[1]
                yi = yi + cit * us[0] + crt * us[1]
            if stage == "pfb_flat_nt":
                return jnp.sum(yr) + jnp.sum(yi)
            chf = jnp.transpose(
                jnp.stack([yr.reshape(mm, n_chan), yi.reshape(mm, n_chan)]),
                (2, 0, 1))
            return jnp.sum(chf)

        if stage in ("pfb_taps", "pfb_deflt", "pfb_high", "pfb_highest"):
            # channelize_planar body with (a) taps only and (b) the IDFT
            # matmuls at each precision tier - isolates whether the
            # round-5 Precision.HIGHEST fix (bf16x6 passes on a tiny
            # contraction, i.e. bandwidth-bound) inflated the PFB.
            t = 12
            n = x2.shape[1]
            mm = n // n_chan
            h_np = pfb_taps(n_chan, t)
            hpq = np.ascontiguousarray(h_np.reshape(t, n_chan).T[::-1, :])
            xe = jnp.pad(x2[:, : mm * n_chan], ((0, 0), (n_chan - 1, 0)))
            s2 = xe[:, : mm * n_chan].reshape(2, mm, n_chan)
            sp = jnp.pad(s2, ((0, 0), (t - 1, 0), (0, 0)))
            u = jnp.zeros((2, mm, n_chan), jnp.float32)
            for r in range(t):
                u = u + jnp.asarray(hpq[:, r]) * jax.lax.slice(
                    sp, (0, t - 1 - r, 0), (2, t - 1 - r + mm, n_chan))
            if stage == "pfb_taps":
                return jnp.sum(u)
            k_idx = np.arange(n_chan)
            w = np.exp(2j * np.pi * np.outer(k_idx, k_idx) / n_chan)
            wqz = np.ascontiguousarray(w[:, ::-1].T)
            wr = jnp.asarray(wqz.real.astype(np.float32))
            wi = jnp.asarray(wqz.imag.astype(np.float32))
            prec = {"pfb_deflt": None, "pfb_high": jax.lax.Precision.HIGH,
                    "pfb_highest": jax.lax.Precision.HIGHEST}[stage]
            ur, ui = u[0], u[1]
            yr = (jnp.matmul(ur, wr, precision=prec)
                  - jnp.matmul(ui, wi, precision=prec))
            yi = (jnp.matmul(ur, wi, precision=prec)
                  + jnp.matmul(ui, wr, precision=prec))
            return jnp.sum(yr) + jnp.sum(yi)

        if stage == "pfb3":
            # IDFT as a block-diagonal (1024, 2048) matmul applied to the
            # tap stage's NATIVE (nb, 1024) block layout - 127/128 of the
            # matrix is zeros (free on the MXU) but the contraction stays
            # at full lane width, vs the 5.1 ms the (M, 8)@(8, 8) layout
            # costs.  Output columns [yr | yi] per plane, combined
            # elementwise; ends with the same (2, M, 8)->sum as "pfb".
            from gen2_rfid_tpu.dsp.channelizer import (_TAP_BLOCK,
                                                       _tap_selection)
            t = 12
            n = x2.shape[1]
            mm = n // n_chan
            xe = jnp.pad(x2[:, : mm * n_chan], ((0, 0), (n_chan - 1, 0)))
            bb = _TAP_BLOCK
            nb = -(-mm // bb)
            flat = jnp.pad(xe[:, : mm * n_chan],
                           ((0, 0), ((t - 1) * n_chan,
                                     (nb * bb - mm) * n_chan)))
            blocks = flat[:, (t - 1) * n_chan:].reshape(2, nb, bb * n_chan)
            tails = flat[:, : nb * bb * n_chan].reshape(
                2, nb, bb * n_chan)[:, :, : (t - 1) * n_chan]
            sel = _tap_selection(n_chan, 12)
            hi = jax.lax.Precision.HIGHEST
            cut = (t - 1) * n_chan
            u = (jnp.einsum("cbj,jo->cbo", tails, jnp.asarray(sel[:cut]),
                            precision=hi)
                 + jnp.einsum("cbj,jo->cbo", blocks,
                              jnp.asarray(sel[cut:]), precision=hi))
            k_idx = np.arange(n_chan)
            w = np.exp(2j * np.pi * np.outer(k_idx, k_idx) / n_chan)
            wqz = np.ascontiguousarray(w[:, ::-1].T)       # (q, k)
            wbd = np.zeros((bb * n_chan, 2 * bb * n_chan), np.float32)
            for i in range(bb):
                r0, c0 = i * n_chan, i * n_chan
                wbd[r0:r0 + n_chan, c0:c0 + n_chan] = wqz.real
                wbd[r0:r0 + n_chan,
                    bb * n_chan + c0:bb * n_chan + c0 + n_chan] = wqz.imag
            uy = jnp.einsum("cbo,ok->cbk", u, jnp.asarray(wbd),
                            precision=hi)              # (2, nb, 2048)
            h = bb * n_chan
            yr = (uy[0, :, :h] - uy[1, :, h:]).reshape(nb * bb, n_chan)[:mm]
            yi = (uy[1, :, :h] + uy[0, :, h:]).reshape(nb * bb, n_chan)[:mm]
            chb = jnp.transpose(jnp.stack([yr, yi]), (2, 0, 1))
            return jnp.sum(chb)

        if stage in ("pfb2_reshape", "pfb2_tap"):
            # Round-5 selection-matmul PFB substages: commutator pad +
            # slab construction alone, then + the tap matmuls.
            from gen2_rfid_tpu.dsp.channelizer import (_TAP_BLOCK,
                                                       _tap_selection)
            t = 12
            n = x2.shape[1]
            mm = n // n_chan
            xe = jnp.pad(x2[:, : mm * n_chan], ((0, 0), (n_chan - 1, 0)))
            bb = _TAP_BLOCK
            nb = -(-mm // bb)
            flat = jnp.pad(xe[:, : mm * n_chan],
                           ((0, 0), ((t - 1) * n_chan,
                                     (nb * bb - mm) * n_chan)))
            blocks = flat[:, (t - 1) * n_chan:].reshape(2, nb, bb * n_chan)
            tails = flat[:, : nb * bb * n_chan].reshape(
                2, nb, bb * n_chan)[:, :, : (t - 1) * n_chan]
            if stage == "pfb2_reshape":
                return jnp.sum(blocks) + jnp.sum(tails)
            sel = _tap_selection(n_chan, 12)
            hi = jax.lax.Precision.HIGHEST
            cut = (t - 1) * n_chan
            u = (jnp.einsum("cbj,jo->cbo", tails, jnp.asarray(sel[:cut]),
                            precision=hi)
                 + jnp.einsum("cbj,jo->cbo", blocks,
                              jnp.asarray(sel[cut:]), precision=hi))
            return jnp.sum(u)

        ch = channelize_planar(x2, n_chan)[:, :, :m_use]   # (8, 2, M)
        if stage == "pfb":
            return jnp.sum(ch)

        def chain(c2):
            y = matched_filter_decimate(
                jax.lax.complex(c2[0], c2[1]), taps, cfg.decim)
            events = gate_detect(y, cap_cfg)
            return y, events

        if stage == "events":
            def ev_only(c2):
                y, events = chain(c2)
                return (jnp.sum(events.index).astype(jnp.float32)
                        + jnp.sum(jnp.real(y[:8])))
            return jnp.sum(jax.vmap(ev_only)(ch))

        if stage == "decode":
            def dec_one(c2):
                y, events = chain(c2)
                dec = decode_events(y, events, cfg, specialize=True,
                                    overflow_fallback=False)
                return (jnp.sum(dec.epc_pass.astype(jnp.int32))
                        .astype(jnp.float32)
                        + jnp.sum(dec.rn16_bits).astype(jnp.float32))
            return jnp.sum(jax.vmap(dec_one)(ch))

        # ---- round-5 channel-flattened decode (decode_events_multi) and
        # its substages: isolate where the vmapped decode lost ~2x.
        y_c, events_c = jax.vmap(chain)(ch)
        if stage.startswith("flat"):
            from gen2_rfid_tpu.runtime.frames import (
                gather_aligned_windows_multi)
            from gen2_rfid_tpu.runtime.inventory import (
                ROLE_SLACK, _decode_epc_frames, _decode_rn16_frames,
                classify_commands, command_roles, decode_events_multi)

            c, cap = events_c.index.shape
            n = y_c.shape[1]
            i32 = jnp.int32
            capp = cap + 1
            cap_q = min(cap, cap // 2 + 1 + ROLE_SLACK)
            cmd = classify_commands(
                events_c.n_pulses.reshape(-1), cfg).reshape(c, cap)
            role_q, role_a = command_roles(cmd, events_c.valid)

            def compact(mask, sub_cap):
                pos = jnp.cumsum(mask.astype(i32), axis=1) - 1
                slot = jnp.where(mask, jnp.minimum(pos, sub_cap), i32(sub_cap))
                rows = jnp.full((c, sub_cap), cap, i32)
                return rows.at[
                    jnp.arange(c, dtype=i32)[:, None], slot].set(
                    jnp.broadcast_to(jnp.arange(cap, dtype=i32), (c, cap)),
                    mode="drop")

            chan_base = jnp.arange(c, dtype=i32)[:, None] * capp
            fq = (chan_base + compact(role_q, cap_q)).reshape(-1)
            fa = (chan_base + compact(role_a, cap_q)).reshape(-1)
            idx_pad = jnp.concatenate(
                [events_c.index, jnp.full((c, 1), n, i32)], axis=1
            ).reshape(-1)
            dc_pad = jnp.concatenate(
                [events_c.dc, jnp.zeros((c, 1), events_c.dc.dtype)], axis=1
            ).reshape(-1)

            def gw(rows, width):
                start = jnp.minimum(idx_pad[rows], n - 1)
                fr = gather_aligned_windows_multi(
                    y_c, start, rows // capp, width) - dc_pad[rows][:, None]
                m2 = (jnp.real(fr) ** 2
                      + jnp.imag(fr) ** 2).astype(jnp.float32)
                return fr, m2

            if stage == "flat_gw":
                qf, qm = gw(fq, cfg.rn16_window)
                af, am = gw(fa, cfg.epc_window)
                return (jnp.sum(jnp.real(qf)) + jnp.sum(jnp.real(af))
                        + jnp.sum(qm[:, 0]) + jnp.sum(am[:, 0]))
            if stage == "flat_rn16":
                qf, qm = gw(fq, cfg.rn16_window)
                bits, h, marg = _decode_rn16_frames(qf, cfg)
                return (jnp.sum(bits).astype(jnp.float32)
                        + jnp.sum(marg) + jnp.sum(jnp.real(h)))
            if stage == "flat_epc":
                af, am = gw(fa, cfg.epc_window)
                bits, th, h, _ = _decode_epc_frames(af, am, cfg)
                return (jnp.sum(bits).astype(jnp.float32) + jnp.sum(th)
                        + jnp.sum(jnp.real(h)))
            if stage == "flat_val":
                from gen2_rfid_tpu.runtime.inventory import _validate_epc_soft
                af, am = gw(fa, cfg.epc_window)
                bits, th, h, rel = _decode_epc_frames(af, am, cfg)
                a_pass, a_tid, a_bits = _validate_epc_soft(bits, rel, cfg)
                return (jnp.sum(a_pass.astype(jnp.int32)).astype(jnp.float32)
                        + jnp.sum(a_tid).astype(jnp.float32))
            if stage == "flat_cls":
                from gen2_rfid_tpu.runtime.inventory import classify_slots
                qf, qm = gw(fq, cfg.rn16_window)
                bits, h, marg = _decode_rn16_frames(qf, cfg)
                q_energy = jnp.mean(qm, axis=1)
                nv_pad = jnp.concatenate(
                    [events_c.noise_var, jnp.ones((c, 1), jnp.float32)],
                    axis=1).reshape(-1)
                h2 = jnp.real(h) ** 2 + jnp.imag(h) ** 2
                st = classify_slots(q_energy, marg, nv_pad[fq], h2)
                return (jnp.sum(st).astype(jnp.float32)
                        + jnp.sum(bits).astype(jnp.float32))
            if stage == "flat_scat":
                # decode both roles + all scatter-backs, skipping only
                # classify_slots and _validate_epc_soft.
                from gen2_rfid_tpu.runtime.inventory import _validate_epc_soft
                qf, qm = gw(fq, cfg.rn16_window)
                af, am = gw(fa, cfg.epc_window)
                q_bits, q_h, q_marg = _decode_rn16_frames(qf, cfg)
                a_bits, a_th, a_h, _ = _decode_epc_frames(af, am, cfg)
                def unpad(flat):
                    return flat.reshape((c, capp) + flat.shape[1:])[:, :cap]
                rn16 = unpad(jnp.zeros((c * capp, 16), i32).at[fq].set(
                    q_bits, mode="drop"))
                epcb = unpad(jnp.zeros(
                    (c * capp, a_bits.shape[1]), i32).at[fa].set(
                    a_bits, mode="drop"))
                hf = jnp.zeros((c * capp,), q_h.dtype)
                hf = hf.at[fq].set(q_h, mode="drop")
                hf = unpad(hf.at[fa].set(a_h, mode="drop"))
                return (jnp.sum(rn16).astype(jnp.float32)
                        + jnp.sum(epcb).astype(jnp.float32)
                        + jnp.sum(jnp.real(hf)))
            # stage == "flat": the full multi decode
            dec = decode_events_multi(y_c, events_c, cfg)
            return (jnp.sum(dec.epc_pass.astype(jnp.int32)).astype(jnp.float32)
                    + jnp.sum(dec.rn16_bits).astype(jnp.float32))

        stats, _ = dec_fn(ch)
        return stats.n_epc_correct.sum().astype(jnp.float32)

    @functools.partial(jax.jit, static_argnames=("stage", "k"))
    def repeat(x2, stage: str, k: int):
        def it(i, carry):
            acc, x = carry
            acc = acc + prefix(x, stage).astype(jnp.float32)
            x = x + acc * jnp.float32(1e-30)
            return acc, x
        acc, _ = jax.lax.fori_loop(0, k, it, (jnp.float32(0), x2))
        return acc.reshape(1)

    def timed(stage, k):
        t0 = time.perf_counter()
        np.asarray(repeat(iq2, stage, k))
        return time.perf_counter() - t0

    prev = 0.0
    stages = os.environ.get("WB_STAGES", "commutator,pfb").split(",")
    for s in stages:
        t_comp0 = time.perf_counter()
        timed(s, 1)
        timed(s, 5)
        compile_s = time.perf_counter() - t_comp0
        t1 = min(timed(s, 1) for _ in range(2))
        t2 = min(timed(s, 5) for _ in range(2))
        per = max((t2 - t1) / 4, 1e-9)
        ms = per * 1e3
        print(json.dumps({"stage": s, "ms": round(ms, 2),
                          "delta_ms": round(ms - prev, 2),
                          "Msps": round(n_adc / per / 1e6, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
