"""Measure PDOA ranging / Doppler accuracy envelopes (docs/LOCALIZATION.md).

Runs on CPU:
  env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/ranging_sweep.py

Sweeps:
  * range accuracy vs number of FCC hop channels (fixed span) and vs SNR;
  * velocity accuracy vs capture length;
  * two-path multipath: bias + the fit residual that flags it.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from gen2_rfid_tpu.config import ReaderConfig  # noqa: E402
from gen2_rfid_tpu.runtime.inventory import decode_capture
from gen2_rfid_tpu.runtime.ranging import (
    FCC_HOP_FREQS_HZ,
    estimate_velocity,
    range_from_captures,
    tag_phase_series,
)
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import synthesize_inventory


def hop_captures(freqs, d, noise=0.004, n_rounds=3, v=0.0, seed0=100):
    dec_cfg = ReaderConfig()
    out = []
    for k, f in enumerate(freqs):
        cfg = ReaderConfig(freq_hz=f)
        tr = synthesize_inventory(
            cfg, [Tag.with_id(27, seed=7, distance_m=d, velocity_mps=v)],
            n_rounds=n_rounds, noise=noise, seed=seed0 + k)
        _, dec = decode_capture(tr.iq, dec_cfg)
        out.append((f, tag_phase_series(dec, dec_cfg)))
    return out


def sweep_hops():
    print("# range accuracy vs hop count (d=3.7 m, SNR nominal)")
    for n_hops in (2, 3, 5, 10):
        step = max(len(FCC_HOP_FREQS_HZ) // n_hops, 1)
        freqs = FCC_HOP_FREQS_HZ[::step][:n_hops]
        errs = []
        for trial in range(5):
            per = hop_captures(freqs, 3.7, seed0=200 + 50 * trial)
            est = range_from_captures(per)[27]
            errs.append(abs(est["range_m"] - 3.7))
        print(f"hops={n_hops:2d} span={freqs[-1]-freqs[0]:9.2e} Hz "
              f"median|err|={np.median(errs)*100:.2f} cm "
              f"max={np.max(errs)*100:.2f} cm")


def sweep_noise():
    print("# range accuracy vs noise (5 hops, d=3.7 m; backscatter |b|=0.085)")
    freqs = FCC_HOP_FREQS_HZ[::12]
    for noise in (0.004, 0.02, 0.04, 0.06):
        errs = []
        for trial in range(5):
            per = hop_captures(freqs, 3.7, noise=noise,
                               seed0=400 + 50 * trial)
            if 27 not in {t for _, s in per for t in s}:
                errs.append(np.inf)
                continue
            est = range_from_captures(per).get(27)
            errs.append(abs(est["range_m"] - 3.7) if est else np.inf)
        print(f"noise={noise:.3f} median|err|={np.median(errs)*100:.2f} cm")


def sweep_velocity():
    print("# velocity accuracy vs capture length (v=1.5 m/s, d=2 m)")
    cfg = ReaderConfig()
    for n_rounds in (5, 10, 20, 40):
        errs = []
        for trial in range(3):
            tr = synthesize_inventory(
                cfg, [Tag.with_id(27, seed=7, distance_m=2.0,
                                  velocity_mps=1.5)],
                n_rounds=n_rounds, seed=700 + trial)
            _, dec = decode_capture(tr.iq, cfg)
            s = tag_phase_series(dec, cfg)[27]
            est = estimate_velocity(s["time_s"], s["phase_rad"], cfg.freq_hz)
            errs.append(abs(est["velocity_mps"] - 1.5))
        dur = n_rounds * 15e-3
        print(f"rounds={n_rounds:2d} (~{dur*1e3:.0f} ms) "
              f"median|err|={np.median(errs)*100:.2f} cm/s")


def multipath_demo():
    """Two-path channel: the direct path at d plus a reflection at d+dx.
    The per-carrier phase is no longer linear in f; the PDOA fit biases
    toward a power-weighted mix and the residual flags it."""
    print("# two-path multipath (direct d=3.7 m + reflection, rel amp a)")
    freqs = FCC_HOP_FREQS_HZ[::6]
    c = 299_792_458.0
    for a, dx in ((0.0, 0.0), (0.2, 1.5), (0.5, 1.5), (0.5, 4.0)):
        per = []
        dec_cfg = ReaderConfig()
        for k, f in enumerate(freqs):
            cfg = ReaderConfig(freq_hz=f)
            # Composite backscatter coefficient: direct + delayed path.
            b0 = 0.08 + 0.03j
            comp = b0 * (np.exp(-4j * np.pi * f * 3.7 / c)
                         + a * np.exp(-4j * np.pi * f * (3.7 + dx) / c))
            tag = Tag.with_id(27, seed=7, backscatter=comp)
            tr = synthesize_inventory(cfg, [tag], n_rounds=3,
                                      seed=900 + k)
            _, dec = decode_capture(tr.iq, dec_cfg)
            per.append((f, tag_phase_series(dec, dec_cfg)))
        est = range_from_captures(per)[27]
        print(f"a={a:.1f} dx={dx:.1f} m -> range {est['range_m']:.2f} m "
              f"(bias {est['range_m']-3.7:+.2f}), resid "
              f"{est['resid_rad']:.3f} rad")


if __name__ == "__main__":
    sweep_hops()
    sweep_noise()
    sweep_velocity()
    multipath_demo()
