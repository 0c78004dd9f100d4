"""Measure the receiver front-end operating envelope (docs/IMPAIRMENTS.md).

For each impairment axis (ADC bits, IQ imbalance, phase-noise walk,
interferer level at two offsets) decode a 6-round single-tag capture and
report the read fraction - the measured boundary between "exact decode"
and degradation.  Run on CPU:

  env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/impair_sweep.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax.numpy as jnp
import numpy as np

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.runtime.inventory import decode_capture
from gen2_rfid_tpu.sim.impairments import RxImpairments, apply_rx_impairments
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import synthesize_inventory

N_ROUNDS = 6
SEEDS = (1, 2, 3)


def read_frac(cfg, imp, track=False):
    got = tot = 0
    dcfg = dataclasses.replace(cfg, track_channel=True) if track else cfg
    for s in SEEDS:
        tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)],
                                  n_rounds=N_ROUNDS, seed=s)
        iq = apply_rx_impairments(tr.iq, imp, cfg.adc_rate, seed=s + 10)
        stats, _ = decode_capture(jnp.asarray(iq), dcfg)
        got += int(stats.tag_reads[27])
        tot += N_ROUNDS
    return got / tot


def main():
    cfg = ReaderConfig(max_events=64)
    print("# ADC quantization (full_scale 1.5, leak 1.0, backscatter 0.08)")
    for bits in (12, 10, 8, 7, 6, 5):
        f = read_frac(cfg, RxImpairments(quant_bits=bits))
        print(f"quant_bits={bits:2d}  read_frac={f:.2f}")
    print("# IQ imbalance (gain dB / phase deg)")
    for g, p in ((0.2, 1.0), (0.5, 3.0), (1.0, 6.0), (2.0, 10.0), (3.0, 20.0)):
        imp = RxImpairments(iq_gain_db=g, iq_phase_deg=p)
        f = read_frac(cfg, imp)
        print(f"iq {g:.1f}dB/{p:4.1f}deg (IRR {imp.image_rejection_db:5.1f} dB)"
              f"  read_frac={f:.2f}")
    print("# LO phase noise (rad/sample random walk @ 2 Msps)")
    for s in (1e-3, 2e-3, 4e-3, 5e-3, 6e-3, 8e-3):
        fp = read_frac(cfg, RxImpairments(phase_walk_rad=s))
        ft = read_frac(cfg, RxImpairments(phase_walk_rad=s), track=True)
        print(f"phase_walk={s:.0e}  plain={fp:.2f}  tracked={ft:.2f}")
    print("# Adjacent-reader CW (dBc vs own leak)")
    for hz, tag_ in ((250e3, "out-of-band"), (40e3, "in-band")):
        for dbc in (-40, -30, -25, -20, -15, -10):
            imp = RxImpairments(interferer_dbc=float(dbc), interferer_hz=hz)
            f = read_frac(cfg, imp)
            print(f"interferer {dbc:+d} dBc @ {hz/1e3:.0f} kHz ({tag_})"
                  f"  read_frac={f:.2f}")


if __name__ == "__main__":
    main()
