"""Measure decode-rate-vs-SNR curves and waterfall positions per mode.

Modes: FM0 @ BLF 40 kHz (reference operating point), Miller-2/4/8, and
FM0 @ BLF 160 kHz.  SNR is per post-matched-filter half-symbol (FM0) /
half-chip (Miller) - see sim/snr.py.  Output feeds docs/SNR.md and the
regression bounds in tests/test_snr.py.

Run: env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/snr_curves.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from gen2_rfid_tpu.config import ReaderConfig  # noqa: E402
from gen2_rfid_tpu.sim.snr import (  # noqa: E402
    snr_sweep,
    theory_waterfall_db,
    waterfall_db,
)

MODES = {
    "fm0_blf40": ReaderConfig(max_events=64),
    "miller2": ReaderConfig(miller_m=2, adc_rate=2e6, decim=2, max_events=64),
    "miller4": ReaderConfig(miller_m=4, adc_rate=4e6, decim=2, max_events=64),
    "miller8": ReaderConfig(miller_m=8, adc_rate=8e6, decim=2, max_events=64),
    "fm0_blf160": ReaderConfig(blf_hz=160e3, adc_rate=2e6, decim=1,
                               max_events=64),
}


def main():
    grid = np.arange(-4.0, 16.1, 2.0)
    print(f"theory FM0 waterfall: {theory_waterfall_db():.2f} dB "
          "(Q(sqrt(g)) per bit, 128-bit frame)")
    print("| mode | " + " | ".join(f"{s:.0f}" for s in grid) +
          " | waterfall dB |")
    print("|---" * (len(grid) + 2) + "|")
    for name, cfg in MODES.items():
        pts = snr_sweep(cfg, list(grid), n_rounds=16)
        wf = waterfall_db(cfg, lo_db=-6.0, hi_db=16.0, tol_db=0.25)
        row = " | ".join(f"{p.epc_rate:.2f}" for p in pts)
        print(f"| {name} | {row} | {wf:.2f} |", flush=True)


if __name__ == "__main__":
    main()
