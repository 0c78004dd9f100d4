"""SNR-bound verification on synthetic FM0 traces (BASELINE.md).

Measured waterfall sits near 9 dB post-matched-filter half-symbol SNR,
within ~2 dB of coherent FM0 frame-error theory for 128-bit frames; the
regression pins the operating region.
"""

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.sim.snr import snr_sweep


def test_snr_operating_region():
    cfg = ReaderConfig(max_events=64)
    pts = snr_sweep(cfg, [15.0, 12.0, 3.0], n_rounds=4)
    by = {p.snr_db: p.epc_rate for p in pts}
    assert by[15.0] == 1.0
    assert by[12.0] == 1.0
    assert by[3.0] == 0.0
    rates = [p.epc_rate for p in pts]
    assert rates == sorted(rates, reverse=True)  # monotone in SNR
