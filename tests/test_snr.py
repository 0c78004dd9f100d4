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


def test_waterfalls_vs_theory():
    """Round-1 VERDICT item 9: measured FER=0.5 waterfalls for FM0,
    Miller-2/4/8 and high BLF must sit within 2 dB of the coherent-detection
    predictions (docs/SNR.md), and Miller must gain monotonically with M."""
    from gen2_rfid_tpu.sim.snr import (
        theory_miller_waterfall_db,
        theory_waterfall_db,
        waterfall_db,
    )

    fm0 = ReaderConfig(max_events=64)
    wf = {"fm0": waterfall_db(fm0, lo_db=5.0, hi_db=14.0)}
    assert abs(wf["fm0"] - theory_waterfall_db()) <= 2.0, wf

    for m, adc in [(2, 2e6), (4, 4e6), (8, 8e6)]:
        cfg = ReaderConfig(miller_m=m, adc_rate=adc, decim=2, max_events=64)
        wf[m] = waterfall_db(cfg, lo_db=-2.0, hi_db=14.0)
        assert abs(wf[m] - theory_miller_waterfall_db(m)) <= 2.0, (m, wf)
    assert wf[8] < wf[4] < wf[2]           # ~3 dB per doubling of M

    blf160 = ReaderConfig(blf_hz=160e3, adc_rate=2e6, decim=1, max_events=64)
    wf["blf160"] = waterfall_db(blf160, lo_db=5.0, hi_db=14.0)
    assert abs(wf["blf160"] - wf["fm0"]) <= 2.0    # normalization-invariant


def test_cfo_tracked_waterfall_vs_theory():
    """BER-vs-theory for tracked mode under CFO (round-2 follow-up to
    test_channel_tracking_extends_cfo_envelope): at 300 Hz the
    decision-directed tracker costs ~nothing - the waterfall sits within
    2.5 dB of coherent FM0 theory, i.e. at the CFO-free detector's own
    implementation loss - while the frozen-h_est detector decodes nothing
    even at 30 dB.  At 800 Hz the tracker holds lock only above ~16 dB
    (needs confident decisions to follow ~pi/3 rotation per segment):
    the documented envelope edge (docs/SNR.md)."""
    from gen2_rfid_tpu.sim.snr import (
        snr_sweep,
        theory_waterfall_db,
        waterfall_db,
    )

    tracked = ReaderConfig(max_events=64, track_channel=True)
    w300 = waterfall_db(tracked, lo_db=5.0, hi_db=14.0, cfo_hz=300.0)
    assert abs(w300 - theory_waterfall_db()) <= 2.5, w300

    untracked = ReaderConfig(max_events=64)
    r = snr_sweep(untracked, [30.0], n_rounds=16, cfo_hz=300.0)[0].epc_rate
    assert r == 0.0, r

    r800 = snr_sweep(tracked, [20.0], n_rounds=16, cfo_hz=800.0)[0].epc_rate
    assert r800 >= 0.75, r800
