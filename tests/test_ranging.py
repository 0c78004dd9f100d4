"""Phase-based ranging (PDOA) + Doppler velocity (runtime/ranging.py - new
capability built on the per-read h_est the reference computes and discards,
tag_decoder_impl.cc:103)."""

import numpy as np

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.runtime.inventory import decode_capture
from gen2_rfid_tpu.runtime.ranging import (
    FCC_HOP_FREQS_HZ,
    backscatter_phase,
    estimate_range,
    estimate_velocity,
    range_from_captures,
    tag_phase_series,
)
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import synthesize_inventory


def test_pdoa_math_roundtrip():
    d = 4.25
    freqs = FCC_HOP_FREQS_HZ[::7]
    rng = np.random.default_rng(0)
    phases = [backscatter_phase(f, d, phi0=0.8) + rng.normal(0, 0.02)
              for f in freqs]
    est = estimate_range(freqs, phases)
    assert abs(est["range_m"] - d) < 0.05
    assert est["resid_rad"] < 0.1


def test_doppler_math_roundtrip():
    f = 910e6
    v = -2.0                       # approaching
    c = 299_792_458.0
    t = np.arange(30) * 0.012
    phases = np.angle(np.exp(1j * (0.3 - 4 * np.pi * f * v * t / c)))
    est = estimate_velocity(t, phases, f)
    assert abs(est["velocity_mps"] - v) < 0.02


def test_ranging_end_to_end_across_hops():
    """Simulate one tag at 3.7 m across five FCC hop channels; the decoded
    per-read phases must localize it to centimeters."""
    d_true = 3.7
    dec_cfg = ReaderConfig()
    per_freq = []
    for f in FCC_HOP_FREQS_HZ[::12]:           # 5 hops spanning ~24 MHz
        cfg = ReaderConfig(freq_hz=f)
        tr = synthesize_inventory(
            cfg, [Tag.with_id(27, seed=7, distance_m=d_true)],
            n_rounds=3, seed=int(f) % 1000)
        stats, dec = decode_capture(tr.iq, dec_cfg)
        assert int(stats.n_epc_correct) == tr.expected_epc_pass
        per_freq.append((f, tag_phase_series(dec, dec_cfg)))
    est = range_from_captures(per_freq)
    assert 27 in est
    assert abs(est[27]["range_m"] - d_true) < 0.05, est[27]
    assert est[27]["resid_rad"] < 0.2


def test_velocity_end_to_end_single_capture():
    """A tag receding at 1.5 m/s rotates its per-read phase within one
    capture; the Doppler fit recovers the velocity."""
    v_true = 1.5
    cfg = ReaderConfig()
    tag = Tag.with_id(27, seed=7, distance_m=2.0, velocity_mps=v_true)
    tr = synthesize_inventory(cfg, [tag], n_rounds=40, seed=6)
    stats, dec = decode_capture(tr.iq, cfg)
    assert int(stats.n_epc_correct) == tr.expected_epc_pass
    series = tag_phase_series(dec, cfg)[27]
    assert series["time_s"].size == tr.expected_epc_pass
    est = estimate_velocity(series["time_s"], series["phase_rad"],
                            cfg.freq_hz)
    assert abs(est["velocity_mps"] - v_true) < 0.05, est


def test_static_tag_reports_zero_velocity():
    cfg = ReaderConfig()
    tag = Tag.with_id(27, seed=7, distance_m=2.0)
    tr = synthesize_inventory(cfg, [tag], n_rounds=10, seed=8)
    _, dec = decode_capture(tr.iq, cfg)
    series = tag_phase_series(dec, cfg)[27]
    est = estimate_velocity(series["time_s"], series["phase_rad"],
                            cfg.freq_hz)
    assert abs(est["velocity_mps"]) < 0.02


def test_aoa_from_diversity_decode():
    """Interferometric bearing: a 4-antenna lambda/4 array decodes one air
    interface (MRC); per-antenna phase differences localize the tag's
    angle of arrival to within a degree."""
    from gen2_rfid_tpu.runtime.diversity import decode_capture_mrc_full
    from gen2_rfid_tpu.runtime.ranging import C_LIGHT, aoa_from_mrc

    cfg = ReaderConfig(max_events=64)
    f = cfg.freq_hz
    lam = C_LIGHT / f
    pos = [k * lam / 4 for k in range(4)]     # lambda/4 linear array
    for theta_deg in (25.0, -40.0, 0.0):
        s = np.sin(np.radians(theta_deg))
        chans = []
        for x in pos:
            phi = 2 * np.pi * f * x * s / C_LIGHT
            tag = Tag.with_id(27, seed=7,
                              backscatter=0.08 * np.exp(1j * (0.4 + phi)))
            tr = synthesize_inventory(cfg, [tag], n_rounds=4,
                                      seed=int(x * 1e4) + 5)
            chans.append(tr.iq)
        n = min(c.size for c in chans)
        stats, dec, h_chan = decode_capture_mrc_full(
            [c[:n] for c in chans], cfg)
        assert int(stats.n_epc_correct) == 4
        est = aoa_from_mrc(dec, h_chan, pos, f)[27]
        assert abs(est["aoa_deg"] - theta_deg) < 1.0, (theta_deg, est)
        assert est["resid_rad"] < 0.1


def test_aoa_spacing_guard():
    import pytest

    from gen2_rfid_tpu.runtime.ranging import estimate_aoa

    with pytest.raises(AssertionError):
        estimate_aoa([0.0, 0.5], [0.0, 1.0], 910e6)   # > lambda/2


def test_live_doppler_phase_series():
    """The live reader records per-read phase observables; a receding tag's
    Doppler velocity comes straight out of one live inventory."""
    from gen2_rfid_tpu.runtime.live import LiveReader
    from gen2_rfid_tpu.sim.channel import SimTagChannel

    cfg = ReaderConfig()
    v_true = 1.2
    tag = Tag.with_id(27, seed=7, distance_m=2.5, velocity_mps=v_true)
    st = LiveReader(cfg).run_inventory(SimTagChannel(cfg, [tag], seed=3), 25)
    assert st.n_epc_correct == 25
    s = st.phase_series(0x1B)
    assert s["time_s"].size == 25
    est = estimate_velocity(s["time_s"], s["phase_rad"], cfg.freq_hz)
    assert abs(est["velocity_mps"] - v_true) < 0.05, est


def test_live_hopping_pdoa_range():
    """FCC frequency hopping in the live loop: the reader retunes the
    carrier every round, per-read phases span the hop plan, and
    LiveStats.range_estimate fits the range live (the commercial-reader
    PDOA workflow, fully closed-loop)."""
    from gen2_rfid_tpu.runtime.live import LiveReader
    from gen2_rfid_tpu.sim.channel import SimTagChannel

    cfg = ReaderConfig()
    d_true = 1.73
    tag = Tag.with_id(0x1B, seed=7, distance_m=d_true)
    ch = SimTagChannel(cfg, [tag], seed=4, noise=0.002)
    hops = [902.75, 907.25, 912.25, 917.25, 922.25, 927.25]
    rd = LiveReader(cfg, hop_mhz=hops)
    st = rd.run_inventory(ch, 12)
    assert st.n_epc_correct == 12
    s = st.phase_series(0x1B)
    assert len(set(s["freq_hz"])) == len(hops)    # all carriers visited
    est = rd.stats.range_estimate(0x1B)
    assert est is not None
    assert abs(est["range_m"] - d_true) < 0.05, est
    assert est["resid_rad"] < 0.3
    # A single-carrier session cannot range.
    ch2 = SimTagChannel(cfg, [Tag.with_id(0x1B, seed=7, distance_m=d_true)],
                        seed=4)
    rd2 = LiveReader(cfg)
    rd2.run_inventory(ch2, 3)
    assert rd2.stats.range_estimate(0x1B) is None
