"""Capture-level CW interferer cancellation (dsp/interference.py).

The round-5 robustness sweep root-caused the M=2 dense-reader failures:
a -20 dBc tone AT the Miller-2 subcarrier (M*BLF/2 = 40 kHz) is
integrated coherently by the template and no per-frame filter can
separate it.  Time coherence can: the canceller estimates the tone
globally (FFT peak -> half-capture projection-phase frequency
refinement -> LS amp/phase) and subtracts it before the front end.

Caveat pinned here too: on a clean synthetic capture the strongest
off-DC line is the (zero-CFO) tag's own subcarrier line, which is just
as coherent - the subtraction then removes the capture-mean component
at that one frequency, which measurably does NOT affect decode (the
per-reply modulation carries the information), but the flag stays
default-off.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.runtime.inventory import decode_capture
from gen2_rfid_tpu.sim.impairments import RxImpairments, apply_rx_impairments
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import golden_trace, synthesize_inventory


def _tone_capture(m, adc, decim, dbc=-20.0, cancel=0, cfo=0.0):
    cfg = ReaderConfig(miller_m=m, adc_rate=adc, decim=decim, max_events=64,
                       cancel_cw=cancel, track_channel=cfo != 0.0)
    tr = synthesize_inventory(
        cfg, [Tag.with_id(27, seed=7, cfo_hz=cfo)], n_rounds=3, seed=1)
    iq = apply_rx_impairments(
        tr.iq, RxImpairments(interferer_dbc=dbc, interferer_hz=40e3),
        cfg.adc_rate, seed=7)
    stats, _ = decode_capture(jnp.asarray(iq), cfg)
    return int(stats.tag_reads[27])


def test_cancel_rescues_m2_on_subcarrier_tone():
    """The physically-unfilterable case: tone exactly at the M=2
    subcarrier.  Without cancellation the sweep measured 0-1/3."""
    assert _tone_capture(2, 2e6, 2, cancel=0) <= 1
    assert _tone_capture(2, 2e6, 2, cancel=1) == 3


def test_cancel_rescues_fm0_in_channel_tone():
    """FM0 dies at -20 dBc on its own sidebands
    (tests/test_dense_reader.py); the canceller restores exact decode."""
    assert _tone_capture(1, 2e6, 5, cancel=0) == 0
    assert _tone_capture(1, 2e6, 5, cancel=1) == 3


def test_cancel_composes_with_cfo_tracking():
    assert _tone_capture(2, 2e6, 2, cancel=1, cfo=300.0) == 3


def test_cancel_is_harmless_on_golden_and_clean_captures():
    """Flag on, no interferer: the golden tuple and clean Miller decodes
    are unchanged (the subtraction can at most remove the capture-mean
    line at one frequency - the per-reply modulation survives)."""
    cfg = ReaderConfig(cancel_cw=1)
    tr = golden_trace(ReaderConfig())
    stats, _ = decode_capture(jnp.asarray(tr.iq), cfg)
    assert (int(stats.n_queries), int(stats.cur_inventory_round),
            int(stats.n_epc_correct)) == (71, 72, 70)
    assert int(stats.tag_reads[0x1b]) == 70

    cfg = ReaderConfig(miller_m=4, adc_rate=4e6, decim=2, max_events=64,
                       cancel_cw=1)
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=3,
                              seed=1)
    stats, _ = decode_capture(jnp.asarray(tr.iq), cfg)
    assert int(stats.n_epc_correct) == 3


def test_noise_only_capture_is_untouched():
    """Pure noise has no >15 dB spectral excess: the guard keeps the
    canceller a bit-exact no-op."""
    from gen2_rfid_tpu.dsp.interference import cancel_cw

    rng = np.random.default_rng(0)
    iq = (rng.normal(0, 0.01, 1 << 18)
          + 1j * rng.normal(0, 0.01, 1 << 18)).astype(np.complex64)
    out = cancel_cw(iq)
    np.testing.assert_array_equal(out, iq)


def test_two_tone_cancellation():
    """cancel_cw=2 removes two independent tones (scan over n_tones)."""
    cfg = ReaderConfig(max_events=64, cancel_cw=2)
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=3,
                              seed=1)
    n = len(tr.iq)
    t = np.arange(n)
    iq = tr.iq + (0.1 * np.exp(2j * np.pi * 40e3 / 2e6 * t + 0.7j)
                  + 0.08 * np.exp(-2j * np.pi * 55e3 / 2e6 * t + 0.2j)
                  ).astype(np.complex64)
    stats, _ = decode_capture(jnp.asarray(iq), cfg)
    assert int(stats.tag_reads[27]) == 3
