"""Receiver front-end impairments: decode robustness measurements.

The reference proved itself on one real USRP capture; here each front-end
effect (IQ imbalance, ADC quantization, LO phase noise, adjacent-reader CW
interference) is synthesized at controlled levels (sim/impairments.py) and
the decode chain must still produce exact inventory results - turning
"works on one capture" into a stated operating envelope.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.runtime.inventory import decode_capture
from gen2_rfid_tpu.runtime.live import LiveReader
from gen2_rfid_tpu.sim.channel import SimTagChannel
from gen2_rfid_tpu.sim.impairments import (
    ImpairedChannel,
    RxImpairments,
    apply_rx_impairments,
)
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import synthesize_inventory

CFG = ReaderConfig(max_events=64)


def _capture(seed=1, n_rounds=3):
    return synthesize_inventory(CFG, [Tag.with_id(27, seed=7)],
                                n_rounds=n_rounds, seed=seed)


def _decode_reads(iq) -> int:
    stats, _ = decode_capture(jnp.asarray(iq), CFG)
    return int(stats.tag_reads[27])


def test_image_rejection_formula():
    imp = RxImpairments(iq_gain_db=0.5, iq_phase_deg=3.0)
    # ~30 dB IRR is a typical uncalibrated direct-conversion front end.
    assert 25.0 < imp.image_rejection_db < 40.0
    assert RxImpairments().image_rejection_db == float("inf")


@pytest.mark.parametrize("bits", [12, 10, 8])
def test_adc_quantization(bits):
    """The backscatter rides ~22 dB below the carrier leak; an 8-bit ADC
    (leak at ~2/3 full scale) still yields exact decode."""
    tr = _capture()
    iq = apply_rx_impairments(tr.iq, RxImpairments(quant_bits=bits),
                              CFG.adc_rate)
    assert _decode_reads(iq) == 3


def test_iq_imbalance():
    tr = _capture()
    iq = apply_rx_impairments(
        tr.iq, RxImpairments(iq_gain_db=0.5, iq_phase_deg=3.0), CFG.adc_rate)
    assert _decode_reads(iq) == 3


def test_phase_noise_random_walk():
    """Wiener phase noise at 2e-3 rad/sample (2 Msps): ~0.17 rad rms drift
    across one 3.4 ms EPC frame - within the frozen-preamble h_est budget."""
    tr = _capture()
    iq = apply_rx_impairments(
        tr.iq, RxImpairments(phase_walk_rad=2e-3), CFG.adc_rate, seed=3)
    assert _decode_reads(iq) == 3


def test_phase_noise_heavy_needs_tracking():
    """At 5e-3 rad/sample the per-frame drift starts breaking the frozen
    h_est (measured envelope: plain decode drops reads at 5e-3, dies by
    8e-3); decision-directed channel tracking (track_channel=True)
    restores the exact decode - the same mechanism that buys the 10x CFO
    envelope."""
    tr = _capture(seed=5)
    iq = apply_rx_impairments(
        tr.iq, RxImpairments(phase_walk_rad=5e-3), CFG.adc_rate, seed=11)
    plain = _decode_reads(iq)
    cfg_t = dataclasses.replace(CFG, track_channel=True)
    stats, _ = decode_capture(jnp.asarray(iq), cfg_t)
    tracked = int(stats.tag_reads[27])
    assert plain < 3                 # frozen h_est loses frames here
    assert tracked == 3              # tracking recovers all of them


def test_adjacent_reader_cw():
    """A second reader's CW at +250 kHz, 15 dB below our own leak: the
    boxcar matched filter (~28 dB rejection at 250 kHz) and the gate's
    windowed statistics absorb the beat."""
    tr = _capture()
    iq = apply_rx_impairments(
        tr.iq, RxImpairments(interferer_dbc=-15.0, interferer_hz=250e3),
        CFG.adc_rate, seed=7)
    assert _decode_reads(iq) == 3


def test_combined_realistic_front_end():
    """Everything at once, at plausible uncalibrated-hardware levels:
    10-bit ADC, 0.5 dB / 2 deg IQ imbalance, 1e-3 rad/sample phase walk,
    -20 dBc adjacent reader."""
    tr = _capture()
    imp = RxImpairments(quant_bits=10, iq_gain_db=0.5, iq_phase_deg=2.0,
                        phase_walk_rad=1e-3, interferer_dbc=-20.0)
    iq = apply_rx_impairments(tr.iq, imp, CFG.adc_rate, seed=9)
    assert _decode_reads(iq) == 3


def test_live_loop_through_impaired_front_end():
    """Closed loop through ImpairedChannel: the decoded RN16 (through the
    impaired ADC) must still produce the ACK the tag accepts."""
    cfg = ReaderConfig()
    imp = RxImpairments(quant_bits=10, iq_gain_db=0.5, iq_phase_deg=2.0,
                        interferer_dbc=-20.0)
    ch = ImpairedChannel(SimTagChannel(cfg, [Tag.with_id(27, seed=7)],
                                       seed=1), imp, cfg.adc_rate)
    st = LiveReader(cfg).run_inventory(ch, 3)
    assert st.n_epc_correct == 3
    assert int(st.tag_reads[27]) == 3
