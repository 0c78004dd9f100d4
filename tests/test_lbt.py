"""Listen-before-talk over the ETSI EN 302 208 channel plan.

New capability (the reference transmits unconditionally on one fixed
carrier): before each Query round the reader senses the channel with
its TX off — in-channel FFT band power vs the plan's surveyed noise
floor — and moves off a busy channel instead of transmitting over the
other occupant.  The simulated band carries another reader's carrier
(SimTagChannel(interferers=...)), which also kills FM0 decode at
-10 dBc when parked on its channel: LBT is both the polite and the
self-interested move.
"""

import dataclasses

import numpy as np

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.runtime.live import ETSI_LOWER_MHZ, LiveReader
from gen2_rfid_tpu.sim.channel import SimTagChannel
from gen2_rfid_tpu.sim.tag import Tag

# Another reader occupies the 866.3 MHz channel (its carrier ~40 kHz
# off our center: hop centering / crystal offset — and exactly the
# dense-reader FM0 killer, tests/test_dense_reader.py).
BUSY = {866.34e6: -10.0}
CFG = dataclasses.replace(ReaderConfig(), freq_hz=866.3e6)


def _channel():
    return SimTagChannel(CFG, [Tag.with_id(27, seed=7)], seed=1,
                         interferers=BUSY)


def test_parked_on_busy_channel_reads_nothing():
    st = LiveReader(CFG).run_inventory(_channel(), 4)
    assert st.n_epc_correct == 0


def test_lbt_moves_off_busy_channel_and_reads():
    rd = LiveReader(CFG, lbt_mhz=list(ETSI_LOWER_MHZ))
    st = rd.run_inventory(_channel(), 4)
    # One defer off 866.3 to the next channel of the plan, then clean.
    assert st.n_lbt_defers == 1
    assert [f for _, f in st.lbt_trace] == [866.9]
    assert rd._carrier_hz == 866.9e6
    assert st.n_epc_correct == 4 and st.tag_reads[27] == 4


def test_lbt_stays_put_on_clean_channel():
    ch = SimTagChannel(CFG, [Tag.with_id(27, seed=7)], seed=1)
    rd = LiveReader(CFG, lbt_mhz=list(ETSI_LOWER_MHZ))
    st = rd.run_inventory(ch, 4)
    assert st.n_lbt_defers == 0 and not st.lbt_trace
    assert rd._carrier_hz == 866.3e6
    assert st.n_epc_correct == 4


def test_listen_is_protocol_silent():
    """Sensing windows must not disturb tag protocol state: a session-
    inventory pass with LBT reads each tag exactly once, as without."""
    tags = [Tag.with_id(t, seed=i, backscatter=0.08 * 0.8 ** i
                        * np.exp(1.1j * i)) for i, t in enumerate([5, 9])]
    ch = SimTagChannel(CFG, tags, seed=3, session_ab=True)
    rd = LiveReader(dataclasses.replace(CFG, fixed_q=1),
                    lbt_mhz=list(ETSI_LOWER_MHZ), target_ab=True)
    st = rd.run_inventory(ch, 6)
    assert int(st.tag_reads[5]) >= 1 and int(st.tag_reads[9]) >= 1


def test_lbt_noiseless_channel_not_all_busy():
    """A clean environment can measure a ~0 noise floor; without an
    absolute threshold floor every nonzero reading would classify busy and
    the reader would cycle the whole plan each round before 'transmitting
    anyway' (round-3 advisor finding).  lbt_floor_min keeps the threshold
    sane: zero defers, full reads."""
    ch = SimTagChannel(CFG, [Tag.with_id(27, seed=7)], seed=1, noise=0.0)
    rd = LiveReader(CFG, lbt_mhz=list(ETSI_LOWER_MHZ))
    st = rd.run_inventory(ch, 4)
    assert st.n_lbt_defers == 0 and not st.lbt_trace
    assert st.n_epc_correct == 4


def test_lbt_floor_tracks_ambient_rise():
    """The busy threshold follows the rolling per-channel minimum: after
    the initial low readings age out of the bounded history, a permanently
    higher ambient raises the floor instead of reading as perpetual
    occupancy (one-shot survey staleness, round-3 advisor finding)."""
    rd = LiveReader(CFG, lbt_mhz=[866.3, 866.9])
    rd._lbt_note(866.3, 1e-8)
    rd._lbt_note(866.9, 2e-8)
    t0 = rd._lbt_thresh()
    # Ambient rises 20 dB on both channels; 8 new readings each age the
    # old lows out of the history.
    for _ in range(8):
        rd._lbt_note(866.3, 1e-6)
        rd._lbt_note(866.9, 2e-6)
    t1 = rd._lbt_thresh()
    assert t1 > 50 * t0
    # And the absolute minimum clamps a measured ~0 floor.
    rd2 = LiveReader(CFG, lbt_mhz=[866.3])
    rd2._lbt_note(866.3, 0.0)
    assert rd2._lbt_thresh() >= rd2.lbt_floor_min
