"""Live link-rate adaptation (runtime/live.py link_profiles).

Gen2 readers own the M / TRext fields of every Query (6.3.2.12.1): the
reply encoding is a per-round reader decision, and commercial readers
exploit it ("autoset" modes).  Two halves are pinned here:

* **Spec fidelity**: ``SimTagChannel`` replies at the encoding the Query
  COMMANDED (parsed from the M/TRext bits), not at any shared config —
  so a reader can switch encodings mid-inventory against one channel.
* **Rate control**: the ladder controller downshifts FM0 -> Miller when
  occupied slots stop decoding and upshifts back after sustained clean
  rounds.  The physical trigger is dense-reader interference (the reason
  Miller exists, docs/CLASSIFIER.md + tests/test_dense_reader.py): a
  -20 dBc CW at 40 kHz kills FM0 yet leaves Miller-4 exact.
"""

import numpy as np

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.protocol import gen2
from gen2_rfid_tpu.runtime.live import LiveReader, default_link_profiles
from gen2_rfid_tpu.sim.channel import SimTagChannel
from gen2_rfid_tpu.sim.impairments import ImpairedChannel, RxImpairments
from gen2_rfid_tpu.sim.tag import Tag

BASE = ReaderConfig()


def test_parse_query_m_trext_roundtrip():
    for m in (1, 2, 4, 8):
        for tr in (0, 1):
            cfg = ReaderConfig(miller_m=m, trext=tr)
            bits = gen2.query_bits(cfg)
            assert gen2.parse_query_m(bits) == m
            assert gen2.parse_query_trext(bits) == tr


def test_default_ladder_geometry():
    fm0, m2, m4 = default_link_profiles(BASE)
    assert (fm0.miller_m, fm0.decim) == (1, 5)
    assert (m2.miller_m, m2.decim) == (2, 2)
    assert (m4.miller_m, m4.decim) == (4, 1)


def test_channel_honors_commanded_m():
    """A channel constructed with the FM0 base config must reply in
    Miller-2 when the reader's Queries command M=2 — real tags take the
    encoding from the Query, not from shared state."""
    _, m2, _ = default_link_profiles(BASE)
    ch = SimTagChannel(BASE, [Tag.with_id(27, seed=7)], seed=1)
    st = LiveReader(m2).run_inventory(ch, 3)
    assert st.n_epc_correct == 3 and st.tag_reads[27] == 3
    assert ch.link_cfg.miller_m == 2


def test_link_downshift_reads_through_interferer():
    """Dense-reader scenario: -20 dBc CW at the tags' 40 kHz BLF.  A
    fixed-FM0 reader reads nothing (tests/test_dense_reader.py); the
    adaptive reader walks down the ladder until the subcarrier clears
    the interferer and reads every remaining round."""
    ladder = default_link_profiles(BASE)
    imp = RxImpairments(interferer_dbc=-20.0, interferer_hz=40e3)

    def channel():
        return ImpairedChannel(
            SimTagChannel(BASE, [Tag.with_id(27, seed=7)], seed=1),
            imp, BASE.adc_rate, seed=7)

    st0 = LiveReader(ladder[0]).run_inventory(channel(), 4)
    assert st0.n_epc_correct == 0          # fixed FM0: dead

    rd = LiveReader(ladder[0], link_profiles=ladder, link_down_after=1,
                    link_up_after=99)
    st = rd.run_inventory(channel(), 8)
    # The jammer also kills Miller-2 offline (subcarrier 80 kHz is still
    # too close to the 40 kHz tone) - the walk is FM0 -> M2 -> M4.
    assert [m for _, m in st.link_trace] == [2, 4]
    assert rd.cfg.miller_m == 4
    # Two evaluation rounds are lost walking the ladder; the M4 rounds
    # then read most slots (unlike offline replay, the live loop must
    # also decode the 16-bit RN16 under the jammer to earn each EPC -
    # measured: 4-6 of the 6 settled rounds, vs 0 for fixed FM0).
    assert st.tag_reads[27] >= 4


def test_link_upshift_on_clean_channel():
    """Starting on the robust rung of a clean channel, sustained clean
    rounds walk the reader back to FM0 without losing a single read."""
    ladder = default_link_profiles(BASE)
    ch = SimTagChannel(BASE, [Tag.with_id(27, seed=7)], seed=1)
    rd = LiveReader(ladder[2], link_profiles=ladder, link_up_after=2)
    st = rd.run_inventory(ch, 9)
    assert [m for _, m in st.link_trace] == [2, 1]
    assert rd.cfg.miller_m == 1
    assert st.n_epc_correct == 9 and st.tag_reads[27] == 9
