"""PIE link-timing generality: Tari parametrization + DR=64/3 divide ratio.

The reference pins its entire link geometry at compile time (Tari 24 us via
PW_D=12, RTcal 72, TRcal 200, DR=8 -> BLF 40 kHz; global_vars.h:90-116,
and DR pinned to 0 in the Query bits, global_vars.h:117).  Here the geometry
derives from ``ReaderConfig.for_link`` the way Gen2 6.3.1.2 couples it
(PW = Tari/2, RTcal = 3*Tari, TRcal = DR/BLF), so any in-spec
(Tari, DR, BLF) point decodes - including the DR=64/3 ratio the reference
never exercises.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.runtime.inventory import decode_capture
from gen2_rfid_tpu.runtime.live import LiveReader
from gen2_rfid_tpu.sim.channel import SimTagChannel
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import synthesize_inventory
from gen2_rfid_tpu.tx.pie import PieEncoder


def test_for_link_defaults_reproduce_reference_geometry():
    cfg = ReaderConfig.for_link(blf_hz=40e3)
    ref = ReaderConfig()
    assert cfg.pw_us == ref.pw_us == 12
    assert cfg.rtcal_us == ref.rtcal_us == 72
    assert cfg.trcal_us == ref.trcal_us == 200
    assert cfg.tari_us == 24 and cfg.dr_ratio == 8.0
    # The reference constants are self-consistent: 8 / 200 us = 40 kHz.
    assert ref.blf_from_trcal == pytest.approx(ref.blf_hz)
    # Frozen-dataclass equality: for_link changes nothing else.
    assert cfg == ref


def test_for_link_validates_spec_envelopes():
    with pytest.raises(AssertionError):
        ReaderConfig.for_link(blf_hz=40e3, tari_us=5.0)     # Tari < 6.25
    with pytest.raises(AssertionError):
        ReaderConfig.for_link(blf_hz=40e3, tari_us=12.5)    # TRcal > 3*RTcal
    with pytest.raises(AssertionError):
        ReaderConfig.for_link(blf_hz=640e3, tari_us=25.0)   # TRcal < 1.1*RTcal


def test_dr64_3_trcal():
    cfg = ReaderConfig.for_link(blf_hz=160e3, tari_us=24.0, dr=1)
    assert cfg.dr == 1 and cfg.dr_ratio == pytest.approx(64.0 / 3.0)
    assert cfg.trcal_us == pytest.approx(133.333, abs=1e-3)
    assert cfg.blf_from_trcal == pytest.approx(160e3)
    # The DR bit rides in the Query (bit 4, after the 4-bit code).
    from gen2_rfid_tpu.protocol.gen2 import query_bits

    assert query_bits(cfg)[4] == 1
    assert query_bits(ReaderConfig())[4] == 0


def test_pie_tables_scale_with_tari():
    cfg = ReaderConfig.for_link(blf_hz=100e3, tari_us=12.5)
    enc = PieEncoder(cfg)
    # data-0 = Tari, data-1 = 2*Tari, RTcal = 3*Tari (at 1 us/sample,
    # truncated like the reference's int sample counts).
    assert enc.data0.size == 12 and enc.data1.size == 25
    assert enc.rtcal.size == 37
    assert enc.trcal.size == cfg.n_trcal_tx == 80
    # PW low tail on every symbol.
    assert enc.data0[-1] == 0 and enc.data1[-1] == 0


@pytest.mark.parametrize(
    "tari,dr,blf,adc,decim",
    [
        (12.5, 0, 100e3, 2e6, 2),    # short Tari, DR=8
        (24.0, 1, 160e3, 2e6, 1),    # reference Tari, DR=64/3
        (6.25, 1, 640e3, 8e6, 1),    # spec minimum Tari, DR=64/3, fast link
    ],
)
def test_offline_decode_off_reference_link_points(tari, dr, blf, adc, decim):
    cfg = ReaderConfig.for_link(blf_hz=blf, tari_us=tari, dr=dr,
                                adc_rate=adc, decim=decim, max_events=64)
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)],
                              n_rounds=3, seed=1)
    stats, _ = decode_capture(jnp.asarray(tr.iq), cfg)
    assert int(stats.n_queries) == 3
    assert int(stats.n_epc_correct) == 3
    assert int(stats.tag_reads[27]) == 3


def test_live_loop_short_tari_dr64_3():
    """Closed loop at (Tari 12.5 us, DR=64/3, BLF 320 kHz): the decoded
    RN16 must still feed a correct ACK through the re-derived PIE tables."""
    cfg = ReaderConfig.for_link(blf_hz=320e3, tari_us=12.5, dr=1,
                                adc_rate=4e6, decim=1)
    tag = Tag.with_id(27, seed=7)
    ch = SimTagChannel(cfg, [tag], seed=1)
    st = LiveReader(cfg).run_inventory(ch, 3)
    assert st.n_epc_correct == 3
    assert int(st.tag_reads[27]) == 3
