"""Gen2 v2 Untraceable (6.3.2.12.3.13): over-the-air privacy state.

New capability (the reference predates Gen2 v2): from the Secured state the
reader hides the EPC tail (the tag thereafter backscatters a truncated EPC
with a correspondingly smaller PC length - exercising the PC-driven
variable-length decode), hides TID/USER memory from Read, and/or drops the
tag into a reduced-backscatter-power range profile (visible in per-read
RSSI).
"""

import numpy as np
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.protocol import gen2
from gen2_rfid_tpu.runtime.live import LiveReader
from gen2_rfid_tpu.sim.channel import SimTagChannel
from gen2_rfid_tpu.sim.tag import Tag

CFG = ReaderConfig()


def _tag(tag_id=0x2B, **kw):
    return Tag.with_id(tag_id, seed=kw.pop("seed", 7), **kw)


def test_untraceable_bit_synthesis():
    h = np.random.default_rng(1).integers(0, 2, 16)
    ub = gen2.untraceable_bits(h, epc_words=2, tid="all", hide_user=1,
                               range_="reduced")
    u, w, tid, hu, rng_, hh, ok = gen2.parse_untraceable(ub)
    assert ok and u == 0 and w == 2 and tid == "all" and hu == 1
    assert rng_ == "reduced"
    np.testing.assert_array_equal(hh, h)

    ub2 = gen2.untraceable_bits(h)                # no-op command
    u, w, tid, hu, rng_, hh, ok = gen2.parse_untraceable(ub2)
    assert ok and w is None and tid == "none" and hu == 0
    assert rng_ == "normal"
    bad = ub.copy()
    bad[12] ^= 1
    assert not gen2.parse_untraceable(bad)[6]


def test_tag_untraceable_model():
    t = _tag()
    assert t.epc_frame_bits().size == 16 + 96 + 16
    assert t.apply_untraceable(0, 2, "some", 1, "reduced")
    # Truncated reply: PC length field says 2 words, frame is PC+32+CRC.
    fr = t.epc_frame_bits()
    assert fr.size == 16 + 32 + 16
    ok, l, tid = gen2.parse_epc_frame(fr)
    assert ok and l == 2
    # TID "some": designer words readable, serial hidden.
    tid_mem = t.bank_bits(gen2.MEMBANK_TID)
    assert np.all(tid_mem[:32] >= 0) and np.all(tid_mem[32:] == -1)
    # USER hidden entirely.
    assert np.all(t.bank_bits(gen2.MEMBANK_USER) == -1)
    # Reduced range scales the backscatter amplitude.
    assert abs(t.channel_phasor(CFG)) == pytest.approx(
        abs(complex(t.backscatter)) * Tag.REDUCED_RANGE_SCALE)
    # Over-long exposure request fails (no reply).
    assert not t.apply_untraceable(0, 7, "none", 0, "normal")
    # "toggle" range profile is unsupported.
    assert not t.apply_untraceable(0, None, "none", 0, "toggle")


def test_live_untraceable_truncates_epc_over_the_air():
    """Round 1 reads the full 96-bit EPC and applies Untraceable
    (epc_words=2); later rounds decode the truncated 32-bit EPC via the
    PC length field - the tag's identifying tail byte is gone."""
    tag = _tag(0x2B)                              # zero access pwd: Secured
    ch = SimTagChannel(CFG, [tag], seed=2)
    rd = LiveReader(CFG, untraceable=dict(epc_words=2))
    st = rd.run_inventory(ch, 3)
    # Re-applied (idempotently) after every read - the truncated tag still
    # inventories, it just no longer exposes its tail.
    assert st.n_untraceable_ok == 3
    assert st.n_epc_correct == 3
    assert int(st.tag_reads[0x2B]) == 1           # full EPC only in round 1
    assert int(st.tag_reads[0x00]) == 2           # truncated EPC's tail byte


def test_live_untraceable_needs_secured():
    """With a nonzero access password and no Access sequence the tag is
    only Open: Untraceable gets no reply and privacy state is unchanged."""
    tag = _tag(access_pwd=0x12345678)
    ch = SimTagChannel(CFG, [tag], seed=2)
    st = LiveReader(CFG, untraceable=dict(epc_words=2)).run_inventory(ch, 2)
    assert st.n_untraceable_ok == 0
    assert tag.hide_epc_words is None
    # Same command after the Access sequence sticks.
    ch = SimTagChannel(CFG, [tag], seed=2)
    st = LiveReader(CFG, access_pwd=0x12345678,
                    untraceable=dict(epc_words=2)).run_inventory(ch, 2)
    assert st.n_untraceable_ok >= 1 and tag.hide_epc_words == 2


def test_live_untraceable_hides_tid_from_read():
    """tid="all" makes a subsequent TID Read silent; tid="some" keeps the
    first two (allocation-class/designer) words readable."""
    tag = _tag()
    ch = SimTagChannel(CFG, [tag], seed=3)
    st = LiveReader(CFG, untraceable=dict(tid="all"),
                    access_read=(0, 2, "tid")).run_inventory(ch, 2)
    # Round 1's Read precedes the Untraceable in the command sequence?  No:
    # the access sequence runs Untraceable before Read, so even round 1's
    # Read is refused.
    assert st.n_untraceable_ok >= 1 and st.n_read_ok == 0

    tag2 = _tag()
    ch = SimTagChannel(CFG, [tag2], seed=3)
    st = LiveReader(CFG, untraceable=dict(tid="some"),
                    access_read=(0, 2, "tid")).run_inventory(ch, 2)
    assert st.n_read_ok == 2                      # designer words readable
    np.testing.assert_array_equal(st.read_words[0x2B],
                                  tag2.tid_bank_bits()[:32])


def test_live_untraceable_reduced_range_drops_rssi():
    """Range=reduced: the tag still decodes (close range) but every
    subsequent read's RSSI drops by ~20*log10(scale) dB."""
    tag = _tag()
    ch = SimTagChannel(CFG, [tag], seed=4, noise=0.001)
    st = LiveReader(CFG, untraceable=dict(range_="reduced")).run_inventory(
        ch, 3)
    assert st.n_untraceable_ok == 3 and st.n_epc_correct == 3
    rssi = st.phase_series(0x2B)["rssi_dbfs"]
    drop = rssi[0] - rssi[1:].mean()
    expect = -20 * np.log10(Tag.REDUCED_RANGE_SCALE)
    assert drop == pytest.approx(expect, abs=1.5)


def test_xpc_word_rides_epc_reply():
    """U flag asserted (Untraceable u=1): the tag backscatters PC with
    the XI bit + an XPC_W1 word carrying U (Gen2 v2 6.3.2.1.2.4); the
    PC-aware parse returns the proper EPC (XPC excluded) and the flag."""
    t = Tag.with_id(0x2B, n_words=2, seed=7)
    assert t.apply_untraceable(1, None, "none", 0, "normal")
    fr = t.epc_frame_bits()
    # PC + XPC + 2 EPC words + CRC: the length field counts XPC + EPC.
    assert fr.size == 16 + 16 + 32 + 16
    ok, l, tid = gen2.parse_epc_frame(fr)
    assert ok and l == 3 and tid == 0x2B
    full = gen2.parse_epc_frame_full(fr)
    assert full["xi"] and full["u"] and full["tag_id"] == 0x2B
    np.testing.assert_array_equal(full["epc"], t.epc96)
    # Without U the frame is the plain PC+EPC+CRC.
    t2 = Tag.with_id(0x2B, n_words=2, seed=7)
    full2 = gen2.parse_epc_frame_full(t2.epc_frame_bits())
    assert not full2["xi"] and not full2["u"]


def test_xpc_decodes_over_the_air_and_reports_u():
    """A U-flagged tag inventories normally (the PC-aware validation
    absorbs the extra word) and the per-read report surfaces u_flag."""
    import jax.numpy as jnp

    from gen2_rfid_tpu.runtime.inventory import decode_capture
    from gen2_rfid_tpu.runtime.stats import tag_report_records
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    cfg = ReaderConfig(max_events=64)
    tag = Tag.with_id(0x2B, n_words=2, seed=7)
    tag.apply_untraceable(1, None, "none", 0, "normal")
    tr = synthesize_inventory(cfg, [tag], n_rounds=3, seed=5)
    stats, dec = decode_capture(jnp.asarray(tr.iq), cfg)
    assert int(stats.n_epc_correct) == 3
    assert int(stats.tag_reads[0x2B]) == 3
    recs = tag_report_records(dec, cfg)
    assert len(recs) == 3
    assert all(r["u_flag"] and r["epc_words"] == 2 for r in recs)
    # EPC hex excludes the XPC word: 2 words ending in the id byte.
    assert all(r["epc"].endswith("2b") and len(r["epc"]) == 8 for r in recs)


def test_live_untraceable_u_flag_over_the_air():
    """LiveReader(untraceable=dict(u=1)): the flag is applied via the
    access sequence and later reads carry the XPC word - inventory keeps
    working through the frame-format change."""
    tag = Tag.with_id(0x2B, n_words=2, seed=7)
    ch = SimTagChannel(CFG, [tag], seed=2)
    st = LiveReader(CFG, untraceable=dict(u=1)).run_inventory(ch, 3)
    assert st.n_untraceable_ok == 3 and tag.u_flag
    assert st.n_epc_correct == 3 and int(st.tag_reads[0x2B]) == 3
