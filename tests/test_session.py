"""Gen2 session inventory: Target A/B flags + flag-toggle semantics.

New capability vs the reference, which pins TARGET=0 (global_vars.h:121)
and re-reads every tag every round (70 reads of one tag on the golden
trace).  With session semantics a singulated tag toggles its inventoried
flag and drops out of the pass; the reader flips its Query target when a
round comes back empty, so each tag is read exactly once per pass.
"""

import numpy as np

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.protocol import gen2
from gen2_rfid_tpu.runtime.live import LiveReader
from gen2_rfid_tpu.sim.channel import SimTagChannel
from gen2_rfid_tpu.sim.tag import Tag

CFG = ReaderConfig()


def test_query_target_field_roundtrip():
    """query_bits target override lands in bit 12 and parses back; CRC-5
    still self-checks (crc5_append output verified by construction)."""
    for t in (0, 1):
        bits = gen2.query_bits(CFG, q=3, target=t)
        assert gen2.parse_query_target(bits) == t
        assert gen2.parse_query_q(bits) == 3
    # Default stays the config's pinned target (reference parity).
    assert gen2.parse_query_target(gen2.query_bits(CFG)) == CFG.target


def _tags(n=3):
    return [Tag.with_id(1 + i, seed=70 + i,
                        backscatter=0.08 * 0.85 ** i * np.exp(1.1j * i))
            for i in range(n)]


def test_channel_target_selects_population():
    """Only tags whose inventoried flag matches the Query target draw a
    slot; the others stay silent."""
    ch = SimTagChannel(CFG, _tags(), seed=5, session_ab=True)
    ch.tags[0].flag_b = True                      # pre-flip one tag to B
    enc_bits = gen2.query_bits(CFG, q=0, target=0)
    from gen2_rfid_tpu.tx.pie import PieEncoder

    tx = PieEncoder(CFG).query(0, 0)
    ch.exchange("query", enc_bits, tx, 400.0)
    assert ch.tags[0].slot == -1                  # B tag sat out target-A
    assert ch.tags[1].slot == 0 and ch.tags[2].slot == 0


def test_channel_flag_toggle_and_nak_cancel():
    """A valid ACK marks the tag pending; the next non-NAK command commits
    the flag toggle; a NAK cancels it (Gen2 6.3.2.4).  Power-down resets
    S0 flags."""
    from gen2_rfid_tpu.tx.pie import PieEncoder

    enc = PieEncoder(CFG)
    ch = SimTagChannel(CFG, _tags(1), seed=6, session_ab=True)
    ts = ch.tags[0]

    def query():
        ch.exchange("query", gen2.query_bits(CFG, q=0, target=int(ts.flag_b)),
                    enc.query(0, int(ts.flag_b)), 400.0)

    query()
    ch.exchange("ack", gen2.ack_bits(ts.rn16), enc.ack(ts.rn16), 4000.0)
    assert ts.pending_flip and not ts.flag_b
    # NAK cancels: the tag stays in population A.
    ch.exchange("nak", gen2.nak_bits(), enc.nak(), float(CFG.cw_us))
    assert not ts.pending_flip and not ts.flag_b
    # Without a NAK the next command commits the toggle.
    query()
    ch.exchange("ack", gen2.ack_bits(ts.rn16), enc.ack(ts.rn16), 4000.0)
    query()
    assert ts.flag_b and not ts.pending_flip
    # Power-down: S0 persistence does not survive power loss.
    ch.exchange("power_down", np.zeros(0, np.int64),
                np.zeros(CFG.n_p_down_tx, np.float32), 0.0)
    assert not ts.flag_b


def test_live_session_inventory_one_read_per_pass():
    """Closed loop with target_ab: each pass reads each tag exactly once,
    an empty round flips the target, and the next pass reads them all
    back - uniform coverage instead of collision-skewed rereads."""
    tags = [Tag.with_id(10 + i, seed=60 + i,
                        backscatter=0.08 * 0.85 ** i * np.exp(1.3j * i))
            for i in range(4)]
    ch = SimTagChannel(CFG, tags, seed=3, session_ab=True)
    rd = LiveReader(CFG, q_init=2, target_ab=True)
    st = rd.run_inventory(ch, 8)
    reads = [int(st.tag_reads[10 + i]) for i in range(4)]
    assert st.n_target_flips == 2
    assert reads == [3, 3, 3, 3]        # one read per tag per pass

    # Reference-style channel (no sessions): skewed rereads.
    ch2 = SimTagChannel(CFG, tags, seed=3)
    st2 = LiveReader(CFG, q_init=2).run_inventory(ch2, 8)
    reads2 = [int(st2.tag_reads[10 + i]) for i in range(4)]
    assert max(reads2) > min(reads2)


def test_two_readers_interleaved_different_sessions():
    """Two readers time-share the same tag population in different
    sessions (the warehouse portal + handheld scenario): per-session
    inventoried flags keep their passes independent - each reader reads
    every tag exactly once per its own pass, interleaved command by
    command on the shared medium."""
    import dataclasses

    from gen2_rfid_tpu.runtime.live import LiveReader

    cfg_s1 = dataclasses.replace(CFG, session=(0, 1))
    cfg_s2 = dataclasses.replace(CFG, session=(1, 0))
    tags = [Tag.with_id(t, seed=i, backscatter=0.08 * np.exp(1.3j * i))
            for i, t in enumerate((0x11, 0x22))]
    ch = SimTagChannel(cfg_s1, tags, seed=6, session_ab=True)
    rd_a = LiveReader(cfg_s1, q_init=2, target_ab=True)
    rd_b = LiveReader(cfg_s2, q_init=2, target_ab=True)
    # Interleave one Query round at a time.  Each reader completes two
    # passes over the 4 rounds (a pass ends when its session's A (or B)
    # population is exhausted and the target flips), reading every tag
    # exactly once per pass - unperturbed by the other reader's traffic,
    # because each session's inventoried flags are independent.
    for _ in range(4):
        rd_a.run_inventory(ch, 1)
        rd_b.run_inventory(ch, 1)
    for t in (0x11, 0x22):
        assert int(rd_a.stats.tag_reads[t]) == 2, hex(t)
        assert int(rd_b.stats.tag_reads[t]) == 2, hex(t)


def test_s1_flag_decays_on_its_own_timer():
    """Gen2 6.3.2.3 persistence: S1 reverts to A after its 500 ms - 5 s
    timer (powered or not); S2 persists while powered.  A session-S1
    pass silences a read tag only until the timer runs out."""
    import dataclasses

    import numpy as np

    from gen2_rfid_tpu.runtime.live import LiveReader

    def phase(cfg, ch, rounds=1):
        return int(LiveReader(cfg).run_inventory(ch, rounds).n_epc_correct)

    idle = (np.zeros(0, np.int64), np.zeros(0, np.float32))
    for session, expect_after_idle in [((0, 1), 1), ((1, 0), 0)]:
        cfg = dataclasses.replace(ReaderConfig(), session=session)
        ch = SimTagChannel(cfg, [Tag.with_id(27, seed=7)], seed=1,
                           session_ab=True, s1_persistence_s=0.05)
        assert phase(cfg, ch) == 1          # fresh tag: flag A, read
        assert phase(cfg, ch) == 0          # flag flipped to B: silent
        ch.exchange("cw", *idle, 60_000.0)  # 60 ms of channel time
        assert phase(cfg, ch) == expect_after_idle, session
