"""Gen2 Select command: mask-based sub-population inventory.

New capability: Select is a mandatory Gen2 command (spec 6.3.2.12.1.1)
the reference never implements (its FSM knows only Query/QueryRep/
QueryAdjust/ACK/NAK, reader_impl.cc:200-380).  A Select asserts the SL
flag on tags whose EPC-bank memory matches a bit mask; Queries with
Sel=SL then inventory only that sub-population.
"""

import numpy as np

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.protocol import gen2
from gen2_rfid_tpu.protocol.crc import crc16_bits
from gen2_rfid_tpu.runtime.live import LiveReader
from gen2_rfid_tpu.sim.channel import SimTagChannel
from gen2_rfid_tpu.sim.tag import Tag

CFG = ReaderConfig()


def test_select_bits_roundtrip_and_crc():
    rng = np.random.default_rng(1)
    for L in (8, 13, 96):
        mask = rng.integers(0, 2, L)
        bits = gen2.select_bits(mask, pointer=0x20)
        tgt, action, bank, ptr, m, trunc, ok = gen2.parse_select(bits)
        assert ok and tgt == gen2.SELECT_TARGET_SL
        assert action == 0 and bank == gen2.MEMBANK_EPC
        assert ptr == 0x20 and trunc == 0
        np.testing.assert_array_equal(m, mask)
        # A flipped bit must fail the CRC.
        bad = bits.copy()
        bad[5] ^= 1
        assert not gen2.parse_select(bad)[-1]


def test_bitwise_crc16_matches_byte_oracle():
    """The bit-serial CRC-16 (Select commands are not byte-aligned) must
    equal the byte-packed oracle on byte-aligned data."""
    rng = np.random.default_rng(2)
    for nbytes in (2, 5, 14):
        d = rng.integers(0, 2, 8 * nbytes)
        np.testing.assert_array_equal(gen2._crc16_any(d), crc16_bits(d))


def test_epc_bank_layout():
    """EPC bank: StoredCRC @0x00, PC @0x10, EPC @0x20 (Gen2 6.3.2.1)."""
    t = Tag.with_id(27)
    mem = t.epc_bank_bits()
    body = np.concatenate([t.pc16, t.epc96])
    np.testing.assert_array_equal(mem[:16], crc16_bits(body))
    np.testing.assert_array_equal(mem[16:32], t.pc16)
    np.testing.assert_array_equal(mem[32:], t.epc96)


def _tags():
    # Two tags in EPC "family" 0xA (first EPC nibble), two in 0x5.
    tags = []
    for i, (nib, tid) in enumerate([(0xA, 1), (0xA, 2), (0x5, 3), (0x5, 4)]):
        epc = np.zeros(96, dtype=np.int64)
        epc[:4] = [(nib >> k) & 1 for k in (3, 2, 1, 0)]
        for k in range(8):
            epc[88 + k] = (tid >> (7 - k)) & 1
        tags.append(Tag(epc96=epc, seed=80 + i,
                        backscatter=0.08 * 0.85 ** i * np.exp(1.2j * i)))
    return tags


def test_live_select_gated_inventory():
    """LiveReader(select_mask=...) inventories exactly the masked family:
    the Select asserts SL on EPC-prefix matches, Queries carry Sel=SL, and
    only matching tags are ever read."""
    tags = _tags()
    mask = np.array([1, 0, 1, 0], dtype=np.int64)        # EPC nibble 0xA
    ch = SimTagChannel(CFG, tags, seed=9)
    rd = LiveReader(CFG, q_init=1, select_mask=(mask, 0x20))
    st = rd.run_inventory(ch, 6)
    reads = {t: int(st.tag_reads[t]) for t in (1, 2, 3, 4)}
    assert reads[1] > 0 and reads[2] > 0
    assert reads[3] == 0 and reads[4] == 0
    assert [ts.sl for ts in ch.tags] == [True, True, False, False]

    # The other family via the complementary mask.
    ch2 = SimTagChannel(CFG, tags, seed=9)
    rd2 = LiveReader(CFG, q_init=1,
                     select_mask=(np.array([0, 1, 0, 1]), 0x20))
    st2 = rd2.run_inventory(ch2, 6)
    assert int(st2.tag_reads[1]) == 0 and int(st2.tag_reads[2]) == 0
    assert int(st2.tag_reads[3]) > 0 and int(st2.tag_reads[4]) > 0


def test_select_no_selection_without_command():
    """Without a Select, Sel=SL queries match nothing; default (SEL_ALL)
    queries inventory everyone - SL starts deasserted."""
    tags = _tags()
    ch = SimTagChannel(CFG, tags, seed=9)
    bits = gen2.query_bits(CFG, q=0, sel=gen2.SEL_SL)
    from gen2_rfid_tpu.tx.pie import PieEncoder

    ch.exchange("query", bits, PieEncoder(CFG).query(0, None, gen2.SEL_SL),
                400.0)
    assert all(ts.slot == -1 for ts in ch.tags)


def test_select_truncate_reads_remainder():
    """Select Truncate=1 (Gen2 6.3.2.12.1.1): the ACKed tag backscatters
    only the EPC following the mask (header-0 + remainder + CRC-16) in a
    shorter CW - the reader still identifies and counts it."""
    import numpy as np

    from gen2_rfid_tpu.config import ReaderConfig
    from gen2_rfid_tpu.runtime.live import LiveReader
    from gen2_rfid_tpu.sim.channel import SimTagChannel
    from gen2_rfid_tpu.sim.tag import Tag

    cfg = ReaderConfig()
    t_match = Tag.with_id(0x1B, seed=7)              # EPC starts with zeros
    t_other = Tag.with_id(0x2C, seed=8)
    t_other.epc96[0] = 1                              # prefix differs
    mask = np.zeros(16, dtype=np.int64)               # first EPC word
    ch = SimTagChannel(cfg, [t_match, t_other], seed=5)
    rd = LiveReader(cfg, select_mask=(mask, 0x20), select_truncate=True)
    # The truncated reply is 97 bits (1 + 80 + 16) vs the full 129-bit frame.
    assert rd._trunc_nb == 97
    st = rd.run_inventory(ch, 3)
    assert st.n_epc_correct == 3
    assert st.n_truncated_reads == 3
    assert st.tag_reads[0x1B] == 3
    assert st.tag_reads[0x2C] == 0

    # Same Select without Truncate: full frames, zero truncated reads.
    ch2 = SimTagChannel(cfg, [t_match, t_other], seed=6)
    st2 = LiveReader(cfg, select_mask=(mask, 0x20)).run_inventory(ch2, 2)
    assert st2.n_epc_correct == 2 and st2.n_truncated_reads == 0


def _q(ch, cfg, q=0, target=0, sel=None):
    from gen2_rfid_tpu.tx.pie import PieEncoder

    bits = gen2.query_bits(cfg, q=q, target=target, sel=sel)
    ch.exchange("query", bits, PieEncoder(cfg).query(q, target, sel), 400.0)


def test_select_action_table():
    """All 8 Select actions (Gen2 table 6.29) on the SL flag: matching and
    non-matching tags each apply their column."""
    t_match, t_other = _tags()[0], _tags()[2]
    mask = np.array([1, 0, 1, 0], dtype=np.int64)        # matches family 0xA

    def send(ch, action, preset=None):
        if preset is not None:
            for ts, v in zip(ch.tags, preset):
                ts.sl = v
        sb = gen2.select_bits(mask, 0x20, action=action)
        from gen2_rfid_tpu.tx.pie import PieEncoder

        ch.exchange("select", sb, PieEncoder(CFG).select(sb), 250.0)
        return [ts.sl for ts in ch.tags]

    ch = SimTagChannel(CFG, [t_match, t_other], seed=1)
    assert send(ch, 0) == [True, False]                  # assert / deassert
    assert send(ch, 4) == [False, True]                  # deassert / assert
    assert send(ch, 1, preset=[False, True]) == [True, True]    # assert / -
    assert send(ch, 2, preset=[True, True]) == [True, False]    # - / deassert
    assert send(ch, 3, preset=[False, False]) == [True, False]  # negate / -
    assert send(ch, 3) == [False, False]                 # negate again
    assert send(ch, 5, preset=[True, True]) == [False, True]    # deassert / -
    assert send(ch, 6, preset=[False, False]) == [False, True]  # - / assert
    assert send(ch, 7, preset=[False, False]) == [False, True]  # - / negate


def test_select_tid_bank():
    """Select masks address TID memory too: the seed-derived TID serial
    singulates exactly one tag even when EPCs collide."""
    t1, t2 = Tag.with_id(9, seed=31), Tag.with_id(9, seed=32)   # same EPC!
    mask = t1.tid_bank_bits()[32:56]                     # t1's serial head
    ch = SimTagChannel(CFG, [t1, t2], seed=3)
    rd = LiveReader(CFG, select_mask=(mask, 32), select_bank="tid")
    rd.run_inventory(ch, 1)
    assert [ts.sl for ts in ch.tags] == [True, False]


def test_select_hidden_memory_never_matches():
    """Untraceable-hidden words (-1 sentinel) fail any Select mask."""
    t = Tag.with_id(9, seed=31, hide_tid="all")
    mask = t.tid_bank_bits()[:8]                         # 0xE2 class byte
    ch = SimTagChannel(CFG, [t], seed=3)
    sb = gen2.select_bits(mask, 0, membank=gen2.MEMBANK_TID)
    from gen2_rfid_tpu.tx.pie import PieEncoder

    ch.exchange("select", sb, PieEncoder(CFG).select(sb), 250.0)
    assert not ch.tags[0].sl


def test_select_session_flag_target():
    """Select targeting a session's inventoried flag (target 000-011)
    pre-positions the A/B populations: matching tags moved to B drop out
    of an A-target pass in that session - and other sessions' flags are
    untouched."""
    import dataclasses

    cfg2 = dataclasses.replace(CFG, session=(1, 0))      # S2
    tags = _tags()
    mask = np.array([1, 0, 1, 0], dtype=np.int64)        # family 0xA -> B
    ch = SimTagChannel(cfg2, tags, seed=9, session_ab=True)
    sb = gen2.select_bits(mask, 0x20, target=gen2.SELECT_TARGET_S[2],
                          action=5)                      # match -> B
    from gen2_rfid_tpu.tx.pie import PieEncoder

    ch.exchange("select", sb, PieEncoder(cfg2).select(sb), 250.0)
    assert [ts.flags[2] for ts in ch.tags] == [True, True, False, False]
    assert all(not ts.flags[s] for ts in ch.tags for s in (0, 1, 3))
    # An S2 target-A query: only the un-selected family participates.
    _q(ch, cfg2, q=0, target=0)
    assert [ts.slot == 0 for ts in ch.tags] == [False, False, True, True]


def test_session_flags_are_independent():
    """A pass in one session must not consume another session's flags:
    two readers inventorying in S1 and S2 each read every tag."""
    import dataclasses

    tags = [Tag.with_id(27, seed=7)]
    cfg_s1 = dataclasses.replace(CFG, session=(0, 1))
    cfg_s2 = dataclasses.replace(CFG, session=(1, 0))
    ch = SimTagChannel(cfg_s1, tags, seed=5, session_ab=True)
    st1 = LiveReader(cfg_s1).run_inventory(ch, 1)
    assert int(st1.tag_reads[27]) == 1
    # The flip commits at the NEXT command (Gen2 6.3.2.4) - pending here.
    assert ch.tags[0].pending_flip and ch.tags[0].flip_session == 1
    # Reader 2, session S2, same channel state: reader 2's first Query
    # commits the S1 flip, and the tag still participates (its S2 flag is
    # untouched) - each reader reads the tag once in its own session.
    st2 = LiveReader(cfg_s2).run_inventory(ch, 1)
    assert int(st2.tag_reads[27]) == 1
    assert ch.tags[0].flags[1]
    assert ch.tags[0].pending_flip and ch.tags[0].flip_session == 2
