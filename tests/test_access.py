"""Gen2 access commands: Req_RN (handle) + Read (tag memory over the air).

New capability: the reference never leaves inventory (its reader FSM is
Query/QueryRep/QueryAdjust/ACK/NAK only, reader_impl.cc:200-380).  Here the
live reader runs the spec access sequence (Gen2 6.3.2.12.3) after each
correct EPC: Req_RN fetches a CRC-16-protected 16-bit handle from the
acknowledged tag, and Read returns memory words with a handle echo, both
verified bit-exactly against the tag's EPC-bank contents.
"""

import numpy as np
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.protocol import gen2
from gen2_rfid_tpu.runtime.live import LiveReader
from gen2_rfid_tpu.sim.channel import SimTagChannel
from gen2_rfid_tpu.sim.tag import Tag

CFG = ReaderConfig()


def test_req_rn_and_read_bit_synthesis():
    rng = np.random.default_rng(1)
    rn = rng.integers(0, 2, 16)
    bits = gen2.req_rn_bits(rn)
    got_rn, ok = gen2.parse_req_rn(bits)
    assert ok
    np.testing.assert_array_equal(got_rn, rn)
    bad = bits.copy()
    bad[9] ^= 1
    assert not gen2.parse_req_rn(bad)[1]

    h = rng.integers(0, 2, 16)
    rd = gen2.read_bits(h, wordptr=2, wordcount=3)
    bank, ptr, cnt, hh, ok = gen2.parse_read(rd)
    assert ok and bank == gen2.MEMBANK_EPC and ptr == 2 and cnt == 3
    np.testing.assert_array_equal(hh, h)

    # Reply frames self-check.
    hr = gen2.handle_reply_bits(h)
    np.testing.assert_array_equal(gen2._crc16_any(hr[:16]), hr[16:])
    words = rng.integers(0, 2, 32)
    rr = gen2.read_reply_bits(words, h)
    assert rr[0] == 0
    np.testing.assert_array_equal(gen2._crc16_any(rr[:-16]), rr[-16:])


def _tag(seed=7):
    rng = np.random.default_rng(seed)
    epc = rng.integers(0, 2, 96)
    for k in range(8):
        epc[88 + k] = (0x2B >> (7 - k)) & 1
    return Tag(epc96=epc, seed=seed)


@pytest.mark.parametrize("m,adc,decim", [(1, 2e6, 5), (2, 2e6, 2)])
def test_live_access_read_matches_epc_bank(m, adc, decim):
    """Full closed loop (FM0 and Miller-2): every inventoried EPC is
    followed by Req_RN + Read, and the Read data equals the tag's actual
    EPC-bank words - proving the generic n-bit reply decode, the handle
    CRC, and the handle echo all work over the simulated air interface."""
    cfg = ReaderConfig(miller_m=m, adc_rate=adc, decim=decim)
    tag = _tag()
    ch = SimTagChannel(cfg, [tag], seed=2)
    rd = LiveReader(cfg, access_read=(2, 2))
    st = rd.run_inventory(ch, 3)
    assert st.n_epc_correct == 3
    assert st.n_req_rn_ok == 3 and st.n_read_ok == 3
    np.testing.assert_array_equal(st.read_words[0x2B],
                                  tag.epc_bank_bits()[32:64])


def test_write_bits_roundtrip():
    rng = np.random.default_rng(4)
    h, cover = rng.integers(0, 2, 16), rng.integers(0, 2, 16)
    wb = gen2.write_bits(h, cover, membank=gen2.MEMBANK_USER, wordptr=3)
    bank, ptr, cv, hh, ok = gen2.parse_write(wb)
    assert ok and bank == gen2.MEMBANK_USER and ptr == 3
    np.testing.assert_array_equal(cv, cover)
    np.testing.assert_array_equal(hh, h)
    wr = gen2.write_reply_bits(h)
    assert wr[0] == 0 and wr.size == 33
    np.testing.assert_array_equal(gen2._crc16_any(wr[:17]), wr[17:])


def test_live_write_then_read_back_user_bank():
    """Full closed loop: Write 0xBEEF to USER word 3 (cover-coded via a
    second Req_RN) then Read it back - the round trip proves cover-code
    handling, the Write success reply, and USER-bank addressing."""
    word = np.array([int(b) for b in f"{0xBEEF:016b}"], dtype=np.int64)
    tag = _tag()
    ch = SimTagChannel(CFG, [tag], seed=1)
    rd = LiveReader(CFG, access_write=(3, word, "user"),
                    access_read=(3, 1, "user"))
    st = rd.run_inventory(ch, 2)
    assert st.n_write_ok == 2 and st.n_read_ok == 2
    np.testing.assert_array_equal(st.read_words[0x2B], word)
    np.testing.assert_array_equal(tag.user_bank[48:64], word)


def test_live_epc_relabel():
    """Writing EPC-bank word 7 (EPC bits 80:96, the ID byte's word)
    re-labels the tag over the air: the next inventory round reads the
    NEW EPC (StoredCRC recomputes, Gen2 recommissioning behavior)."""
    tag = Tag.with_id(27, seed=7)
    new_word = np.array([int(b) for b in f"{0x00AA:016b}"], dtype=np.int64)
    ch = SimTagChannel(CFG, [tag], seed=1)
    rd = LiveReader(CFG, access_write=(7, new_word, "epc"))
    st = rd.run_inventory(ch, 3)
    assert st.n_write_ok == 3
    assert int(st.tag_reads[0x1B]) == 1     # round 1: original identity
    assert int(st.tag_reads[0xAA]) == 2     # rounds 2-3: re-labeled


def test_access_requires_acknowledged_state():
    """A Req_RN with a non-matching RN16 (or after the slot closed) gets
    no reply - the tag state machine gates access."""
    from gen2_rfid_tpu.tx.pie import PieEncoder

    enc = PieEncoder(CFG)
    ch = SimTagChannel(CFG, [_tag()], seed=3)
    ts = ch.tags[0]
    ch.exchange("query", gen2.query_bits(CFG, q=0), enc.query(0), 400.0)
    wrong = (1 - np.asarray(ts.rn16)) % 2
    rr = gen2.req_rn_bits(wrong)
    ch.exchange("req_rn", rr, enc.command(rr), 1200.0)
    assert ts.handle is None          # not acknowledged yet, RN16 mismatch
    ch.exchange("ack", gen2.ack_bits(ts.rn16), enc.ack(ts.rn16), 4000.0)
    assert ts.acked
    rr = gen2.req_rn_bits(wrong)
    ch.exchange("req_rn", rr, enc.command(rr), 1200.0)
    assert ts.handle is None          # acknowledged but wrong RN16
    rr = gen2.req_rn_bits(ts.rn16)
    ch.exchange("req_rn", rr, enc.command(rr), 1200.0)
    assert ts.handle is not None      # correct RN16 -> Open state


def test_tracked_miller_access_read_arbitrary_length():
    """Channel tracking over an access-reply payload whose half-bit count
    is not a multiple of the tracker's 4-sample segments (an 8-word Read
    reply: 33+128 = 161 bits -> 322 differential statistics).  Found by
    the cross-feature fuzz (round 4): fm0._track_and_slice reshaped to
    (n//4, 4) and crashed; frames now pad with never-confident zeros and
    trim after the scan."""
    cfg = ReaderConfig(miller_m=4, decim=1, track_channel=True)
    tag = _tag()
    ch = SimTagChannel(cfg, [tag], seed=1)
    rd = LiveReader(cfg, access_read=(0, 8, "user"))
    st = rd.run_inventory(ch, 2)
    assert st.n_epc_correct == 2 and st.n_read_ok == 2
    np.testing.assert_array_equal(st.read_words[0x2B], tag.user_bank[:128])
