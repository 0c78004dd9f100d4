"""Gen2 security commands: Access / Kill / Lock / BlockWrite.

New capability (the reference never leaves inventory,
reader_impl.cc:200-380): the full Gen2 6.3.2.12.3 security state machine -
cover-coded 32-bit passwords (two Req_RN-covered halves each), the Secured
state gating Lock and password-locked memory, permanent Kill, permalock
semantics, and the multi-word plaintext BlockWrite - all driven over the
simulated air interface with every reply decoded from waveforms and
CRC-16-verified.
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


def _word(v):
    return np.array([int(b) for b in f"{v:016b}"], dtype=np.int64)


# ---- bit synthesis round trips --------------------------------------------

def test_security_bit_synthesis():
    rng = np.random.default_rng(3)
    h = rng.integers(0, 2, 16)
    half = rng.integers(0, 2, 16)

    ab = gen2.access_bits(h, half)
    c, hh, ok = gen2.parse_access(ab)
    assert ok
    np.testing.assert_array_equal(c, half)
    np.testing.assert_array_equal(hh, h)
    bad = ab.copy()
    bad[11] ^= 1
    assert not gen2.parse_access(bad)[2]

    kb = gen2.kill_bits(h, half)
    c, rfu, hh, ok = gen2.parse_kill(kb)
    assert ok and tuple(rfu) == (0, 0, 0)
    np.testing.assert_array_equal(c, half)
    np.testing.assert_array_equal(hh, h)

    pay = gen2.lock_payload(epc=(1, 0), kill=(1, 1))
    lb = gen2.lock_bits(h, pay)
    p, hh, ok = gen2.parse_lock(lb)
    assert ok
    np.testing.assert_array_equal(p, pay)
    # mask asserted only for kill + epc fields
    np.testing.assert_array_equal(p[:10], [1, 1, 0, 0, 1, 1, 0, 0, 0, 0])
    np.testing.assert_array_equal(p[10:], [1, 1, 0, 0, 1, 0, 0, 0, 0, 0])

    data = rng.integers(0, 2, 48)                 # 3 words
    bw = gen2.blockwrite_bits(h, data, membank=gen2.MEMBANK_USER, wordptr=2)
    bank, ptr, d, hh, ok = gen2.parse_blockwrite(bw)
    assert ok and bank == gen2.MEMBANK_USER and ptr == 2
    np.testing.assert_array_equal(d, data)
    np.testing.assert_array_equal(hh, h)

    hi, lo = gen2.pwd_halves(0xDEAD1234)
    assert int("".join(map(str, hi)), 2) == 0xDEAD
    assert int("".join(map(str, lo)), 2) == 0x1234


def test_tag_memory_and_lock_model():
    t = _tag(kill_pwd=0xDEAD1234, access_pwd=0xCAFE5678)
    res = t.reserved_bank_bits()
    assert int("".join(map(str, res[:32])), 2) == 0xDEAD1234
    assert int("".join(map(str, res[32:])), 2) == 0xCAFE5678
    tid = t.tid_bank_bits()
    assert int("".join(map(str, tid[:8])), 2) == 0xE2
    assert tid.size == 96

    # Write-lock the USER bank: writes fail outside Secured, work inside.
    assert t.apply_lock(gen2.lock_payload(user=(1, 0)))
    assert not t.write_word(gen2.MEMBANK_USER, 0, _word(1), secured=False)
    assert t.write_word(gen2.MEMBANK_USER, 0, _word(1), secured=True)

    # Password lock hides the kill password from un-secured reads.
    assert t.apply_lock(gen2.lock_payload(kill=(1, 0)))
    assert np.all(t.bank_bits(gen2.MEMBANK_RESERVED, secured=False)[:32] == -1)
    assert np.all(t.bank_bits(gen2.MEMBANK_RESERVED, secured=True) >= 0)

    # Permalock freezes the field: changing it back fails forever.
    assert t.apply_lock(gen2.lock_payload(epc=(1, 1)))
    assert not t.apply_lock(gen2.lock_payload(epc=(0, 0)))
    assert t.apply_lock(gen2.lock_payload(epc=(1, 1)))   # same value: no-op
    # TID is factory read-only regardless of state.
    assert not t.write_word(gen2.MEMBANK_TID, 0, _word(1), secured=True)


# ---- closed-loop kill ------------------------------------------------------

def test_live_kill_silences_tag():
    """Round 1 inventories + kills the tag over the air (two cover-coded
    password halves, delayed success reply); rounds 2-3 find silence."""
    tag = _tag(kill_pwd=0xDEAD1234)
    ch = SimTagChannel(CFG, [tag], seed=2)
    rd = LiveReader(CFG, kill_pwd=0xDEAD1234)
    st = rd.run_inventory(ch, 3)
    assert st.n_kill_ok == 1 and tag.killed
    assert st.n_epc_correct == 1
    assert int(st.tag_reads[0x2B]) == 1


def test_kill_needs_the_right_password():
    tag = _tag(kill_pwd=0xDEAD1234)
    ch = SimTagChannel(CFG, [tag], seed=2)
    rd = LiveReader(CFG, kill_pwd=0xDEAD0000)     # wrong LSB half
    st = rd.run_inventory(ch, 2)
    assert st.n_kill_ok == 0 and not tag.killed
    assert st.n_epc_correct == 2                  # still alive both rounds


def test_kill_zero_password_disabled():
    """A tag with a zero kill password shall not execute a Kill
    (Gen2 6.3.2.12.3.4): the command is ignored entirely."""
    tag = _tag(kill_pwd=0)
    ch = SimTagChannel(CFG, [tag], seed=2)
    rd = LiveReader(CFG, kill_pwd=0)
    st = rd.run_inventory(ch, 2)
    assert st.n_kill_ok == 0 and not tag.killed
    assert st.n_epc_correct == 2


# ---- closed-loop access / lock --------------------------------------------

def test_live_access_unlocks_locked_write():
    """USER bank write-locked: a plain Write gets no reply; running the
    Access sequence first (tag -> Secured) makes the same Write stick."""
    word = _word(0xBEEF)
    tag = _tag(access_pwd=0x12345678)
    tag.apply_lock(gen2.lock_payload(user=(1, 0)))

    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, access_write=(3, word, "user")).run_inventory(ch, 1)
    assert st.n_write_ok == 0
    assert not np.array_equal(tag.user_bank[48:64], word)

    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, access_pwd=0x12345678,
                    access_write=(3, word, "user")).run_inventory(ch, 1)
    assert st.n_access_ok == 1 and st.n_write_ok == 1
    np.testing.assert_array_equal(tag.user_bank[48:64], word)


def test_live_access_wrong_password_stays_open():
    tag = _tag(access_pwd=0x12345678)
    tag.apply_lock(gen2.lock_payload(user=(1, 0)))
    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, access_pwd=0x12340000,
                    access_write=(3, _word(1), "user")).run_inventory(ch, 1)
    assert st.n_access_ok == 0 and st.n_write_ok == 0


def test_live_lock_over_the_air():
    """Pass A locks the USER bank from the Secured state; pass B (no
    password) can no longer write it; pass C (with password) can."""
    word = _word(0x5A5A)
    tag = _tag(access_pwd=0xA5A55A5A)

    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, access_pwd=0xA5A55A5A,
                    lock=gen2.lock_payload(user=(1, 0))).run_inventory(ch, 1)
    assert st.n_lock_ok == 1

    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, access_write=(0, word, "user")).run_inventory(ch, 1)
    assert st.n_write_ok == 0

    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, access_pwd=0xA5A55A5A,
                    access_write=(0, word, "user")).run_inventory(ch, 1)
    assert st.n_write_ok == 1
    np.testing.assert_array_equal(tag.user_bank[:16], word)


def test_lock_requires_secured_state():
    """Lock from the Open state (nonzero access pwd, no Access run) is
    ignored; with a zero access password the tag enters Secured directly
    at Req_RN (Gen2 6.3.2.4) and the Lock lands."""
    tag = _tag(access_pwd=0x11112222)
    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, lock=gen2.lock_payload(user=(1, 0))
                    ).run_inventory(ch, 1)
    assert st.n_lock_ok == 0

    tag2 = _tag(access_pwd=0)
    ch = SimTagChannel(CFG, [tag2], seed=1)
    st = LiveReader(CFG, lock=gen2.lock_payload(user=(1, 0))
                    ).run_inventory(ch, 1)
    assert st.n_lock_ok == 1
    assert tag2._lock("user")


def test_reserved_bank_read_gated_by_pwd_lock():
    """Reading the kill password works in the Open state while unlocked;
    once pwd-locked it needs the Access sequence."""
    tag = _tag(kill_pwd=0xDEAD1234, access_pwd=0x22224444)
    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, access_read=(0, 2, "reserved")).run_inventory(ch, 1)
    assert st.n_read_ok == 1
    assert int("".join(map(str, st.read_words[0x2B])), 2) == 0xDEAD1234

    tag.apply_lock(gen2.lock_payload(kill=(1, 0)))
    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, access_read=(0, 2, "reserved")).run_inventory(ch, 1)
    assert st.n_read_ok == 0

    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, access_pwd=0x22224444,
                    access_read=(0, 2, "reserved")).run_inventory(ch, 1)
    assert st.n_read_ok == 1


def test_live_blockwrite_then_read_back():
    """One BlockWrite carries two plaintext words into USER; a Read
    round-trips them; TID reads return the factory identity."""
    data = np.concatenate([_word(0x1234), _word(0xABCD)])
    tag = _tag()
    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, block_write=(2, data, "user"),
                    access_read=(2, 2, "user")).run_inventory(ch, 1)
    assert st.n_blockwrite_ok == 1 and st.n_read_ok == 1
    np.testing.assert_array_equal(st.read_words[0x2B], data)
    np.testing.assert_array_equal(tag.user_bank[32:64], data)


def test_live_tid_read():
    tag = _tag()
    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, access_read=(0, 2, "tid")).run_inventory(ch, 1)
    assert st.n_read_ok == 1
    np.testing.assert_array_equal(st.read_words[0x2B],
                                  tag.tid_bank_bits()[:32])


@pytest.mark.parametrize("m", [2])
def test_live_kill_miller(m):
    """The security sequence rides the generic n-bit reply decode, so it
    works under Miller subcarrier encoding too."""
    cfg = ReaderConfig(miller_m=m, adc_rate=2e6, decim=2)
    tag = _tag(kill_pwd=0x0BAD0DAD)
    ch = SimTagChannel(cfg, [tag], seed=2)
    st = LiveReader(cfg, kill_pwd=0x0BAD0DAD).run_inventory(ch, 2)
    assert st.n_kill_ok == 1 and tag.killed
    assert st.n_epc_correct == 1


# ---- BlockErase / BlockPermalock (Gen2 6.3.2.12.3.8-9) ---------------------

def test_blockerase_blockpermalock_bit_synthesis():
    rng = np.random.default_rng(5)
    h = rng.integers(0, 2, 16)

    eb = gen2.blockerase_bits(h, wordptr=3, wordcount=2)
    mb, wp, wc, hh, ok = gen2.parse_blockerase(eb)
    assert ok and mb == gen2.MEMBANK_USER and (wp, wc) == (3, 2)
    np.testing.assert_array_equal(hh, h)
    bad = eb.copy()
    bad[20] ^= 1
    assert not gen2.parse_blockerase(bad)[4]

    mask = rng.integers(0, 2, 16)
    pb = gen2.blockpermalock_bits(h, read_lock=1, blockptr=0, blockrange=1,
                                  mask=mask)
    mb, rl, bp, br, m, hh, ok = gen2.parse_blockpermalock(pb)
    assert ok and rl == 1 and (bp, br) == (0, 1)
    np.testing.assert_array_equal(m, mask)
    np.testing.assert_array_equal(hh, h)
    # Status-read form carries no mask.
    pb0 = gen2.blockpermalock_bits(h, read_lock=0, blockptr=0)
    mb, rl, bp, br, m, hh, ok = gen2.parse_blockpermalock(pb0)
    assert ok and rl == 0 and m.size == 0
    np.testing.assert_array_equal(hh, h)


def test_live_blockerase_zeroes_user_words():
    tag = _tag()
    tag.user_bank[16:48] = 1                      # words 1-2 all-ones
    ch = SimTagChannel(CFG, [tag], seed=4)
    st = LiveReader(CFG, block_erase=(1, 2),
                    access_read=(1, 2, "user")).run_inventory(ch, 2)
    assert st.n_blockerase_ok == 2
    assert not tag.user_bank[16:48].any()
    # The post-erase Read (same slot, after the erase) sees zeros.
    np.testing.assert_array_equal(st.read_words[0x2B], np.zeros(32))


def test_live_blockpermalock_blocks_future_writes():
    tag = _tag()
    mask = np.zeros(16, dtype=np.int64)
    mask[2] = 1                                   # permalock USER word 2
    ch = SimTagChannel(CFG, [tag], seed=5)
    st = LiveReader(CFG, block_permalock=(0, mask)).run_inventory(ch, 2)
    assert st.n_blockpermalock_ok >= 1
    assert tag.user_permalock[2] == 1
    # A later Write to the permalocked word fails; other words still write.
    ch2 = SimTagChannel(CFG, [tag], seed=6)
    st2 = LiveReader(CFG, access_write=(2, _word(0xBEEF),
                                        "user")).run_inventory(ch2, 1)
    assert st2.n_write_ok == 0
    assert not tag.user_bank[32:48].any()
    ch3 = SimTagChannel(CFG, [tag], seed=7)
    st3 = LiveReader(CFG, access_write=(3, _word(0xBEEF),
                                        "user")).run_inventory(ch3, 1)
    assert st3.n_write_ok == 1
    # BlockErase over a permalocked word is atomic: nothing is erased.
    tag.user_bank[16:32] = 1
    ch4 = SimTagChannel(CFG, [tag], seed=8)
    st4 = LiveReader(CFG, block_erase=(1, 2)).run_inventory(ch4, 1)
    assert st4.n_blockerase_ok == 0
    assert tag.user_bank[16:32].all()


def test_live_blockpermalock_status_read():
    tag = _tag()
    tag.user_permalock[:] = [0, 1, 0, 1, 0, 0, 0, 0]
    ch = SimTagChannel(CFG, [tag], seed=9)
    st = LiveReader(CFG, block_permalock=(0, None)).run_inventory(ch, 1)
    want = np.zeros(16, dtype=np.int64)
    want[:8] = tag.user_permalock
    np.testing.assert_array_equal(st.permalock_status[0x2B], want)
