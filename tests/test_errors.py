"""Gen2 Annex-I error-specific replies: failed access commands answer
header-1 + ErrorCode + handle + CRC-16 instead of silence.

New capability (the reference never leaves inventory): the reader decodes
the error reply from backscatter, verifies the handle echo + CRC, and
surfaces the code in ``LiveStats.error_counts`` - the LLRP access-op
result-code analogue.  Password failures (Access/Kill wrong half) stay
silent per spec; ``SimTagChannel(error_replies=False)`` models
older silicon that answers nothing.
"""

import numpy as np
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.protocol import gen2
from gen2_rfid_tpu.runtime.live import LiveReader
from gen2_rfid_tpu.sim.channel import SimTagChannel
from gen2_rfid_tpu.sim.tag import Tag

CFG = ReaderConfig()


def _word(v):
    return np.array([int(b) for b in f"{v:016b}"], dtype=np.int64)


def test_error_reply_bit_synthesis():
    h = np.random.default_rng(1).integers(0, 2, 16)
    for name in gen2.ERROR_CODES:
        eb = gen2.error_reply_bits(name, h)
        assert eb.size == gen2.ERROR_REPLY_BITS and eb[0] == 1
        got, hh, ok = gen2.parse_error_reply(eb)
        assert ok and got == name
        np.testing.assert_array_equal(hh, h)
    bad = gen2.error_reply_bits("memory locked", h)
    bad[3] ^= 1
    assert not gen2.parse_error_reply(bad)[2]
    # A success reply (header-0) never parses as an error.
    assert not gen2.parse_error_reply(
        np.concatenate([gen2.write_reply_bits(h),
                        np.zeros(8, np.int64)]))[2]


def test_locked_write_reports_memory_locked():
    # Nonzero access pwd: the tag stays Open (not Secured), so the
    # write-lock actually gates the Write.
    tag = Tag.with_id(0x2B, seed=7, access_pwd=0x11112222)
    tag.apply_lock(gen2.lock_payload(user=(1, 0)))       # write-locked USER
    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, access_write=(3, _word(1), "user")).run_inventory(
        ch, 2)
    assert st.n_write_ok == 0
    assert st.error_counts == {"memory locked": 2}


def test_overrun_read_reports_memory_overrun():
    tag = Tag.with_id(0x2B, seed=7)
    ch = SimTagChannel(CFG, [tag], seed=1)
    # EPC bank is 8 words; read 4 words from word 7 overruns.
    st = LiveReader(CFG, access_read=(7, 4, "epc")).run_inventory(ch, 2)
    assert st.n_read_ok == 0
    assert st.error_counts == {"memory overrun": 2}


def test_unsecured_lock_reports_privileges():
    tag = Tag.with_id(0x2B, seed=7, access_pwd=0x12345678)  # Open, not Secured
    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, lock=gen2.lock_payload(user=(1, 0))).run_inventory(
        ch, 1)
    assert st.n_lock_ok == 0
    assert st.error_counts == {"insufficient privileges": 1}


def test_permalocked_field_reports_memory_locked():
    tag = Tag.with_id(0x2B, seed=7)
    tag.apply_lock(gen2.lock_payload(epc=(1, 1)))        # permalock EPC field
    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, lock=gen2.lock_payload(epc=(0, 0))).run_inventory(
        ch, 1)
    assert st.n_lock_ok == 0
    assert st.error_counts == {"memory locked": 1}


def test_silent_silicon_mode():
    """error_replies=False: the same failure yields no reply at all."""
    tag = Tag.with_id(0x2B, seed=7, access_pwd=0x11112222)
    tag.apply_lock(gen2.lock_payload(user=(1, 0)))
    ch = SimTagChannel(CFG, [tag], seed=1, error_replies=False)
    st = LiveReader(CFG, access_write=(3, _word(1), "user")).run_inventory(
        ch, 2)
    assert st.n_write_ok == 0 and not st.error_counts


def test_success_paths_report_no_errors():
    """A fully-successful access sequence records zero error replies."""
    tag = Tag.with_id(0x2B, seed=7)
    ch = SimTagChannel(CFG, [tag], seed=1)
    st = LiveReader(CFG, access_read=(2, 2, "epc"),
                    access_write=(3, _word(0xBEEF), "user")).run_inventory(
        ch, 2)
    assert st.n_read_ok == 2 and st.n_write_ok == 2
    assert not st.error_counts
