"""Closed-loop live reader over the interactive tag channel.

The key property: the tag only backscatters its EPC when the ACK echoes the
exact RN16 it sent, so every successful read proves the decode fed back
into the transmission - the loop the reference only exercises with real
radio hardware (apps/reader.py:82-96) and that batch trace decode cannot
demonstrate.
"""

import numpy as np
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.runtime.live import LiveReader
from gen2_rfid_tpu.sim.channel import SimTagChannel
from gen2_rfid_tpu.sim.tag import Tag


def test_live_single_tag_closed_loop():
    cfg = ReaderConfig()
    ch = SimTagChannel(cfg, [Tag.with_id(27, seed=7)], seed=1)
    st = LiveReader(cfg).run_inventory(ch, n_rounds=5)
    assert st.n_queries == 5
    assert st.n_epc_correct == 5
    assert st.tag_reads[27] == 5
    assert st.cur_round == 6
    assert st.n_no_rn16 == 0


def test_live_multi_tag_q2():
    cfg = ReaderConfig(fixed_q=2)
    tags = [Tag.with_id(i + 1, seed=i, backscatter=0.08 * np.exp(1.3j * i))
            for i in range(3)]
    ch = SimTagChannel(cfg, tags, seed=5)
    st = LiveReader(cfg).run_inventory(ch, n_rounds=6)
    assert st.n_queries == 6 * 4
    # Singleton slots read; every read is a genuine ACK-validated exchange.
    assert st.n_epc_correct >= 6
    got = {t for t in range(256) if st.tag_reads[t] > 0}
    assert got <= {1, 2, 3} and len(got) >= 2


def test_live_wrong_rn16_silences_tag():
    """Corrupt the reader's ACK: the tag must not reply, proving the channel
    enforces the echo (and hence that passing tests exercise the loop)."""
    cfg = ReaderConfig()
    ch = SimTagChannel(cfg, [Tag.with_id(9, seed=3)], seed=2)
    rd = LiveReader(cfg)

    class Tamper:
        def exchange(self, kind, bits, env, cw_us):
            if kind == "ack":
                bits = np.array(bits)
                bits[5] ^= 1          # flip one echoed RN16 bit
            return ch.exchange(kind, bits, env, cw_us)

    st = rd.run_inventory(Tamper(), n_rounds=3)
    assert st.n_epc_correct == 0
    assert st.n_queries == 3
