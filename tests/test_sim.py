"""Unit tests: tag simulator (FM0 chips, EPC frames, trace structure)."""

import numpy as np

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.protocol.crc import check_crc16
from gen2_rfid_tpu.sim.tag import PREAMBLE_CHIPS, Tag, fm0_chips, miller_chips
from gen2_rfid_tpu.sim.trace import synthesize_inventory


def test_fm0_chip_rules():
    bits = np.array([1, 0, 1, 1, 0])
    chips = fm0_chips(bits, add_dummy=False)
    assert np.array_equal(chips[:12], PREAMBLE_CHIPS)
    data = chips[12:]
    assert data.size == 2 * bits.size
    # Boundary inversion: first chip of each bit flips the previous level.
    prev = PREAMBLE_CHIPS[-1]
    for i, b in enumerate(bits):
        first, second = data[2 * i], data[2 * i + 1]
        assert first == 1 - prev
        assert (second == first) == (b == 1)   # data-1 holds, data-0 flips
        prev = second


def test_fm0_matches_decoder_statistic():
    # The decoder's per-bit sign is the level of the second half-chip; the
    # differential rule (repeat->0, flip->1, prev=+1) must recover the bits.
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 16)
    chips = fm0_chips(bits, add_dummy=True)[12:]
    second = chips[1::2][: bits.size]
    signs = 2 * second - 1
    prev = 1
    out = []
    for s in signs:
        out.append(0 if s == prev else 1)
        prev = s
    assert np.array_equal(np.array(out), bits)


def test_tag_id_placement_and_crc():
    tag = Tag.with_id(27)
    frame = tag.epc_frame_bits()
    assert frame.size == 128
    assert check_crc16(frame)
    assert int("".join(map(str, frame[104:112])), 2) == 27


def test_miller_chips_shape():
    bits = np.array([1, 0, 1])
    for m in (2, 4, 8):
        chips = miller_chips(bits, m, add_dummy=False)
        # (10 preamble bits + 3 data bits) * 2m chips per bit
        assert chips.size == (10 + 3) * 2 * m
        assert set(np.unique(chips)) <= {0, 1}


def test_trace_structure_single_tag():
    cfg = ReaderConfig()
    tr = synthesize_inventory(cfg, [Tag.with_id(5, seed=1)], n_rounds=2, seed=9)
    kinds = [e.kind for e in tr.events]
    assert kinds == ["query", "ack", "query", "ack"]
    assert tr.expected_epc_pass == 2
    assert tr.expected_tag_reads == {5: 2}
    assert tr.iq.dtype == np.complex64
    # Commands appear in order.
    starts = [e.cmd_start for e in tr.events]
    assert starts == sorted(starts)


def test_trace_multi_slot_q1():
    cfg = ReaderConfig(fixed_q=1)
    tr = synthesize_inventory(cfg, [Tag.with_id(5, seed=1)], n_rounds=2, seed=9)
    kinds = [e.kind for e in tr.events]
    # 2 slots per round: query, ack, query_rep, ack, repeated.
    assert kinds == ["query", "ack", "query_rep", "ack"] * 2
