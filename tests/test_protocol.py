"""Unit tests: CRC-5/CRC-16 and Gen2 command bit synthesis."""

import numpy as np
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.protocol import gen2
from gen2_rfid_tpu.protocol.crc import (
    check_crc16,
    crc5_append,
    crc16_affine,
    crc16_bits,
)


def test_crc16_known_vector():
    # CRC-16/CCITT-FALSE of ASCII "123456789" is 0x29B1; the reference's
    # check (init 0xFFFF, poly 0x1021, final ~) verifies the complemented
    # value appended, so build the frame accordingly.
    data = np.unpackbits(np.frombuffer(b"123456789", np.uint8)).astype(np.int64)
    crc = crc16_bits(data)
    val = int("".join(map(str, crc)), 2)
    assert val == (~0x29B1) & 0xFFFF


def test_crc16_roundtrip_property():
    rng = np.random.default_rng(0)
    for _ in range(20):
        data = rng.integers(0, 2, 112)
        frame = np.concatenate([data, crc16_bits(data)])
        assert check_crc16(frame)
        bad = frame.copy()
        bad[rng.integers(0, 128)] ^= 1
        assert not check_crc16(bad)


def test_crc16_affine_matches_serial():
    m, c0 = crc16_affine(112)
    rng = np.random.default_rng(1)
    for _ in range(10):
        d = rng.integers(0, 2, 112)
        affine = (m.astype(np.int64) @ d) % 2 ^ c0
        assert np.array_equal(affine, crc16_bits(d))


def test_crc5_self_check():
    # Gen2 CRC-5 property: shifting the appended CRC back through the
    # register yields zero residue -> re-computing over data+crc gives 0.
    cfg = ReaderConfig()
    q = gen2.query_bits(cfg)
    assert q.size == 22
    # Residue check: run the LFSR over all 22 bits with zero-append.
    reg = [1, 0, 0, 1, 0]  # x^0..x^4 coefficients of init 01001
    for b in q:
        fb = reg[4] ^ int(b)
        reg = [fb, reg[0], reg[1], reg[2] ^ fb, reg[3]]
    assert reg == [0, 0, 0, 0, 0]


def test_query_bits_layout():
    cfg = ReaderConfig(fixed_q=3)
    q = gen2.query_bits(cfg)
    assert list(q[:4]) == [1, 0, 0, 0]          # Query code
    assert q[4] == 0                            # DR
    assert list(q[5:7]) == [0, 0]               # M = FM0
    assert list(q[13:17]) == [0, 0, 1, 1]       # Q=3
    cfg_m4 = ReaderConfig(miller_m=4)
    assert list(gen2.query_bits(cfg_m4)[5:7]) == [1, 0]


def test_ack_and_others():
    rn16 = np.arange(16) % 2
    a = gen2.ack_bits(rn16)
    assert list(a[:2]) == [0, 1] and a.size == 18
    assert list(gen2.nak_bits()) == [1, 1, 0, 0, 0, 0, 0, 0]
    cfg = ReaderConfig()
    assert list(gen2.query_rep_bits(cfg)) == [0, 0, 0, 0]
    qa = gen2.query_adjust_bits(cfg, updn=1)
    assert list(qa[:4]) == [1, 0, 0, 1] and list(qa[6:]) == [1, 1, 0]


def test_derived_sample_counts():
    """The section-2.4 derived numbers from SURVEY.md must hold exactly."""
    cfg = ReaderConfig()
    assert cfg.sample_rate == 400e3
    assert cfg.n_samples_tag_bit == 10.0
    assert cfg.n_samples_t1 == 96
    assert cfg.n_samples_pw == 4          # int(4.8): truncation preserved
    assert cfg.win_length == 100
    assert cfg.dc_length == 48
    assert cfg.rn16_window == 250
    # Native sizes the EPC window for the slowest tag the +-1% period grid
    # can estimate (1350 * 1.01 -> 1364, + 20 slack); compat pins the
    # reference's 1370 (gate_impl.cc:115).
    assert cfg.epc_window == 1384
    assert cfg.sync_search == 20          # native: full slack coverage
    compat = ReaderConfig(mode="compat")
    assert compat.rn16_window == 250 and compat.epc_window == 1370
    assert compat.sync_search == 15       # reference-pinned
    assert cfg.n_cwquery_tx == 1295
    assert cfg.n_cwack_tx == 4575
    assert cfg.n_data0_tx == 24 and cfg.n_data1_tx == 48
