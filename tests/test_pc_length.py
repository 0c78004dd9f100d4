"""PC-driven variable-length EPC decode (new capability: the reference
hard-pins 96-bit EPCs via EPC_BITS=129, global_vars.h:107, and reads ids at
bits[104:112], tag_decoder_impl.cc:317-352; Gen2 6.3.2.1.2.2 makes the EPC
length a per-tag PC field of 0-31 words)."""

import numpy as np

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.protocol.crc import crc16_bits
from gen2_rfid_tpu.protocol.gen2 import parse_epc_frame
from gen2_rfid_tpu.runtime.inventory import (
    check_epc_crc_pc,
    decode_capture,
)
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import synthesize_inventory

# A config whose EPC window fits 8-word (128-bit) EPCs:
# epc_bits = 16 (PC) + 128 + 16 (CRC) + 1 (dummy).
WIDE = ReaderConfig(epc_bits=161)


def _frame(l_words, rng):
    pc = np.zeros(16, dtype=np.int64)
    pc[:5] = [(l_words >> (4 - k)) & 1 for k in range(5)]
    epc = rng.integers(0, 2, 16 * l_words)
    body = np.concatenate([pc, epc])
    return np.concatenate([body, crc16_bits(body)])


def test_check_epc_crc_pc_all_lengths():
    rng = np.random.default_rng(2)
    n_bits = WIDE.epc_data_bits            # 160
    for l in (0, 1, 2, 6, 8):
        fr = _frame(l, rng)
        padded = np.zeros(n_bits, dtype=np.int64)
        padded[: fr.size] = fr
        padded[fr.size:] = rng.integers(0, 2, n_bits - fr.size)  # garbage tail
        ok, tid, lw = check_epc_crc_pc(padded[None])
        assert bool(ok[0]), l
        assert int(lw[0]) == l
        want_tid = int("".join(map(str, fr[-24:-16])), 2)
        assert int(tid[0]) == want_tid
        # Host parser agrees.
        pok, pl, ptid = parse_epc_frame(padded)
        assert pok and pl == l and ptid == want_tid
        # Any corrupted frame bit fails.
        bad = padded.copy()
        bad[min(20, fr.size - 1)] ^= 1
        assert not bool(check_epc_crc_pc(bad[None])[0][0])


def test_pc_length_exceeding_window_fails():
    rng = np.random.default_rng(3)
    n_bits = 128                            # default config: l_max = 6
    padded = rng.integers(0, 2, n_bits)
    padded[:5] = [0, 1, 0, 1, 0]            # L = 10 > 6: not decodable
    ok, _, lw = check_epc_crc_pc(padded[None])
    assert int(lw[0]) == 10 and not bool(ok[0])


def test_mixed_length_population_batch_decode():
    """One capture, three tags with 32/96/128-bit EPCs: the PC-aware native
    decode reads all three with correct per-length ids."""
    tags = [
        Tag.with_id(0x21, n_words=2, seed=3, backscatter=0.08 + 0.03j),
        Tag.with_id(0x66, n_words=6, seed=4, backscatter=0.07 - 0.04j),
        Tag.with_id(0x88, n_words=8, seed=5, backscatter=0.05 + 0.06j),
    ]
    cfg = ReaderConfig(epc_bits=161, fixed_q=2, max_events=128)
    tr = synthesize_inventory(cfg, tags, n_rounds=6, seed=11)
    stats, dec = decode_capture(tr.iq, cfg)
    assert int(stats.n_epc_correct) == tr.expected_epc_pass
    reads = np.asarray(stats.tag_reads)
    for tid, want in tr.expected_tag_reads.items():
        assert reads[tid] == want, (hex(tid), reads[tid], want)


def test_mixed_length_exact_gate_agrees():
    tags = [Tag.with_id(0x21, n_words=2, seed=3),
            Tag.with_id(0x88, n_words=8, seed=5, backscatter=0.05 + 0.06j)]
    cfg = ReaderConfig(epc_bits=161, fixed_q=1, max_events=64)
    tr = synthesize_inventory(cfg, tags, n_rounds=4, seed=12)
    s1, _ = decode_capture(tr.iq, cfg)
    s2, _ = decode_capture(tr.iq, cfg, exact_gate=True)
    assert int(s1.n_epc_correct) == int(s2.n_epc_correct) == tr.expected_epc_pass


def test_default_config_still_reads_short_epc():
    """Even the default (96-bit-max) window decodes SHORTER EPCs natively -
    the window is an upper bound, the PC field sets the frame."""
    tag = Tag.with_id(0x42, n_words=2, seed=7)
    cfg = ReaderConfig()
    tr = synthesize_inventory(cfg, [tag], n_rounds=3, seed=13)
    stats, _ = decode_capture(tr.iq, cfg)
    assert int(stats.n_epc_correct) == 3
    assert int(np.asarray(stats.tag_reads)[0x42]) == 3


def test_compat_mode_pins_reference_behavior():
    """compat rejects non-96-bit frames (the reference's fixed-length check
    fails their CRC position) - reproducing its limitation exactly."""
    tag = Tag.with_id(0x42, n_words=2, seed=7)
    cfg = ReaderConfig(mode="compat")
    tr = synthesize_inventory(cfg, [tag], n_rounds=2, seed=14)
    stats, _ = decode_capture(tr.iq, cfg)
    assert int(stats.n_epc_correct) == 0


def test_live_reader_variable_length():
    from gen2_rfid_tpu.runtime.live import LiveReader
    from gen2_rfid_tpu.sim.channel import SimTagChannel

    cfg = ReaderConfig(epc_bits=161)
    tags = [Tag.with_id(0x77, n_words=8, seed=9)]
    st = LiveReader(cfg).run_inventory(SimTagChannel(cfg, tags, seed=2), 3)
    assert st.n_epc_correct == 3
    assert st.tag_reads[0x77] == 3


def test_native_engine_variable_length():
    """The C++ streaming engine applies the same PC-driven validation -
    oracle parity with the JAX pipeline on a mixed-length population."""
    import pytest

    from gen2_rfid_tpu.native.engine import NativeEngine, native_available

    if not native_available():
        pytest.skip("no native toolchain")
    tags = [Tag.with_id(0x21, n_words=2, seed=3),
            Tag.with_id(0x88, n_words=8, seed=5, backscatter=0.05 + 0.06j)]
    cfg = ReaderConfig(epc_bits=161, fixed_q=1, max_events=64)
    tr = synthesize_inventory(cfg, tags, n_rounds=4, seed=12)
    eng = NativeEngine(cfg)
    eng.feed(tr.iq)
    st = eng.stats()
    reads = np.asarray(st.tag_reads)
    assert int(st.n_epc_correct) == tr.expected_epc_pass
    for tid, want in tr.expected_tag_reads.items():
        assert reads[tid] == want


def test_tag_report_records_epc_hex():
    """Per-read JSON tag reports carry the full PC-length-aware EPC hex."""
    from gen2_rfid_tpu.runtime.stats import tag_report_records

    tags = [Tag.with_id(0x21, n_words=2, seed=3),
            Tag.with_id(0x88, n_words=8, seed=5, backscatter=0.05 + 0.06j)]
    cfg = ReaderConfig(epc_bits=161, fixed_q=1, max_events=64)
    tr = synthesize_inventory(cfg, tags, n_rounds=3, seed=15)
    _, dec = decode_capture(tr.iq, cfg)
    recs = tag_report_records(dec, cfg, freq_hz=915e6)
    assert len(recs) == tr.expected_epc_pass
    by_id = {}
    for r in recs:
        by_id.setdefault(r["tag_id"], r)
        assert r["channel_mhz"] == 915.0
        assert len(r["epc"]) == 4 * r["epc_words"]
        assert r["rssi_dbfs"] > -30
    assert by_id[0x21]["epc"] == "00000021"       # 2 words = 8 nibbles
    assert by_id[0x88]["epc"].endswith("88") and by_id[0x88]["epc_words"] == 8
    # times strictly increase per tag
    t_all = [r["time_s"] for r in recs]
    assert t_all == sorted(t_all)
