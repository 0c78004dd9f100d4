"""PIE command sniffer (runtime/sniffer.py): the framework decodes the
reader's own command stream from the capture — the protocol-analyzer
surface the reference never needed (it always knows what it transmitted,
tag_decoder_impl.cc:223,291).  The synthesizer's event log is the oracle.
"""

import numpy as np
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.protocol import gen2
from gen2_rfid_tpu.runtime.sniffer import parse_command_bits, sniff_commands
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import (golden_trace, synthesize_adaptive_inventory,
                                     synthesize_inventory)


def _cmds(recs):
    return [r for r in recs if r["name"] != "power_down"]


def test_sniffer_matches_golden_trace_schedule():
    """Every command of the golden capture demodulates: kinds match the
    synthesizer's event log, Query fields match the config, every ACK
    carries the RN16 the tag actually drew, CRC-5 checks."""
    cfg = ReaderConfig()
    tr = golden_trace(cfg)
    recs = _cmds(sniff_commands(tr.iq, cfg))
    assert [r["name"] for r in recs] == [e.kind for e in tr.events]
    rn16 = None
    for r, e in zip(recs, tr.events):
        if r["name"] == "query":
            assert r["crc_ok"] and r["q"] == cfg.fixed_q
            assert r["m"] == cfg.miller_m and r["dr"] == cfg.dr
            assert r["trext"] == cfg.trext
            assert abs(r["tari_us"] - cfg.tari_us) <= 1.0
            assert abs(r["rtcal_us"] - cfg.rtcal_us) <= 1.0
            assert abs(r["trcal_us"] - cfg.trcal_us) <= 1.0
        if r["name"] == "ack":
            assert rn16 is not None
            assert r["rn16"] == "".join(map(str, rn16))
        rn16 = e.reply_bits if e.kind != "ack" else None
        # Command timestamps line up with the synthesizer's sample log.
        assert abs(r["t_s"] * cfg.adc_rate - e.cmd_start) <= 2


def test_sniffer_adaptive_queryadjust_stream():
    """Adaptive-Q traces sniff to the exact command sequence including
    QueryAdjust with the right UpDn direction."""
    cfg = ReaderConfig(fixed_q=2, max_events=128)
    tags = [Tag.with_id(t, seed=i) for i, t in enumerate((9, 27, 77))]
    tr = synthesize_adaptive_inventory(cfg, tags, 40, seed=3)
    recs = _cmds(sniff_commands(tr.iq, cfg))
    assert [r["name"] for r in recs] == [e.kind for e in tr.events]
    qadj = [r for r in recs if r["name"] == "query_adjust"]
    assert qadj and all(r["updn"] in (-1, 0, 1) for r in qadj)
    # Adaptive Query events advertise their (possibly updated) Q.
    assert all(r["crc_ok"] for r in recs if r["name"] == "query")


@pytest.mark.parametrize("m,adc,decim", [(2, 2e6, 2)])
def test_sniffer_reads_miller_query_fields(m, adc, decim):
    cfg = ReaderConfig(miller_m=m, adc_rate=adc, decim=decim, max_events=64)
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=2,
                              seed=1)
    recs = _cmds(sniff_commands(tr.iq, cfg))
    queries = [r for r in recs if r["name"] == "query"]
    assert queries and all(r["m"] == m and r["crc_ok"] for r in queries)


def test_parse_command_bits_access_commands():
    """The bit-level parser recognizes every access/v2 opcode envelope."""
    handle = np.random.default_rng(0).integers(0, 2, 16)
    cases = [
        (gen2.req_rn_bits(handle), "req_rn"),
        (gen2.read_bits(handle, wordptr=2, wordcount=4), "read"),
        (gen2.write_bits(handle, np.ones(16, np.int64)), "write"),
    ]
    for bits, name in cases:
        r = parse_command_bits(bits)
        assert r["name"] == name and r["crc_ok"], (name, r)
        assert r["handle"] == "".join(map(str, handle))
    # Corrupt a CRC bit: still classified, flagged invalid.
    bad = gen2.read_bits(handle).copy()
    bad[-1] ^= 1
    r = parse_command_bits(bad)
    assert r["name"] == "read" and not r["crc_ok"]
    # Garbage stays unknown, never raises.
    assert parse_command_bits(np.ones(7, np.int64))["name"] == "unknown"
    assert parse_command_bits(np.zeros(100, np.int64))["name"] == "unknown"


def test_sniffer_select_nak_and_powerdown_frames():
    """A hand-assembled TX stream (Select, NAK, power-down, Query) sniffs
    back with fields and ordering intact."""
    from gen2_rfid_tpu.tx.pie import PieEncoder

    cfg = ReaderConfig()
    enc = PieEncoder(cfg)
    mask = np.array([1, 0, 1, 1, 0, 1, 0, 1], dtype=np.int64)
    sel = gen2.select_bits(mask, pointer=0x20 + 88)
    cw = np.ones(int(800e-6 * cfg.adc_rate), np.complex64)
    down = np.zeros(int(2000e-6 * cfg.adc_rate), np.complex64)
    wav = np.concatenate([
        cw, enc.select(sel).astype(np.complex64),
        cw, enc.nak().astype(np.complex64),
        cw, down,
        cw, enc.query().astype(np.complex64), cw,
    ])
    recs = sniff_commands(wav, cfg)
    names = [r["name"] for r in recs]
    assert names == ["select", "nak", "power_down", "query"]
    assert recs[0]["mask"] == "10110101" and recs[0]["crc_ok"]
    assert recs[0]["pointer"] == 0x20 + 88
    assert recs[2]["duration_us"] >= 1900
    assert recs[3]["q"] == cfg.fixed_q and recs[3]["crc_ok"]
