"""Tests: chunked long-capture decode + CLI app."""

import numpy as np
import jax.numpy as jnp
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.apps.reader import main as cli_main
from gen2_rfid_tpu.runtime.inventory import decode_capture
from gen2_rfid_tpu.runtime.stream import StreamDecoder
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import synthesize_inventory

CFG = ReaderConfig()


@pytest.fixture(scope="module")
def trace():
    return synthesize_inventory(CFG, [Tag.with_id(99, seed=6)], n_rounds=10,
                                seed=33)


def test_stream_matches_batch(trace):
    stats_b, _ = decode_capture(jnp.asarray(trace.iq), CFG)
    dec = StreamDecoder(CFG, chunk_adc=200_000, events_per_chunk=64)
    # Feed awkward chunk sizes to exercise re-blocking.
    pieces = np.array_split(trace.iq, 13)
    stats_s, total = dec.decode(iter(pieces))
    assert total == trace.iq.size
    assert int(stats_s.n_queries) == int(stats_b.n_queries)
    assert int(stats_s.n_epc_correct) == int(stats_b.n_epc_correct)
    assert int(stats_s.cur_inventory_round) == int(stats_b.cur_inventory_round)
    np.testing.assert_array_equal(stats_s.tag_reads, np.asarray(stats_b.tag_reads))


def test_stream_chunk_size_invariance(trace):
    outs = []
    for chunk in (150_000, 400_000):
        dec = StreamDecoder(CFG, chunk_adc=chunk, events_per_chunk=64)
        stats, _ = dec.decode(iter([trace.iq]))
        outs.append((int(stats.n_queries), int(stats.n_epc_correct)))
    assert outs[0] == outs[1]


def test_cli_simulate_and_decode(tmp_path, capsys):
    out = str(tmp_path / "cap.bin")
    assert cli_main(["simulate", out, "--rounds", "3", "--tags", "27",
                     "--seed", "5"]) == 0
    assert cli_main(["decode", out]) == 0
    text = capsys.readouterr().out
    assert "| Correctly decoded EPC : 3" in text
    assert "| Tag ID : 1b  Num of reads : 3" in text


def test_cli_golden_roundtrip(tmp_path, capsys):
    out = str(tmp_path / "golden.bin")
    assert cli_main(["golden", out]) == 0
    assert cli_main(["decode", out, "--chunked"]) == 0
    text = capsys.readouterr().out
    assert "| Number of queries/queryreps sent : 71" in text
    assert "| Correctly decoded EPC : 70" in text
    assert "| Tag ID : 1b  Num of reads : 70" in text


def test_stream_checkpoint_resume(tmp_path, trace):
    """Decode half, checkpoint, resume in a fresh decoder: identical stats
    (reference has no checkpoint/resume at all, SURVEY.md section 5)."""
    full = StreamDecoder(CFG, chunk_adc=200_000, events_per_chunk=64)
    stats_full, _ = full.decode(iter([trace.iq]))

    a = StreamDecoder(CFG, chunk_adc=200_000, events_per_chunk=64)
    a.reset()
    half = len(trace.iq) // 2
    a.feed(trace.iq[:half])
    ckpt = str(tmp_path / "stream.npz")
    a.save_checkpoint(ckpt)

    b = StreamDecoder(CFG, chunk_adc=200_000, events_per_chunk=64)
    b.load_checkpoint(ckpt)
    b.feed(trace.iq[half:])
    stats_b, total = b.finish()
    assert total == trace.iq.size
    assert int(stats_b.n_queries) == int(stats_full.n_queries)
    assert int(stats_b.n_epc_correct) == int(stats_full.n_epc_correct)
    np.testing.assert_array_equal(stats_b.tag_reads, stats_full.tag_reads)


def test_merge_stats_multi_capture():
    """merge_stats aggregates independent capture segments: reads and
    queries add, and since each segment's replay restarts its round counter
    at 1 the merged round count is a + b - 1 (continuation semantics)."""
    from gen2_rfid_tpu.runtime.stats import merge_stats, unique_tags

    cfg = ReaderConfig(max_events=64)
    t1 = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=3, seed=1)
    t2 = synthesize_inventory(cfg, [Tag.with_id(9, seed=8)], n_rounds=4, seed=2)
    s1, _ = decode_capture(jnp.asarray(t1.iq), cfg)
    s2, _ = decode_capture(jnp.asarray(t2.iq), cfg)
    m = merge_stats(s1, s2)
    assert int(m.n_epc_correct) == int(s1.n_epc_correct) + int(s2.n_epc_correct)
    assert int(m.n_queries) == int(s1.n_queries) + int(s2.n_queries)
    assert int(m.cur_inventory_round) == (
        int(s1.cur_inventory_round) + int(s2.cur_inventory_round) - 1)
    assert unique_tags(m) == 2
    reads = np.asarray(m.tag_reads)
    assert reads[27] == 3 and reads[9] == 4


def test_cli_decode_multiple_captures(tmp_path, capsys):
    """`decode a.bin b.bin` aggregates one session report via merge_stats."""
    a, b = str(tmp_path / "a.bin"), str(tmp_path / "b.bin")
    cli_main(["simulate", a, "--rounds", "3", "--tags", "27"])
    cli_main(["simulate", b, "--rounds", "4", "--tags", "9", "--seed", "5"])
    capsys.readouterr()
    cli_main(["decode", a, b])
    text = capsys.readouterr().out
    assert "Correctly decoded EPC : 7" in text
    assert "Number of unique tags : 2" in text
    assert "Tag ID : 1b" in text and "Tag ID : 9" in text


def test_cli_live_inventory(capsys):
    """`live` subcommand: the reference's primary (non-DEBUG) mode, against
    the simulated air interface."""
    cli_main(["live", "--rounds", "3", "--tags", "27", "--seed", "1"])
    text = capsys.readouterr().out
    assert "Correctly decoded EPC : 3" in text
    assert "Tag ID : 1b" in text
    assert "Slot latency" in text


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_stream_random_scenario(tmp_path, seed):
    """Streaming fuzz (round 5): random in-spec link scenario
    (test_fuzz._scenario) x random chunk size x random feed split, with a
    mid-stream checkpoint/resume - chunked streaming must equal the batch
    decode exactly (stats + tag reads), at every drawn geometry."""
    from tests.test_fuzz import _scenario
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    cfg, tags, rng = _scenario(300 + seed)
    tr = synthesize_inventory(cfg, tags, n_rounds=3,
                              seed=int(rng.integers(1 << 16)))
    stats_b, _ = decode_capture(jnp.asarray(tr.iq), cfg)

    chunk = int(rng.choice([100_000, 200_000, 350_000]))
    chunk -= chunk % cfg.decim
    n_pieces = int(rng.integers(2, 8))
    pieces = np.array_split(tr.iq, n_pieces)

    a = StreamDecoder(cfg, chunk_adc=chunk, events_per_chunk=64)
    a.reset()
    cut = int(rng.integers(1, n_pieces))
    for p in pieces[:cut]:
        a.feed(p)
    ckpt = str(tmp_path / f"s{seed}.npz")
    a.save_checkpoint(ckpt)
    b = StreamDecoder(cfg, chunk_adc=chunk, events_per_chunk=64)
    b.load_checkpoint(ckpt)
    for p in pieces[cut:]:
        b.feed(p)
    stats_s, total = b.finish()
    assert total == tr.iq.size
    assert int(stats_s.n_queries) == int(stats_b.n_queries), seed
    assert int(stats_s.n_epc_correct) == int(stats_b.n_epc_correct), seed
    np.testing.assert_array_equal(stats_s.tag_reads,
                                  np.asarray(stats_b.tag_reads))
