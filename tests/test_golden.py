"""End-to-end golden-trace test: the README tuple must reproduce.

The reference's only system test is the offline run on file_source_test
(README.md:43-53, a missing blob here): 71 queries sent, final inventory
round 72, 70 correctly decoded EPCs, 1 unique tag, tag ID 27.  The simulator
regenerates an equivalent capture and the batch decoder must produce exactly
that tuple.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.runtime.inventory import decode_capture
from gen2_rfid_tpu.runtime.stats import format_results, unique_tags
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import golden_trace, synthesize_inventory


@pytest.fixture(scope="module")
def golden():
    cfg = ReaderConfig()
    tr = golden_trace(cfg)
    stats, dec = decode_capture(jnp.asarray(tr.iq), cfg)
    return cfg, tr, stats, dec


def test_golden_tuple(golden):
    cfg, tr, stats, dec = golden
    assert int(stats.n_queries) == 71
    assert int(stats.cur_inventory_round) == 72
    assert int(stats.n_epc_correct) == 70
    assert unique_tags(stats) == 1
    assert int(stats.tag_reads[27]) == 70


def test_golden_report_format(golden):
    _, _, stats, _ = golden
    text = format_results(stats)
    assert "| Number of queries/queryreps sent : 71" in text
    assert "| Current Inventory round : 72" in text
    assert "| Correctly decoded EPC : 70" in text
    assert "| Number of unique tags : 1" in text
    assert "| Tag ID : 1b  Num of reads : 70" in text


def test_golden_decoded_rn16s_match_truth(golden):
    cfg, tr, stats, dec = golden
    valid = np.asarray(dec.valid)
    idx = np.asarray(dec.index)[valid]
    rn16 = np.asarray(dec.rn16_bits)[valid]
    queries = [e for e in tr.events if e.kind in ("query", "query_rep")]
    assert len(queries) == 71
    for k, ev in enumerate(queries):
        np.testing.assert_array_equal(rn16[2 * k], ev.reply_bits)


def test_exact_gate_agrees_end_to_end(golden):
    cfg, tr, stats, _ = golden
    stats2, _ = decode_capture(jnp.asarray(tr.iq), cfg, exact_gate=True)
    assert int(stats2.n_queries) == int(stats.n_queries)
    assert int(stats2.n_epc_correct) == int(stats.n_epc_correct)
    np.testing.assert_array_equal(
        np.asarray(stats2.tag_reads), np.asarray(stats.tag_reads)
    )


def test_multi_tag_q2_inventory():
    """FIXED_Q=2 slotted rounds with 3 tags: singleton slots decode, empty
    and collided slots fail CRC, stats add up."""
    cfg = ReaderConfig(fixed_q=2)
    tags = [Tag.with_id(i + 1, seed=i, backscatter=0.08 + 0.02j) for i in range(3)]
    tr = synthesize_inventory(cfg, tags, n_rounds=6, seed=5)
    stats, dec = decode_capture(jnp.asarray(tr.iq), cfg)
    assert int(stats.n_queries) == 6 * 4
    assert int(stats.n_epc_correct) == tr.expected_epc_pass
    reads = np.asarray(stats.tag_reads)
    for tid, cnt in tr.expected_tag_reads.items():
        assert reads[tid] == cnt
    assert int(stats.cur_inventory_round) == 7


def test_termination_limit_queries():
    """gate_impl.cc:101-109: stop once n_queries exceeds MAX_NUM_QUERIES."""
    cfg = ReaderConfig(max_num_queries=10)
    tr = synthesize_inventory(cfg, [Tag.with_id(9, seed=3)], n_rounds=15, seed=8)
    stats, _ = decode_capture(jnp.asarray(tr.iq), cfg)
    assert bool(stats.terminated)
    assert int(stats.n_queries) <= 12


def test_golden_compat_mode():
    """compat mode (reference-pinned arithmetic + paranoid both-role decode)
    must reproduce the golden tuple too."""
    cfg = ReaderConfig(mode="compat")
    tr = golden_trace(cfg)
    stats, _ = decode_capture(jnp.asarray(tr.iq), cfg)
    assert int(stats.n_queries) == 71
    assert int(stats.n_epc_correct) == 70
    assert int(stats.tag_reads[27]) == 70
