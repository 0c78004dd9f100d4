"""Replay FSM: vectorized fast path must equal the exact sequential scan."""

import numpy as np
import jax.numpy as jnp
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.dsp.filters import matched_filter_decimate
from gen2_rfid_tpu.dsp.gate import gate_detect
from gen2_rfid_tpu.runtime.inventory import (
    decode_events,
    matched_taps,
    replay_inventory,
    replay_inventory_scan,
)
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import synthesize_inventory


def _dec(cfg, tr):
    y = matched_filter_decimate(jnp.asarray(tr.iq), matched_taps(cfg), cfg.decim)
    return decode_events(y, gate_detect(y, cfg), cfg)


@pytest.mark.parametrize("q,n_tags,rounds", [(0, 1, 6), (1, 2, 4), (2, 3, 3)])
def test_fast_equals_scan(q, n_tags, rounds):
    cfg = ReaderConfig(fixed_q=q, max_events=64)
    tags = [Tag.with_id(10 + i, seed=i) for i in range(n_tags)]
    tr = synthesize_inventory(cfg, tags, n_rounds=rounds, seed=31 + q)
    dec = _dec(cfg, tr)
    fast = replay_inventory(dec, cfg)
    scan = replay_inventory_scan(dec, cfg)
    for name in ("n_queries", "cur_inventory_round", "cur_slot",
                 "n_epc_correct", "n_rounds_closed", "n_events", "terminated"):
        assert int(getattr(fast, name)) == int(getattr(scan, name)), name
    np.testing.assert_array_equal(np.asarray(fast.tag_reads),
                                  np.asarray(scan.tag_reads))
    np.testing.assert_array_equal(np.asarray(fast.unique_tags_round),
                                  np.asarray(scan.unique_tags_round))


def test_fast_equals_scan_truncated_tail():
    """Trace cut mid-EPC-window: trailing unfit event handled identically."""
    cfg = ReaderConfig(max_events=64)
    tr = synthesize_inventory(cfg, [Tag.with_id(5, seed=2)], n_rounds=4, seed=3)
    cut = tr.iq[: tr.events[-1].cmd_end + 800]
    from gen2_rfid_tpu.sim.trace import SynthesizedTrace

    y = matched_filter_decimate(jnp.asarray(cut), matched_taps(cfg), cfg.decim)
    dec = decode_events(y, gate_detect(y, cfg), cfg)
    fast = replay_inventory(dec, cfg)
    scan = replay_inventory_scan(dec, cfg)
    assert int(fast.n_queries) == int(scan.n_queries)
    assert int(fast.n_epc_correct) == int(scan.n_epc_correct)
    assert int(fast.cur_inventory_round) == int(scan.cur_inventory_round)


def test_fallback_on_termination():
    cfg = ReaderConfig(max_num_queries=5, max_events=64)
    tr = synthesize_inventory(cfg, [Tag.with_id(5, seed=2)], n_rounds=10, seed=3)
    dec = _dec(cfg, tr)
    out = replay_inventory(dec, cfg)          # must route to the exact scan
    scan = replay_inventory_scan(dec, cfg)
    assert bool(out.terminated) and bool(scan.terminated)
    assert int(out.n_queries) == int(scan.n_queries)
    assert int(out.n_epc_correct) == int(scan.n_epc_correct)
