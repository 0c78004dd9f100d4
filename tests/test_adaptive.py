"""Adaptive-Q inventory + command classification from pulse trains.

The reference ships QueryAdjust synthesis and the Q_UPDN table but pins
FIXED_Q and never adjusts (reader_impl.cc:156-162, global_vars.h:130-133).
The simulator drives the Annex-D Q-algorithm and the batch decoder recovers
the full command schedule (Query/QueryRep/ACK/QueryAdjust) from the PIE
pulse counts alone.
"""

import collections

import numpy as np
import jax.numpy as jnp

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.runtime.inventory import (
    CMD_ACK,
    CMD_QADJ,
    CMD_QREP,
    CMD_QUERY,
    decode_capture,
)
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import synthesize_adaptive_inventory


def _make():
    cfg = ReaderConfig(max_events=128)
    tags = [Tag.with_id(i + 1, seed=i, backscatter=0.08 * np.exp(1j * 1.7 * i))
            for i in range(4)]
    tr = synthesize_adaptive_inventory(cfg, tags, n_slots=24, q_init=1, seed=3)
    return cfg, tr


def test_command_classification_matches_schedule():
    cfg, tr = _make()
    stats, dec = decode_capture(jnp.asarray(tr.iq), cfg)
    truth = collections.Counter(e.kind for e in tr.events)
    cc = np.asarray(stats.cmd_counts)
    assert cc[CMD_QUERY] == truth["query"]
    assert cc[CMD_QREP] == truth["query_rep"]
    assert cc[CMD_ACK] == truth["ack"]
    assert cc[CMD_QADJ] == truth["query_adjust"]
    assert cc[4] == 0 and cc[5] == 0   # no NAKs, nothing unknown


def test_adaptive_trace_decodes_and_classifies():
    cfg, tr = _make()
    stats, _ = decode_capture(jnp.asarray(tr.iq), cfg)
    assert int(stats.n_epc_correct) == tr.expected_epc_pass
    truth = collections.Counter()
    for e in tr.events:
        if e.kind != "ack":
            truth["C" if e.collided else
                  ("S" if e.reply_tag is not None else "E")] += 1
    assert int(stats.n_slot_empty) == truth["E"]
    assert int(stats.n_slot_single) == truth["S"]
    assert int(stats.n_slot_collision) == truth["C"]
    reads = np.asarray(stats.tag_reads)
    for tid, cnt in tr.expected_tag_reads.items():
        assert reads[tid] == cnt
