"""Event-table anomaly robustness (VERDICT round-1 item 1).

Decode-window roles come from each event's classified command pulse count
(``command_roles``), the same information source as the reference's
``decoder_status`` branch (tag_decoder_impl.cc:223,291) - NOT from event
rank parity.  A missed, spurious, or unclassifiable gate event must perturb
only its own slot: every downstream slot still decodes exactly.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.dsp.filters import matched_filter_decimate
from gen2_rfid_tpu.dsp.gate import gate_detect
from gen2_rfid_tpu.runtime.inventory import (
    CMD_ACK,
    CMD_NAK,
    CMD_QREP,
    CMD_QUERY,
    CMD_UNKNOWN,
    decode_capture,
    decode_events,
    matched_taps,
    replay_inventory,
    replay_inventory_scan,
)
from gen2_rfid_tpu.runtime.stats import unique_tags
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import synthesize_inventory
from gen2_rfid_tpu.tx.pie import PieEncoder


def _make(n_rounds=8, seed=11, **cfg_kw):
    cfg = ReaderConfig(max_events=64, **cfg_kw)
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)],
                              n_rounds=n_rounds, seed=seed)
    return cfg, tr


def _events(cfg, tr):
    y = matched_filter_decimate(jnp.asarray(tr.iq), matched_taps(cfg), cfg.decim)
    return y, gate_detect(y, cfg)


def _stats(y, events, cfg):
    dec = decode_events(y, events, cfg, specialize=True)
    fast = replay_inventory(dec, cfg)
    scan = replay_inventory_scan(dec, cfg)
    # The vectorized fast path and the exact scan must agree on every
    # anomalous table (fast either handles it or falls back to the scan).
    for name in ("n_queries", "cur_inventory_round", "n_epc_correct",
                 "n_rounds_closed", "terminated"):
        assert int(getattr(fast, name)) == int(getattr(scan, name)), name
    np.testing.assert_array_equal(np.asarray(fast.tag_reads),
                                  np.asarray(scan.tag_reads))
    return fast


def _drop(events, k):
    return events._replace(valid=events.valid.at[k].set(False))


def test_dropped_ack_event_loses_only_its_slot():
    """Gate misses one ACK event: that slot's EPC is lost, every other slot
    (including all downstream) decodes exactly.  Under rank-parity roles this
    flipped the role of every subsequent event (round-1 correctness cliff)."""
    cfg, tr = _make()
    y, events = _events(cfg, tr)
    base = _stats(y, events, cfg)
    assert int(base.n_epc_correct) == 8

    st = _stats(y, _drop(events, 5), cfg)      # event 5 = 3rd slot's ACK
    assert int(st.n_queries) == 8              # all queries still counted
    assert int(st.n_epc_correct) == 7          # only the dropped slot lost
    assert int(np.asarray(st.tag_reads)[27]) == 7
    assert unique_tags(st) == 1


def test_dropped_query_event_keeps_downstream_epcs():
    cfg, tr = _make()
    y, events = _events(cfg, tr)
    st = _stats(y, _drop(events, 4), cfg)      # event 4 = 3rd slot's Query
    assert int(st.n_queries) == 7
    # The orphaned ACK still decodes: its role is intrinsic to the command.
    assert int(st.n_epc_correct) == 8
    assert int(np.asarray(st.tag_reads)[27]) == 8


def test_dropped_pair_and_multiple_drops():
    cfg, tr = _make()
    y, events = _events(cfg, tr)
    ev = _drop(_drop(_drop(events, 2), 3), 9)  # slot 2 entirely + one ACK
    st = _stats(y, ev, cfg)
    assert int(st.n_queries) == 7
    assert int(st.n_epc_correct) == 6
    assert int(np.asarray(st.tag_reads)[27]) == 6


def test_spurious_unknown_event_is_skipped():
    """An injected gate event with an unclassifiable pulse count (noise
    burst) must not disturb any real slot."""
    cfg, tr = _make()
    y, events = _events(cfg, tr)
    base = _stats(y, events, cfg)

    n_ev = int(events.n_events)
    idx = np.asarray(events.index)
    # Place the fake trigger in dead CW between slot 1's EPC window end and
    # slot 2's Query.
    pos = int(idx[1]) + cfg.epc_window + 40
    assert pos < int(idx[2])
    j = n_ev                                   # first unused capacity slot
    ev = events._replace(
        index=events.index.at[j].set(pos),
        valid=events.valid.at[j].set(True),
        n_pulses=events.n_pulses.at[j].set(2),   # matches no command
        noise_var=events.noise_var.at[j].set(events.noise_var[0]),
        dc=events.dc.at[j].set(events.dc[0]),
    )
    order = jnp.argsort(ev.index)
    ev = jax.tree.map(lambda a: a[order] if a.ndim == 1 and a.shape[0] == idx.shape[0] else a, ev)

    st = _stats(y, ev, cfg)
    dec = decode_events(y, ev, cfg, specialize=True)
    assert int(np.asarray(dec.cmd_type)[2]) == CMD_UNKNOWN
    for name in ("n_queries", "n_epc_correct", "cur_inventory_round"):
        assert int(getattr(st, name)) == int(getattr(base, name)), name
    np.testing.assert_array_equal(np.asarray(st.tag_reads),
                                  np.asarray(base.tag_reads))


def test_nak_command_in_capture_is_classified_and_skipped():
    """Splice a real NAK waveform (+ trailing CW) into the capture between
    two slots: the gate triggers on it, classification flags CMD_NAK, the
    replay opens no reply window, and all real slots decode exactly."""
    cfg, tr = _make()
    base, _ = decode_capture(jnp.asarray(tr.iq), cfg)

    enc = PieEncoder(cfg)
    up = int(round(cfg.adc_rate / cfg.dac_rate))
    nak = np.repeat(enc.nak().astype(np.complex64), up)
    cw = np.ones(int(800 * cfg.adc_rate / 1e6), np.complex64)
    # Insert right before the 3rd slot's Query command.
    qpos = [e.cmd_start for e in tr.events if e.kind == "query"][2]
    iq = np.concatenate([tr.iq[:qpos], nak, cw, tr.iq[qpos:]])

    st, dec = decode_capture(jnp.asarray(iq), cfg)
    cmds = np.asarray(dec.cmd_type)[np.asarray(dec.valid)]
    assert (cmds == CMD_NAK).sum() == 1
    assert int(st.n_events) == int(base.n_events) + 1
    for name in ("n_queries", "n_epc_correct", "cur_inventory_round"):
        assert int(getattr(st, name)) == int(getattr(base, name)), name
    np.testing.assert_array_equal(np.asarray(st.tag_reads),
                                  np.asarray(base.tag_reads))


def test_noise_burst_never_corrupts_downstream_slots():
    """A strong in-band noise burst in dead CW may or may not fake a gate
    event; either way every real slot's EPC decode stays exact."""
    cfg, tr = _make(n_rounds=10, seed=5)
    base, _ = decode_capture(jnp.asarray(tr.iq), cfg)
    rng = np.random.default_rng(0)

    iq = tr.iq.copy()
    qpos = [e.cmd_start for e in tr.events if e.kind == "query"][4]
    lo = qpos - int(900 * cfg.adc_rate / 1e6)   # dead CW before the Query
    n_b = int(150 * cfg.adc_rate / 1e6)
    iq[lo:lo + n_b] += (rng.normal(0, 0.6, n_b)
                        + 1j * rng.normal(0, 0.6, n_b)).astype(np.complex64)

    st, _ = decode_capture(jnp.asarray(iq), cfg)
    assert int(st.n_epc_correct) == int(base.n_epc_correct)
    np.testing.assert_array_equal(np.asarray(st.tag_reads),
                                  np.asarray(base.tag_reads))
    # At most the burst itself is mistaken for one command.
    assert int(base.n_queries) <= int(st.n_queries) <= int(base.n_queries) + 1


def test_overflow_falls_back_to_paranoid_decode():
    """A table more role-lopsided than the per-role capacity slack routes to
    the paranoid (both-role) decode via lax.cond, so no event is dropped."""
    cfg, tr = _make(n_rounds=24, seed=9)          # 48 events
    cfg = dataclasses.replace(cfg, max_events=52)  # cap_q = 52//2+1+16 = 43
    y, events = _events(cfg, tr)
    assert int(events.n_events) == 48
    # Force every event to classify as Query: 48 q-role events > cap_q.
    ev = events._replace(n_pulses=jnp.full_like(events.n_pulses, 26))
    dec = decode_events(y, ev, cfg, specialize=True)
    st = replay_inventory_scan(dec, cfg)
    assert int(st.n_queries) == 48
    assert int(st.n_epc_correct) == 0
    # Paranoid decode ran: even the last event (beyond specialized capacity,
    # which would have scatter-dropped it to zeros) carries real decode
    # products.
    valid = np.asarray(dec.valid)
    assert np.asarray(dec.rn16_energy)[valid][-1] > 0
    assert np.asarray(dec.slot_state)[valid][-1] >= 0


def test_max_unique_tags_termination():
    """The gate's second termination limit (gate_impl.cc:101-109): more
    unique tags than max_unique_tags terminates the run."""
    cfg = ReaderConfig(max_events=64, fixed_q=2, max_unique_tags=2)
    tags = [Tag.with_id(10 + i, seed=i,
                        backscatter=0.08 * np.exp(1j * 1.3 * i))
            for i in range(4)]
    tr = synthesize_inventory(cfg, tags, n_rounds=10, seed=21)
    assert len(tr.expected_tag_reads) > 2      # >2 unique tags present
    stats, _ = decode_capture(jnp.asarray(tr.iq), cfg)
    assert bool(stats.terminated)
    # Termination froze the FSM: fewer queries processed than present.
    truth_cmds = sum(1 for e in tr.events if e.kind != "ack")
    assert int(stats.n_queries) < truth_cmds


def test_trigger_compaction_block_phase_invariance():
    """The gate's block-first trigger compaction (dsp/gate.py: <=1 trigger
    per 64-sample block, guaranteed by the T1-quiet spacing) must be exact
    for triggers at every block phase: prepending k decimated samples of CW
    shifts every event index by exactly k, for k sweeping both sides of the
    block boundaries."""
    cfg, tr = _make(n_rounds=3)
    y0, ev0 = _events(cfg, tr)
    base_idx = np.asarray(ev0.index)[np.asarray(ev0.valid)]
    assert base_idx.size >= 6

    iq = np.asarray(tr.iq)
    cw = iq[:1]  # leading CW sample, replicated (constant envelope)
    for k in (1, 62, 63, 64, 65, 96, 127, 128):
        iq_k = np.concatenate([np.repeat(cw, k * cfg.decim), iq])
        y = matched_filter_decimate(jnp.asarray(iq_k), matched_taps(cfg),
                                    cfg.decim)
        ev = gate_detect(y, cfg)
        idx = np.asarray(ev.index)[np.asarray(ev.valid)]
        assert idx.size >= base_idx.size, k
        np.testing.assert_array_equal(idx[-base_idx.size:], base_idx + k,
                                      err_msg=str(k))


def test_empty_captures_decode_to_zero_stats():
    """Edge probes: a pure-CW capture and a pure-noise capture contain no
    commands - the pipeline must report zero events/queries/EPCs and not
    crash (the all-invalid event-table path)."""
    import jax.numpy as jnp

    from gen2_rfid_tpu.runtime.inventory import decode_capture

    cfg = ReaderConfig(max_events=16)
    rng = np.random.default_rng(9)
    n = 400_000
    for label, iq in [
        ("cw", np.full(n, 1.0, np.complex64)),
        ("noise", (rng.normal(0, 0.02, n)
                   + 1j * rng.normal(0, 0.02, n)).astype(np.complex64)),
        ("silence", np.zeros(n, np.complex64)),
    ]:
        stats, dec = decode_capture(jnp.asarray(iq), cfg)
        assert int(stats.n_epc_correct) == 0, label
        assert int(np.asarray(stats.tag_reads).sum()) == 0, label
