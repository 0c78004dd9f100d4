"""Two-tag RN16 collision recovery (dsp/collision.py, new capability).

The reference loses every collided slot (tag_decoder_impl.cc:366-387: the
collision is only discovered when the EPC CRC fails).  Here a collided RN16
window is separated by successive interference cancellation: decode the
dominant tag, LS-fit + subtract its re-synthesized matched-filtered
waveform, decode the residual.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.dsp.collision import fm0_chip_train, rn16_sic, rn16_sic_batch
from gen2_rfid_tpu.dsp.filters import boxcar_taps, matched_filter_decimate
from gen2_rfid_tpu.sim.tag import Tag, fm0_chips, superpose_reply

CFG = ReaderConfig()


def test_fm0_chip_train_matches_simulator():
    """The closed-form (cumxor) FM0 re-encoder must equal the simulator's
    sequential level recursion for every RN16."""
    rng = np.random.default_rng(1)
    for _ in range(20):
        b = rng.integers(0, 2, 16)
        got = np.asarray(fm0_chip_train(jnp.asarray(b), CFG))
        np.testing.assert_array_equal(got, fm0_chips(b))


def _window(tags, noise=0.0, seed=3):
    """A DC-corrected RN16 decode window with the given tag replies,
    built from the same synthesis primitives as the trace generator."""
    rng = np.random.default_rng(seed)
    sp_us = CFG.adc_rate / 1e6
    n = int(round((CFG.t1_us + CFG.t2_us + CFG.rn16_us) * sp_us)) + 4000
    seg = np.full(n, 1.0, dtype=np.complex64)
    for bits, bs, t1 in tags:
        superpose_reply(seg, fm0_chips(bits), t1, bs, CFG.tag_bit_us / 2,
                        sp_us, CFG.adc_rate)
    x = np.concatenate([np.full(2000, 1.0, np.complex64), seg])
    if noise:
        x = x + (rng.normal(0, noise / 2 ** 0.5, x.size)
                 + 1j * rng.normal(0, noise / 2 ** 0.5, x.size)
                 ).astype(np.complex64)
    y = np.asarray(matched_filter_decimate(jnp.asarray(x), boxcar_taps(25),
                                           CFG.decim))
    dc = y[300:348].mean()
    start = 400 + int(round(252.5 * sp_us)) // 5 - 4
    return jnp.asarray(y[start:start + CFG.rn16_window + 8] - dc)


def test_single_tag_template_exact():
    """On a clean single-tag window the re-synthesized template must be the
    waveform itself: cancellation removes ~all energy (edges land on integer
    ADC samples, so one phase hypothesis is exact)."""
    rng = np.random.default_rng(2)
    b = rng.integers(0, 2, 16)
    r = rn16_sic(_window([(b, 0.08 + 0.03j, 252.5)]), CFG)
    np.testing.assert_array_equal(np.asarray(r.bits1), b)
    assert float(r.cancel_ratio) > 0.999


@pytest.mark.parametrize("t1b", [252.5, 254.0, 256.5])
@pytest.mark.parametrize("ratio", [0.7, 0.4])
def test_two_tag_recovery(ratio, t1b):
    """Both RN16s recover exactly across T1 offsets (including perfectly
    aligned) and amplitude ratios, with noise present."""
    rng = np.random.default_rng(4)
    b1, b2 = rng.integers(0, 2, 16), rng.integers(0, 2, 16)
    bs1 = 0.08 + 0.03j
    bs2 = (0.05 - 0.04j) / abs(0.05 - 0.04j) * abs(bs1) * ratio
    r = rn16_sic(_window([(b1, bs1, 252.5), (b2, bs2, t1b)], noise=0.004),
                 CFG)
    np.testing.assert_array_equal(np.asarray(r.bits1), b1)
    np.testing.assert_array_equal(np.asarray(r.bits2), b2)
    assert float(r.cancel_ratio) > 0.8


def test_equal_aligned_collision_is_degenerate():
    """Equal-amplitude AND identically-timed colliders are physically
    near-indistinguishable (docs/CLASSIFIER.md): SIC documents rather than
    hides this - the capture-decode premise (a dominant tag) is void."""
    rng = np.random.default_rng(5)
    b1, b2 = rng.integers(0, 2, 16), rng.integers(0, 2, 16)
    bs1 = 0.08 + 0.03j
    bs2 = (0.05 - 0.04j) / abs(0.05 - 0.04j) * abs(bs1)
    r = rn16_sic(_window([(b1, bs1, 252.5), (b2, bs2, 252.5)]), CFG)
    got1 = np.array_equal(np.asarray(r.bits1), b1)
    got2 = np.array_equal(np.asarray(r.bits2), b2)
    assert not (got1 and got2)


def test_batched_sic():
    rng = np.random.default_rng(6)
    wins, truth = [], []
    for k in range(4):
        b1, b2 = rng.integers(0, 2, 16), rng.integers(0, 2, 16)
        wins.append(_window([(b1, 0.08 + 0.03j, 252.5),
                             (b2, 0.04 - 0.03j, 254.5)], seed=10 + k))
        truth.append((b1, b2))
    r = rn16_sic_batch(jnp.stack(wins), CFG)
    for k, (b1, b2) in enumerate(truth):
        np.testing.assert_array_equal(np.asarray(r.bits1)[k], b1)
        np.testing.assert_array_equal(np.asarray(r.bits2)[k], b2)


def test_live_sic_capture_inventory():
    """Live closed loop with sic=True: collided slots still read the
    dominant tag's EPC (the ACK carries its exact RN16; the channel's
    capture model answers), and the residual decode surfaces the second
    tag's RN16 - verified against the channel's own per-slot draws."""
    from gen2_rfid_tpu.runtime.live import LiveReader
    from gen2_rfid_tpu.sim.channel import SimTagChannel

    cfg = CFG
    tags = [Tag.with_id(27, seed=7, backscatter=0.08 + 0.03j),
            Tag.with_id(9, seed=3, backscatter=0.04 - 0.03j)]
    ch = SimTagChannel(cfg, tags, seed=1)

    # Record each query's drawn RN16s (q=0: both tags reply every slot).
    drawn = []
    orig = ch.exchange

    def recording(kind, bits, tx, cw_us):
        rx = orig(kind, bits, tx, cw_us)
        if kind in ("query", "query_rep"):
            drawn.append([np.asarray(ts.rn16) for ts in ch.tags
                          if ts.rn16 is not None])
        return rx

    ch.exchange = recording
    st = LiveReader(cfg, sic=True).run_inventory(ch, 4)

    # Every slot physically collided (q=0, two tags), yet the dominant tag
    # was read every round.  The classifier may call a phase-aligned
    # collision "single" (documented envelope, docs/CLASSIFIER.md), so the
    # collision count is a lower bound.
    assert st.n_epc_correct == 4
    assert int(st.tag_reads[27]) == 4
    assert st.n_collision_slots >= 3
    assert st.n_sic_recovered == st.n_collision_slots
    # Each recorded SIC pair is exactly one slot's two drawn RN16s.
    assert len(st.sic_rn16_pairs) == st.n_collision_slots
    want = [frozenset(tuple(int(x) for x in t) for t in pair)
            for pair in drawn if len(pair) == 2]
    for acked, second in st.sic_rn16_pairs:
        got = frozenset(
            (tuple(int(x) for x in acked), tuple(int(x) for x in second)))
        assert got in want
        want.remove(got)


def test_three_tag_joint_sic():
    """rn16_sic_n with joint amplitude re-fit separates THREE superposed
    replies (naive sequential subtraction accumulates template-fit bias
    and fails beyond two): all three RN16s recover exactly across seeds."""
    from gen2_rfid_tpu.dsp.collision import rn16_sic_n

    for seed in range(3):
        rng = np.random.default_rng(100 + seed)
        b = [rng.integers(0, 2, 16) for _ in range(3)]
        win = _window(
            [(b[0], 0.08 + 0.03j, 252.5),
             (b[1], 0.0854 * 0.5 * np.exp(-1.0j), 255.0),
             (b[2], 0.0854 * 0.25 * np.exp(1.9j), 258.0)],
            noise=0.004, seed=200 + seed)
        bits, h, margin, cancel = rn16_sic_n(win, CFG, 3)
        got = {tuple(int(x) for x in r) for r in np.asarray(bits)}
        want = {tuple(int(x) for x in t) for t in b}
        assert want <= got, (seed, got, want)
        assert float(cancel[-1]) > 0.95


def test_batch_pipeline_collision_separation():
    """End-to-end: a synthesized multi-tag inventory's collided slots,
    extracted by the real gate + window pipeline, separate into the exact
    drawn RN16 pairs recorded by the simulator (TraceEvent.collider_bits)."""
    from gen2_rfid_tpu.runtime.inventory import (
        CMD_QREP, CMD_QUERY, decode_capture)
    from gen2_rfid_tpu.runtime.frames import gather_aligned_windows
    from gen2_rfid_tpu.dsp.filters import matched_filter_decimate
    from gen2_rfid_tpu.runtime.inventory import matched_taps
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    cfg = ReaderConfig(max_events=64)
    tags = [Tag.with_id(27, seed=7, backscatter=0.08 + 0.03j),
            Tag.with_id(9, seed=3, backscatter=0.04 - 0.03j)]
    tr = synthesize_inventory(cfg, tags, n_rounds=6, seed=11)
    collided = [e for e in tr.events if e.collided]
    assert len(collided) == 6 and all(e.collider_bits for e in collided)

    _, dec = decode_capture(jnp.asarray(tr.iq), cfg)
    # The i-th query-like decoded event is the i-th query/query_rep trace
    # event (the gate finds every command); select those the ground truth
    # marks collided.  (The slot classifier flags only a subset - jittered
    # near-equal collisions can pass as "single", docs/CLASSIFIER.md - but
    # SIC separation does not depend on the classifier verdict.)
    y = matched_filter_decimate(jnp.asarray(tr.iq), matched_taps(cfg),
                                cfg.decim)
    m = (np.asarray(dec.valid)
         & np.isin(np.asarray(dec.cmd_type), [CMD_QUERY, CMD_QREP]))
    q_starts = np.asarray(dec.index)[m]
    q_trace = [e for e in tr.events if e.kind in ("query", "query_rep")]
    assert q_starts.size == len(q_trace)
    starts = [int(s) for s, e in zip(q_starts, q_trace) if e.collided]
    assert len(starts) == len(collided)
    frames = []
    from gen2_rfid_tpu.dsp.gate import gate_detect
    ev = gate_detect(y, cfg)
    dc = np.asarray(ev.dc)[np.asarray(ev.valid)]
    idx = np.asarray(ev.index)[np.asarray(ev.valid)]
    dc_at = {int(i): complex(d) for i, d in zip(idx, dc)}
    for s0 in starts:
        fr = gather_aligned_windows(y, jnp.asarray([int(s0)]),
                                    cfg.rn16_window)[0]
        frames.append(fr - dc_at[int(s0)])
    r = rn16_sic_batch(jnp.stack(frames), cfg)
    b1 = np.asarray(r.bits1)
    b2 = np.asarray(r.bits2)
    for k, e in enumerate(collided):
        got = {tuple(int(x) for x in b1[k]), tuple(int(x) for x in b2[k])}
        want = {tuple(int(x) for x in bits) for _, bits in e.collider_bits}
        assert got == want, (k, got, want)


def _epc_window(tags, noise=0.004, seed=3):
    """A DC-corrected EPC decode window (ACK reply window) with the given
    (Tag, t1_us) replies superposed — the same synthesis path as _window."""
    rng = np.random.default_rng(seed)
    sp_us = CFG.adc_rate / 1e6
    n = int(round((3 * CFG.t1_us + CFG.t2_us + CFG.epc_us) * sp_us)) + 4000
    seg = np.full(n, 1.0, dtype=np.complex64)
    for tag, t1 in tags:
        superpose_reply(seg, fm0_chips(tag.epc_frame_bits()), t1,
                        tag.backscatter, CFG.tag_bit_us / 2, sp_us,
                        CFG.adc_rate)
    x = np.concatenate([np.full(2000, 1.0, np.complex64), seg])
    x = x + (rng.normal(0, noise / 2 ** 0.5, x.size)
             + 1j * rng.normal(0, noise / 2 ** 0.5, x.size)
             ).astype(np.complex64)
    y = np.asarray(matched_filter_decimate(jnp.asarray(x), boxcar_taps(25),
                                           CFG.decim))
    dc = y[300:348].mean()
    start = 400 + int(round(252.5 * sp_us)) // 5 - 4
    return jnp.asarray(y[start:start + CFG.epc_window + 8] - dc)


def _rand_tag(rng, tid, bs):
    epc = rng.integers(0, 2, 96)
    for k in range(8):
        epc[88 + k] = (tid >> (7 - k)) & 1
    return Tag(epc96=epc, backscatter=bs)


def test_epc_sic_single_tag():
    """On a single-tag EPC window pass 1 decodes exactly (it IS the plain
    EPC decode) and the residual pass's CRC rejects - no false seconds."""
    from gen2_rfid_tpu.dsp.collision import epc_sic

    rng = np.random.default_rng(21)
    t1 = _rand_tag(rng, 0x31, 0.09 + 0.02j)
    r = epc_sic(_epc_window([(t1, 252.5)]), CFG)
    ok = np.asarray(r.crc_ok)
    assert ok[0] and not ok[1]
    np.testing.assert_array_equal(np.asarray(r.bits[0]), t1.epc_frame_bits())
    assert float(r.cancel[0]) > 0.99


@pytest.mark.parametrize("t1b", [252.5, 255.0])
@pytest.mark.parametrize("ratio", [0.7, 0.4, 0.15])
def test_epc_sic_two_frames(ratio, t1b):
    """Both superposed EPC frames recover exactly (CRC-validated) across
    amplitude ratios down to ~7:1, aligned or offset T1 - the same-RN16
    collision case where the reference always loses the slot."""
    from gen2_rfid_tpu.dsp.collision import epc_sic

    rng = np.random.default_rng(22)
    bs1 = 0.09 + 0.02j
    bs2 = (0.05 - 0.04j) / abs(0.05 - 0.04j) * abs(bs1) * ratio
    t1 = _rand_tag(rng, 0x31, bs1)
    t2 = _rand_tag(rng, 0x57, bs2)
    r = epc_sic(_epc_window([(t1, 252.5), (t2, t1b)]), CFG)
    assert np.asarray(r.crc_ok).all()
    np.testing.assert_array_equal(np.asarray(r.bits[0]), t1.epc_frame_bits())
    np.testing.assert_array_equal(np.asarray(r.bits[1]), t2.epc_frame_bits())


def test_live_epc_window_sic_same_rn16():
    """Live closed loop: two tags with identical RN16/slot draws (same
    seed) both match every ACK and answer superposed.  The plain reader
    reads only the dominant tag; with sic=True the EPC-window residual
    self-validates and BOTH tags are inventoried every round."""
    import dataclasses

    from gen2_rfid_tpu.runtime.live import LiveReader
    from gen2_rfid_tpu.sim.channel import SimTagChannel

    rng = np.random.default_rng(23)
    tags = [dataclasses.replace(_rand_tag(rng, 0x31, 0.09 + 0.02j), seed=5),
            dataclasses.replace(_rand_tag(rng, 0x57, 0.035 - 0.04j), seed=5)]

    st = LiveReader(CFG, sic=True).run_inventory(
        SimTagChannel(CFG, tags, seed=1), 3)
    assert st.n_epc_correct == 6
    assert st.n_epc_sic_second == 3
    assert int(st.tag_reads[0x31]) == 3 and int(st.tag_reads[0x57]) == 3

    st2 = LiveReader(CFG, sic=False).run_inventory(
        SimTagChannel(CFG, tags, seed=1), 3)
    assert st2.n_epc_correct == 3
    assert int(st2.tag_reads[0x57]) == 0


def test_batch_epc_sic_recovers_second_tags():
    """Offline capture post-pass (runtime/recovery.py): two same-seed tags
    draw identical slots AND RN16s, so every ACK window holds two
    superposed EPC frames.  The plain pipeline reads only the dominant
    tag; recover_epc_collisions surfaces the second tag's frame in every
    slot, bit-exact against the simulator's ground truth."""
    import jax.numpy as jnp

    from gen2_rfid_tpu.runtime.inventory import decode_capture
    from gen2_rfid_tpu.runtime.recovery import (
        extra_tag_reads, recover_epc_collisions)
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    rng = np.random.default_rng(31)

    def mk(tid, bs, seed):
        epc = rng.integers(0, 2, 96)
        for k in range(8):
            epc[88 + k] = (tid >> (7 - k)) & 1
        return Tag(epc96=epc, seed=seed, backscatter=bs)

    cfg = ReaderConfig(max_events=64)
    tags = [mk(0x41, 0.09 + 0.02j, 5), mk(0x77, 0.04 - 0.035j, 5)]
    tr = synthesize_inventory(cfg, tags, n_rounds=4, seed=12)
    acks = [e for e in tr.events if e.kind == "ack"]
    assert sum(1 for e in acks if e.epc_frames) == 4   # all same-RN16

    st, dec = decode_capture(jnp.asarray(tr.iq), cfg)
    assert int(st.n_epc_correct) == 4                  # dominant tag only
    rec = recover_epc_collisions(tr.iq, dec, cfg)
    assert extra_tag_reads(rec) == {0x77: 4}
    truth = {tuple(int(x) for x in fr)
             for e in acks if e.epc_frames for _, fr in e.epc_frames}
    assert all(tuple(int(x) for x in b) in truth for _, _, b in rec)


def test_batch_epc_sic_no_false_positives():
    """On a single-tag capture the residual pass must recover nothing:
    every residual frame fails CRC (p ~ 2^-16 per window)."""
    import jax.numpy as jnp

    from gen2_rfid_tpu.runtime.inventory import decode_capture
    from gen2_rfid_tpu.runtime.recovery import recover_epc_collisions
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    cfg = ReaderConfig(max_events=64)
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=5,
                              seed=3)
    _, dec = decode_capture(jnp.asarray(tr.iq), cfg)
    assert recover_epc_collisions(tr.iq, dec, cfg) == []


@pytest.mark.parametrize("m,adc", [(2, 2e6), (4, 4e6)])
def test_miller_sic_two_tags(m, adc):
    """SIC generalizes to Miller-M: the closed-form chip re-encoder
    (miller_chip_train) + the rounding-exact pulse bank separate a two-tag
    Miller collision across T1 offsets (incl. aligned)."""
    from gen2_rfid_tpu.dsp.collision import miller_chip_train
    from gen2_rfid_tpu.runtime.inventory import matched_taps
    from gen2_rfid_tpu.sim.tag import miller_chips

    cfg = ReaderConfig(miller_m=m, adc_rate=adc, decim=2, max_events=64)
    rng = np.random.default_rng(7)
    # Closed-form re-encoder equivalence.
    for _ in range(5):
        b = rng.integers(0, 2, 16)
        np.testing.assert_array_equal(
            np.asarray(miller_chip_train(jnp.asarray(b), cfg)),
            miller_chips(b, m))

    sp_us = cfg.adc_rate / 1e6

    def window(tags, noise=0.004):
        n = int(round((cfg.t1_us + cfg.t2_us + cfg.rn16_us) * sp_us)) + 8000
        seg = np.full(n, 1.0, dtype=np.complex64)
        for bits, bs, t1 in tags:
            superpose_reply(seg, miller_chips(bits, m), t1, bs,
                            cfg.tag_bit_us / (2 * m), sp_us, cfg.adc_rate)
        x = np.concatenate([np.full(4000, 1.0, np.complex64), seg])
        x = x + (rng.normal(0, noise / 2 ** 0.5, x.size)
                 + 1j * rng.normal(0, noise / 2 ** 0.5, x.size)
                 ).astype(np.complex64)
        y = np.asarray(matched_filter_decimate(
            jnp.asarray(x), matched_taps(cfg), cfg.decim))
        dc = y[600:700].mean()
        start = (4000 + int(round(252.5 * sp_us))) // cfg.decim - 8
        return jnp.asarray(y[start:start + cfg.rn16_window + 8] - dc)

    b1, b2 = rng.integers(0, 2, 16), rng.integers(0, 2, 16)
    r = rn16_sic(window([(b1, 0.08 + 0.03j, 252.5)]), cfg)
    np.testing.assert_array_equal(np.asarray(r.bits1), b1)
    assert float(r.cancel_ratio) > 0.99
    for t1b in (252.5, 255.0, 258.0):
        r = rn16_sic(window([(b1, 0.08 + 0.03j, 252.5),
                             (b2, 0.045 - 0.035j, t1b)]), cfg)
        np.testing.assert_array_equal(np.asarray(r.bits1), b1)
        np.testing.assert_array_equal(np.asarray(r.bits2), b2)


def test_chip_trains_match_simulator_trext():
    """TRext=1 chip trains (FM0 pilot tone / Miller 16-bit spin-up) match
    the simulator's sequential synthesis bit-for-bit."""
    import dataclasses

    from gen2_rfid_tpu.dsp.collision import chip_train
    from gen2_rfid_tpu.sim.tag import miller_chips

    rng = np.random.default_rng(12)
    b = rng.integers(0, 2, 16)
    cfg = dataclasses.replace(CFG, trext=1)
    np.testing.assert_array_equal(
        np.asarray(chip_train(jnp.asarray(b), cfg)),
        fm0_chips(b, trext=1, pilot_bits=cfg.pilot_tone_bits))
    cfg_m = ReaderConfig(miller_m=2, trext=1, adc_rate=2e6, decim=2)
    np.testing.assert_array_equal(
        np.asarray(chip_train(jnp.asarray(b), cfg_m)),
        miller_chips(b, 2, trext=1))


@pytest.mark.parametrize("m,adc,decim", [(1, 2e6, 5), (2, 2e6, 2)])
def test_live_sic_trext(m, adc, decim):
    """Collision recovery works under TRext=1 (the pilot/spin-up rides the
    template bank): two tags at q=0 collide every slot and the dominant
    tag's EPC is still read via SIC."""
    from gen2_rfid_tpu.runtime.live import LiveReader
    from gen2_rfid_tpu.sim.channel import SimTagChannel
    from gen2_rfid_tpu.sim.tag import Tag

    cfg = ReaderConfig(miller_m=m, trext=1, adc_rate=adc, decim=decim)
    tags = [Tag.with_id(0x31, seed=5, backscatter=0.09 + 0.02j),
            Tag.with_id(0x57, seed=6, backscatter=0.035 - 0.04j)]
    ch = SimTagChannel(cfg, tags, seed=1)
    st = LiveReader(cfg, sic=True).run_inventory(ch, 3)
    assert st.n_epc_correct >= 3
    assert int(st.tag_reads[0x31]) == 3           # dominant tag every slot
    assert st.n_sic_recovered >= 3
