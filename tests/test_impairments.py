"""RF impairment realism: tag BLF error, CFO, amplitude ramp.

The reference re-estimates the EPC symbol period per frame over a +-1%,
20-step grid (tag_decoder_impl.cc:151-169) precisely because real tag BLF
drifts; these tests present off-nominal tags so the estimator's
discriminating behavior is exercised (round-1 VERDICT item 2), and they
document where each stage's tolerance ends:

* EPC decode tracks BLF error across the configured grid span; the grid
  range (not the detector) is the limiting factor - widening
  ``epc_grid_frac``/``epc_grid_steps`` extends the envelope.
* RN16 detection steps at the *nominal* half period (like the reference,
  tag_decoder_impl.cc:237-253): cumulative drift of half a chip over 32
  half-bits bounds its tolerance to ~+-1.5% BLF at the default link.
* The coherent detector projects onto a constant preamble channel estimate,
  so CFO is tolerated only while the phase rotates < ~pi/2 over a frame
  (~70 Hz for a 3.4 ms EPC frame).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.runtime.inventory import CMD_ACK, decode_capture
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import synthesize_inventory


def _decode(cfg, tag, n_rounds=4, seed=13):
    tr = synthesize_inventory(cfg, [tag], n_rounds=n_rounds, seed=seed)
    stats, dec = decode_capture(jnp.asarray(tr.iq), cfg)
    return tr, stats, dec


def _ack_t_half(dec):
    m = np.asarray(dec.valid) & (np.asarray(dec.cmd_type) == CMD_ACK)
    return np.asarray(dec.t_half)[m]


def test_period_estimator_tracks_blf_offset():
    """Off-nominal tags make the energy grid select an off-nominal T; the
    chosen half-period must track the simulated offset and decode exactly."""
    cfg = ReaderConfig(max_events=64)
    half = cfg.n_samples_tag_bit / 2.0
    step = 2 * 0.01 * half / (cfg.epc_grid_steps - 1)
    for off in (-0.008, 0.0, 0.008):
        tag = Tag.with_id(27, seed=7, blf_offset=off)
        tr, stats, dec = _decode(cfg, tag)
        assert int(stats.n_epc_correct) == 4, off
        t_est = _ack_t_half(dec)
        expect = half / (1.0 + off)
        assert np.all(np.abs(t_est - expect) <= step + 1e-3), (off, t_est)


def test_blf_tolerance_limited_by_grid_range():
    """Inside the +-1% default grid EPC decode is exact; beyond it the grid
    (not the detector) fails; widening the grid restores decode."""
    cfg = ReaderConfig(max_events=64)
    for off in (-0.009, 0.009):
        _, stats, _ = _decode(cfg, Tag.with_id(27, seed=7, blf_offset=off))
        assert int(stats.n_epc_correct) == 4, off
    # 2.5% off: outside the reference grid -> every EPC CRC fails.
    _, stats, _ = _decode(cfg, Tag.with_id(27, seed=7, blf_offset=0.025))
    assert int(stats.n_epc_correct) == 0
    # Widen the grid (keeping ~the same candidate pitch): decode returns.
    wide = dataclasses.replace(cfg, epc_grid_frac=0.04, epc_grid_steps=81)
    for off in (-0.03, 0.025):
        _, stats, dec = _decode(wide, Tag.with_id(27, seed=7, blf_offset=off))
        assert int(stats.n_epc_correct) == 4, off
        half = cfg.n_samples_tag_bit / 2.0
        t_est = _ack_t_half(dec)
        assert np.all(np.abs(t_est - half / (1 + off)) < 0.02), (off, t_est)


def test_rn16_nominal_stepping_tolerance():
    """RN16 bits (nominal-step sampling) survive ~1% BLF error but not 3%."""
    cfg = ReaderConfig(max_events=64)

    def rn16_ok(off):
        tr, _, dec = _decode(cfg, Tag.with_id(27, seed=7, blf_offset=off))
        truth = [e.reply_bits for e in tr.events if e.kind != "ack"]
        got = np.asarray(dec.rn16_bits)[np.asarray(dec.valid)][0::2]
        return all(np.array_equal(g, t) for g, t in zip(got, truth))

    assert rn16_ok(0.01)
    assert not rn16_ok(0.03)


def test_cfo_envelope_of_coherent_detector():
    """Constant-h_est coherent detection tolerates slow phase rotation
    (<~pi/2 per EPC frame ~ 70 Hz) and fails far beyond it."""
    cfg = ReaderConfig(max_events=64)
    _, stats, _ = _decode(cfg, Tag.with_id(27, seed=7, cfo_hz=30.0))
    assert int(stats.n_epc_correct) == 4
    _, stats, _ = _decode(cfg, Tag.with_id(27, seed=7, cfo_hz=400.0))
    assert int(stats.n_epc_correct) == 0


def test_amplitude_ramp_decodes_exactly():
    cfg = ReaderConfig(max_events=64)
    _, stats, _ = _decode(cfg, Tag.with_id(27, seed=7, amp_ramp=0.3))
    assert int(stats.n_epc_correct) == 4
    assert int(np.asarray(stats.tag_reads)[27]) == 4


def test_combined_impairments_within_envelope():
    """A realistically imperfect tag - 0.7% fast clock, 20 Hz CFO, 15% ramp
    - still yields an exact inventory."""
    cfg = ReaderConfig(max_events=64)
    tag = Tag.with_id(27, seed=7, blf_offset=0.007, cfo_hz=20.0, amp_ramp=0.15)
    _, stats, _ = _decode(cfg, tag, n_rounds=6)
    assert int(stats.n_epc_correct) == 6
    assert int(np.asarray(stats.tag_reads)[27]) == 6


def test_channel_tracking_extends_cfo_envelope():
    """Decision-directed per-segment h tracking (cfg.track_channel,
    dsp/fm0.py::_track_and_slice) extends the EPC CFO envelope >10x over
    the reference's frozen preamble h_est: exact decode through 800 Hz
    where the untracked detector dies at ~70 Hz."""
    for cfo in (200.0, 800.0):
        cfg = ReaderConfig(max_events=64, track_channel=True)
        _, stats, _ = _decode(cfg, Tag.with_id(27, seed=7, cfo_hz=cfo))
        assert int(stats.n_epc_correct) == 4, cfo
        _, stats_off, _ = _decode(ReaderConfig(max_events=64),
                                  Tag.with_id(27, seed=7, cfo_hz=cfo))
        assert int(stats_off.n_epc_correct) == 0, cfo


def test_channel_tracking_clean_and_combined_exact():
    """Tracking must not cost anything on clean or mildly-impaired tags."""
    cfg = ReaderConfig(max_events=64, track_channel=True)
    _, stats, _ = _decode(cfg, Tag.with_id(27, seed=7))
    assert int(stats.n_epc_correct) == 4
    tag = Tag.with_id(27, seed=7, blf_offset=0.007, cfo_hz=300.0,
                      amp_ramp=0.15)
    _, stats, _ = _decode(cfg, tag, n_rounds=6)
    assert int(stats.n_epc_correct) == 6


def test_channel_tracking_live_closed_loop_cfo():
    """With RN16+EPC tracking the full live loop (the ACK must echo the
    RN16 exactly or the tag goes silent) survives 800 Hz CFO; untracked it
    dies two orders of magnitude earlier."""
    from gen2_rfid_tpu.runtime.live import LiveReader
    from gen2_rfid_tpu.sim.channel import SimTagChannel

    tag = lambda: Tag.with_id(27, seed=7, cfo_hz=800.0)
    st = LiveReader(ReaderConfig(track_channel=True)).run_inventory(
        SimTagChannel(ReaderConfig(track_channel=True), [tag()], seed=1), 4)
    assert st.n_epc_correct == 4
    st_off = LiveReader(ReaderConfig()).run_inventory(
        SimTagChannel(ReaderConfig(), [tag()], seed=1), 4)
    assert st_off.n_epc_correct == 0
