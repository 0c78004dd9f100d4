"""Miller-M subcarrier decode (new capability; reference is FM0-only,
global_vars.h:116 pins M=00)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.runtime.inventory import decode_capture
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import synthesize_inventory


@pytest.mark.parametrize(
    "m,adc,decim",
    [(2, 2e6, 2), (2, 2e6, 5), (4, 4e6, 2), (8, 8e6, 2)],
)
def test_miller_decode(m, adc, decim):
    cfg = ReaderConfig(miller_m=m, adc_rate=adc, decim=decim, max_events=64)
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=3, seed=1)
    stats, _ = decode_capture(jnp.asarray(tr.iq), cfg)
    assert int(stats.n_queries) == 3
    assert int(stats.n_epc_correct) == 3
    assert int(stats.tag_reads[27]) == 3


def test_miller_query_m_field():
    """The Query's M field must encode the configured subcarrier mode."""
    from gen2_rfid_tpu.protocol.gen2 import query_bits

    assert list(query_bits(ReaderConfig(miller_m=2))[5:7]) == [0, 1]
    assert list(query_bits(ReaderConfig(miller_m=8))[5:7]) == [1, 1]


def test_miller_rn16_matches_truth():
    cfg = ReaderConfig(miller_m=4, adc_rate=4e6, decim=2, max_events=64)
    tr = synthesize_inventory(cfg, [Tag.with_id(9, seed=3)], n_rounds=2, seed=8)
    _, dec = decode_capture(jnp.asarray(tr.iq), cfg)
    valid = np.asarray(dec.valid)
    rn16 = np.asarray(dec.rn16_bits)[valid]
    queries = [e for e in tr.events if e.kind in ("query", "query_rep")]
    for k, ev in enumerate(queries):
        np.testing.assert_array_equal(rn16[2 * k], ev.reply_bits)


@pytest.mark.parametrize("m,adc,decim", [(1, 2e6, 5), (2, 2e6, 2), (4, 4e6, 2)])
def test_trext_pilot_decode(m, adc, decim):
    """TRext=1: FM0 pilot tone / Miller 16-bit spin-up (reference declares
    PILOT_TONE=12 but never uses it, global_vars.h:104,120)."""
    cfg = ReaderConfig(miller_m=m, trext=1, adc_rate=adc, decim=decim,
                       max_events=64)
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=3, seed=1)
    stats, _ = decode_capture(jnp.asarray(tr.iq), cfg)
    assert int(stats.n_epc_correct) == 3


@pytest.mark.parametrize("m,adc,decim", [(2, 2e6, 2), (4, 4e6, 2)])
def test_miller_channel_tracking_cfo(m, adc, decim):
    """Decision-directed tracking (shared with FM0: fm0._track_and_slice,
    scaled to the Miller +-(m/2)h half-bit swing) keeps the statistic at
    full swing under CFO: exact decode through 1.6 kHz where the frozen
    preamble h_est loses frames from ~100 Hz (the within-bit comparison is
    rotation-invariant but collapses to noise near each pi/2 crossing)."""
    def run(cfo, track):
        cfg = ReaderConfig(miller_m=m, adc_rate=adc, decim=decim,
                           max_events=64, track_channel=track)
        tr = synthesize_inventory(
            cfg, [Tag.with_id(27, seed=7, cfo_hz=cfo)], n_rounds=3, seed=1)
        stats, _ = decode_capture(jnp.asarray(tr.iq), cfg)
        return int(stats.n_epc_correct)

    for cfo in (100.0, 800.0, 1600.0):
        assert run(cfo, True) == 3, cfo
    assert run(800.0, False) == 0
    # Tracking must be free on clean tags.
    assert run(0.0, True) == 3


@pytest.mark.parametrize("m,adc,decim", [(2, 2e6, 2), (8, 8e6, 2)])
def test_miller_blf_offset_tolerance(m, adc, decim):
    """Tag BLF error through +-4% (cfg.miller_grid_frac) decodes exactly
    across M - 4x the FM0 path's reference period grid
    (tag_decoder_impl.cc:151-169; Gen2 table 6.9 allows up to +-4..22%
    tag FT depending on link).  Three mechanisms: period-hypothesis sync
    (miller_sync correlates the preamble against clock-scaled templates -
    at M=8 the ~160-chip preamble smears ~1.6 chips per 1% under a
    nominal-period template), the joint (offset, chip-period) segment
    search (the period axis absorbs intra-segment chip drift, which
    passes half a chip right at +-2% and capped the round-2 pure-offset
    cascade there), and the drift-tracking cascade whose slope clamp is
    centered on the tracked chip-period error (so in-span clock error
    tracks exactly while one corrupted offset measurement cannot launch
    the window off the frame)."""
    def run(off):
        cfg = ReaderConfig(miller_m=m, adc_rate=adc, decim=decim,
                           max_events=64)
        tr = synthesize_inventory(
            cfg, [Tag.with_id(27, seed=7, blf_offset=off)], n_rounds=3,
            seed=5)
        stats, dec = decode_capture(jnp.asarray(tr.iq), cfg)
        # RN16 windows must track the same clock error (truth check).
        valid = np.asarray(dec.valid)
        rn16 = np.asarray(dec.rn16_bits)[valid]
        queries = [e for e in tr.events if e.kind in ("query", "query_rep")]
        for k, ev in enumerate(queries):
            np.testing.assert_array_equal(rn16[2 * k], ev.reply_bits)
        return int(stats.n_epc_correct)

    for off in (-0.04, -0.03, -0.02, -0.0023, 0.01, 0.02, 0.03, 0.04):
        assert run(off) == 3, off


def test_miller_blf_offset_with_cfo_tracking():
    """Clock error and carrier offset compose: the joint segment search
    handles +-3% BLF error while decision-directed channel tracking rides
    an 800 Hz CFO on top (measured envelope; 4% + 1.6 kHz combined is
    past it)."""
    cfg = ReaderConfig(miller_m=4, adc_rate=4e6, decim=2, max_events=64,
                       track_channel=True)
    for off in (0.03, -0.03):
        tr = synthesize_inventory(
            cfg, [Tag.with_id(27, seed=7, blf_offset=off, cfo_hz=800.0)],
            n_rounds=3, seed=1)
        stats, _ = decode_capture(jnp.asarray(tr.iq), cfg)
        assert int(stats.n_epc_correct) == 3, off


def test_miller8_low_chip_rate_offset_lattice():
    """M=8 at decim=1 has d = 3.125 samples/chip, where 0.5-sample offset
    steps would be a coarser-than-0.125-chip lattice (0.16 chip); the
    d < 4 rule drops to 0.25-sample steps (round-4 ADVICE item).  Pins the
    low-d envelope: exact decode at BLF offsets through the grid span."""
    import gen2_rfid_tpu.dsp.miller as miller

    cfg = ReaderConfig(miller_m=8, adc_rate=2e6, decim=1, max_events=64)
    assert cfg.n_samples_chip < 4
    tables, eps, offsets = miller._miller_segment_selection(
        cfg, 16, miller.default_seg_bits(8), 1.5)
    step = float(offsets[1] - offsets[0])
    assert step <= 0.125 * cfg.n_samples_chip + 1e-9
    for off in (0.0, -0.02, 0.02):
        tr = synthesize_inventory(
            cfg, [Tag.with_id(27, seed=7, blf_offset=off)], n_rounds=2,
            seed=3)
        stats, _ = decode_capture(jnp.asarray(tr.iq), cfg)
        assert int(stats.n_epc_correct) == 2, off
