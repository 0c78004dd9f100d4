"""Unit tests: matched filter, gate detection, sync, FM0 per-stage oracles."""

import numpy as np
import jax.numpy as jnp

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.dsp.filters import (
    boxcar_taps,
    matched_filter_decimate,
    moving_sum,
)
from gen2_rfid_tpu.dsp.gate import gate_detect, gate_detect_scan
from gen2_rfid_tpu.dsp import sync, fm0
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import synthesize_inventory

CFG = ReaderConfig()


def _numpy_fir_decim(x, taps, decim):
    """Oracle: GNU Radio history semantics (ntaps-1 leading zeros)."""
    t = len(taps)
    xp = np.concatenate([np.zeros(t - 1, x.dtype), x])
    n_out = len(x) // decim
    out = np.empty(n_out, dtype=np.complex64)
    for k in range(n_out):
        out[k] = np.dot(xp[k * decim : k * decim + t], taps[::-1])
    return out


def test_matched_filter_matches_oracle():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=503) + 1j * rng.normal(size=503)).astype(np.complex64)
    taps = boxcar_taps(25)
    got = np.asarray(matched_filter_decimate(jnp.asarray(x), taps, 5))
    want = _numpy_fir_decim(x, taps.astype(np.float64), 5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_matched_filter_general_taps():
    rng = np.random.default_rng(1)
    x = (rng.normal(size=260) + 1j * rng.normal(size=260)).astype(np.complex64)
    taps = rng.normal(size=13).astype(np.float32)
    got = np.asarray(matched_filter_decimate(jnp.asarray(x), taps, 4))
    want = _numpy_fir_decim(x, taps.astype(np.float64), 4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_moving_sum_oracle():
    rng = np.random.default_rng(2)
    x = rng.normal(size=300).astype(np.float32)
    got = np.asarray(moving_sum(jnp.asarray(x), 48))
    want = np.array(
        [x[max(0, i - 47) : i + 1].sum() for i in range(300)], dtype=np.float32
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def _decimated_trace(n_rounds=2, seed=11, cfg=CFG, **kw):
    tr = synthesize_inventory(cfg, [Tag.with_id(7, seed=2)], n_rounds=n_rounds,
                              seed=seed, **kw)
    y = matched_filter_decimate(jnp.asarray(tr.iq), boxcar_taps(25), cfg.decim)
    return tr, y


def test_gate_vectorized_matches_exact_scan():
    """The block-parallel gate must produce the exact event set of the
    sequential reference-semantics FSM on in-spec traces."""
    tr, y = _decimated_trace(n_rounds=3)
    ev_vec = gate_detect(y, CFG)
    ev_scan = gate_detect_scan(y, CFG)
    nv, ns = int(ev_vec.n_events), int(ev_scan.n_events)
    assert nv == ns
    iv = np.asarray(ev_vec.index)[np.asarray(ev_vec.valid)]
    isc = np.asarray(ev_scan.index)[np.asarray(ev_scan.valid)]
    np.testing.assert_array_equal(iv, isc)
    np.testing.assert_allclose(
        np.asarray(ev_vec.dc)[np.asarray(ev_vec.valid)],
        np.asarray(ev_scan.dc)[np.asarray(ev_scan.valid)],
        rtol=1e-5, atol=1e-6,
    )


def test_gate_event_count_and_spacing():
    tr, y = _decimated_trace(n_rounds=2)
    ev = gate_detect(y, CFG)
    assert int(ev.n_events) == 4          # 2x (query + ack)
    idx = np.asarray(ev.index)[np.asarray(ev.valid)]
    # Events alternate RN16/EPC windows; consecutive events must be separated
    # by at least the corresponding window.
    gaps = np.diff(idx)
    assert gaps[0] >= CFG.rn16_window and gaps[1] >= CFG.epc_window


def test_sync_finds_preamble_within_search():
    tr, y = _decimated_trace(n_rounds=1)
    ev = gate_detect(y, CFG)
    idx = np.asarray(ev.index)[np.asarray(ev.valid)]
    frame = y[idx[0] : idx[0] + CFG.epc_window] - np.asarray(ev.dc)[0]
    data_index, h = sync.tag_sync(jnp.asarray(frame), CFG)
    # data_index = max_index + 65 with max_index in [0, 15).
    assert 65 <= int(data_index) < 80
    # Channel estimate should be close to the simulated backscatter after the
    # 25-tap boxcar gain (x25).
    assert abs(complex(h)) > 0.5


def test_rn16_decode_matches_truth():
    tr, y = _decimated_trace(n_rounds=2)
    ev = gate_detect(y, CFG)
    idx = np.asarray(ev.index)
    valid = np.asarray(ev.valid)
    # Event 0 is the first Query's RN16 window.
    frame = y[idx[0] : idx[0] + CFG.epc_window] - np.asarray(ev.dc)[0]
    di, h = sync.tag_sync(jnp.asarray(frame), CFG)
    bits = np.asarray(fm0.rn16_detect(jnp.asarray(frame), di, h, CFG))
    truth = tr.events[0].reply_bits
    np.testing.assert_array_equal(bits, truth)


def test_epc_decode_and_period_estimate():
    tr, y = _decimated_trace(n_rounds=1)
    ev = gate_detect(y, CFG)
    idx = np.asarray(ev.index)
    frame = y[idx[1] : idx[1] + CFG.epc_window] - np.asarray(ev.dc)[1]
    magn2 = np.abs(frame) ** 2
    di, h = sync.tag_sync(jnp.asarray(frame), CFG)
    bits, t_half = fm0.epc_detect(
        jnp.asarray(frame), jnp.asarray(magn2.astype(np.float32)), di, h, CFG
    )
    truth = tr.events[1].reply_bits
    np.testing.assert_array_equal(np.asarray(bits), truth)
    assert abs(float(t_half) - 5.0) <= 0.05 + 1e-6


def test_matched_filter_blocked_bitexact():
    """The overlap-save blocked conv (long inputs) must be bit-identical to
    the flat conv: same windows, same op, only the batch layout changes."""
    rng = np.random.default_rng(5)
    x = (rng.normal(size=100000) + 1j * rng.normal(size=100000)).astype(
        np.complex64)
    taps = boxcar_taps(25)
    got_b = np.asarray(
        matched_filter_decimate(jnp.asarray(x), taps, 5, block_out=1024))
    got_f = np.asarray(
        matched_filter_decimate(jnp.asarray(x), taps, 5, block_out=10 ** 9))
    np.testing.assert_array_equal(got_b, got_f)


def test_aligned_diff_frame_end_rebase():
    """Frame-end edge: when the sync index exceeds w - span the whole slice
    rebases to w - span (all real samples) — the reference truncation
    arithmetic mode="compat" pins.  rem must derive from the *clamped*
    start; deriving it from the raw index keeps positions past the frame
    end reading zero padding (round-4 ADVICE regression)."""
    rng = np.random.default_rng(9)
    w = CFG.epc_window
    frame = (rng.normal(size=w) + 1j * rng.normal(size=w)).astype(np.complex64)
    sel = fm0._rn16_selection_matrix(CFG)
    span = sel[1]
    base = np.asarray(fm0._aligned_diff_samples(
        jnp.asarray(frame), jnp.int32(w - span), sel))
    for extra in (1, 3, 5, span // 2):
        got = np.asarray(fm0._aligned_diff_samples(
            jnp.asarray(frame), jnp.int32(w - span + extra), sel))
        np.testing.assert_array_equal(got, base)
    # Interior indices still sample the exact reference positions.
    idx = 37
    got = np.asarray(fm0._aligned_diff_samples(
        jnp.asarray(frame), jnp.int32(idx), sel))
    half = CFG.n_samples_tag_bit / 2.0
    offs = np.round(np.arange(CFG.rn16_half_bits) * half).astype(int)
    want = frame[idx + offs[0::2]] - frame[idx + offs[1::2]]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
