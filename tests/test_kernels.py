"""Pallas kernels vs XLA references (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.dsp.filters import (
    boxcar_taps,
    matched_filter_decimate,
    moving_sum,
    moving_sum_complex,
)
from gen2_rfid_tpu.kernels.gate_front import gate_front, gate_front_for_cfg


@pytest.mark.parametrize("n,block_y", [(40961, 2048), (9999, 512), (2048 * 5, 2048)])
def test_gate_front_matches_xla(n, block_y):
    rng = np.random.default_rng(n)
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    x2 = jnp.asarray(np.stack([x.real, x.imag]).astype(np.float32))
    y2, amp, avg, dc2 = gate_front(x2, 5, 25, 100, 48, block_y=block_y,
                                   interpret=True)
    y_ref = matched_filter_decimate(jnp.asarray(x), boxcar_taps(25), 5)
    amp_ref = jnp.abs(y_ref)
    np.testing.assert_allclose(np.asarray(y2[0]), np.real(y_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(y2[1]), np.imag(y_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(amp), np.asarray(amp_ref), atol=2e-5)
    # Kernel uses shifted adds, XLA path uses blocked cumsum differences:
    # compare with a relative tolerance over f32 summation-order noise.
    np.testing.assert_allclose(
        np.asarray(avg), np.asarray(moving_sum(amp_ref, 100)),
        rtol=2e-5, atol=1e-2,
    )
    dc_ref = moving_sum_complex(y_ref, 48)
    np.testing.assert_allclose(np.asarray(dc2[0]), np.real(dc_ref),
                               rtol=2e-5, atol=1e-2)
    np.testing.assert_allclose(np.asarray(dc2[1]), np.imag(dc_ref),
                               rtol=2e-5, atol=1e-2)


def test_gate_front_for_cfg_shapes():
    cfg = ReaderConfig()
    x2 = jnp.zeros((2, 50000), jnp.float32)
    y2, amp, avg, dc2 = gate_front_for_cfg(x2, cfg, interpret=True)
    assert y2.shape == (2, 10000) and amp.shape == (10000,)
    assert avg.shape == (10000,) and dc2.shape == (2, 10000)


def test_pallas_front_golden_decode():
    """End-to-end: the fused Pallas front-end wired into decode_capture
    (cfg.pallas_front; interpret mode on CPU) reproduces the golden tuple."""
    from gen2_rfid_tpu.runtime.inventory import decode_capture
    from gen2_rfid_tpu.runtime.stats import unique_tags
    from gen2_rfid_tpu.sim.trace import golden_trace

    cfg = ReaderConfig(pallas_front=True)
    tr = golden_trace(cfg)
    stats, _ = decode_capture(jnp.asarray(tr.iq), cfg)
    assert int(stats.n_queries) == 71
    assert int(stats.cur_inventory_round) == 72
    assert int(stats.n_epc_correct) == 70
    assert unique_tags(stats) == 1
    assert int(stats.tag_reads[0x1B]) == 70


def test_gate_stack_flags_match_native():
    """Fused flag-stack kernel vs the exact XLA ops gate_detect native
    runs, on a real synthesized capture (block boundaries land mid-
    command) and on random noise."""
    from gen2_rfid_tpu.dsp.filters import boxcar_taps, matched_filter_decimate
    from gen2_rfid_tpu.kernels.gate_stack import (
        gate_stack_for_cfg,
        native_flags_reference,
    )
    from gen2_rfid_tpu.sim.tag import Tag
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    cfg = ReaderConfig(max_events=64)
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=3,
                              seed=9)
    y = matched_filter_decimate(
        jnp.asarray(tr.iq),
        boxcar_taps(int(cfg.tag_bit_us / 2 * cfg.adc_rate / 1e6)), cfg.decim)
    y2 = jnp.stack([jnp.real(y), jnp.imag(y)])
    got = gate_stack_for_cfg(y2, cfg, block=4096, interpret=True)
    want = native_flags_reference(y, cfg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gate_stack_flags_noise_and_sizes():
    from gen2_rfid_tpu.kernels.gate_stack import (
        gate_stack_flags,
        native_flags_reference,
    )

    cfg = ReaderConfig()
    rng = np.random.default_rng(4)
    for n, block in [(9999, 2048), (40961, 8192)]:
        y = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
        y2 = jnp.asarray(np.stack([y.real, y.imag]).astype(np.float32))
        got = gate_stack_flags(y2, cfg.win_length, cfg.n_samples_pw // 2,
                               cfg.n_samples_t1, cfg.thresh_fraction,
                               block=block, interpret=True)
        want = native_flags_reference(jnp.asarray(y), cfg)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
