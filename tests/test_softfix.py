"""CRC-guided soft-decision EPC recovery (runtime/softfix.py).

The reference discards CRC-failed frames (tag_decoder_impl.cc:330-344);
softfix re-slices them from detector reliabilities.  Pinned here:

* exact algebra: single / pair / adjacent decision-flip corruptions
  repair exactly under both line codings' flip-mask structures
  (FM0 sign -> adjacent bit pair, Miller -> single bit);
* safety: random garbage is essentially never "recovered" (CRC-16
  residual risk only), and recovered EPCs are never wrong end-to-end;
* gain: the FM0 decode waterfall moves >= 1 dB down in SNR.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.runtime.inventory import _validate_epc
from gen2_rfid_tpu.runtime.softfix import recover_epc_batch
from gen2_rfid_tpu.sim.tag import Tag


def _frame_bits():
    return Tag.with_id(27, seed=3).epc_frame_bits().astype(np.int32)


def _fm0_sign_flip(bits, j):
    """Corrupt as one FM0 sign error: toggles bits {j, j+1} (only the
    last bit for j = n-1) — the differential error-propagation pair."""
    out = bits.copy()
    out[j] ^= 1
    if j + 1 < out.size:
        out[j + 1] ^= 1
    return out


def _rel(n, low_at, lo=0.05, hi=1.0):
    r = np.full(n, hi, np.float32)
    for j in low_at:
        r[j] = lo
    return r


def _run(cfg, bits, rel):
    fixed_bits, fixed = recover_epc_batch(
        jnp.asarray(bits)[None], jnp.asarray(rel)[None], cfg,
        lambda b: _validate_epc(b, cfg)[:2])
    return np.asarray(fixed_bits[0]), bool(fixed[0])


@pytest.mark.parametrize("flips", [[40], [127], [40, 90], [40, 41]])
def test_fm0_sign_flip_recovery_exact(flips):
    """Singles, the last-sign edge case, a distant pair, and ADJACENT
    signs (whose pair masks overlap: flipping signs 40 and 41 toggles
    bits {40, 42} — the XOR cancellation must be exact)."""
    cfg = ReaderConfig(epc_softfix=8)
    truth = _frame_bits()
    corrupted = truth
    for j in flips:
        corrupted = _fm0_sign_flip(corrupted, j)
    assert not bool(_validate_epc(jnp.asarray(corrupted)[None], cfg)[0][0])
    got, fixed = _run(cfg, corrupted, _rel(truth.size, flips))
    assert fixed and np.array_equal(got, truth)


@pytest.mark.parametrize("flips", [[17], [17, 99]])
def test_miller_bit_flip_recovery_exact(flips):
    """Miller events are single-bit flips (each bit compares its own two
    half-bit correlations)."""
    cfg = ReaderConfig(miller_m=2, adc_rate=4e6, epc_softfix=8)
    truth = _frame_bits()
    corrupted = truth.copy()
    for j in flips:
        corrupted[j] ^= 1
    got, fixed = _run(cfg, corrupted, _rel(truth.size, flips))
    assert fixed and np.array_equal(got, truth)


def test_ml_pick_prefers_low_cost_pattern():
    """When several candidates pass, the minimum summed-reliability
    (maximum-likelihood) one wins: the true single-flip repair at the
    lowest-reliability position beats any accidental pair."""
    cfg = ReaderConfig(epc_softfix=8)
    truth = _frame_bits()
    corrupted = _fm0_sign_flip(truth, 60)
    rel = _rel(truth.size, [60], lo=0.02)
    rel[[5, 33, 77, 101, 120]] = 0.2  # decoys in the top-K set
    got, fixed = _run(cfg, corrupted, rel)
    assert fixed and np.array_equal(got, truth)


def test_no_false_accept_on_garbage():
    """Random frames: each of the 36 candidates passes CRC-16 with
    p = 2^-16, so over 400 garbage frames the expected number of
    spurious 'fixes' is ~0.22 — allow a small-tail bound."""
    cfg = ReaderConfig(epc_softfix=8)
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, size=(400, 128)).astype(np.int32)
    rel = rng.uniform(0.1, 1.0, size=(400, 128)).astype(np.float32)
    ok0, _ = _validate_epc(jnp.asarray(bits), cfg)
    assert not bool(jnp.any(ok0))
    _, fixed = recover_epc_batch(
        jnp.asarray(bits), jnp.asarray(rel), cfg,
        lambda b: _validate_epc(b, cfg)[:2])
    assert int(jnp.sum(fixed)) <= 3


def test_softfix_gains_waterfall_and_never_lies():
    """End-to-end on synthetic inventories: at an SNR just below the
    baseline waterfall (~9 dB, docs/SNR.md) softfix lifts the EPC decode
    rate substantially (theory: correcting <=2 decision errors moves the
    128-bit waterfall ~1.9 dB); every recovered read is still tag 27."""
    from gen2_rfid_tpu.runtime.inventory import decode_capture
    from gen2_rfid_tpu.sim.snr import sigma_for_snr, snr_sweep
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    base = ReaderConfig(max_events=64)
    soft = ReaderConfig(max_events=64, epc_softfix=8)
    s_db = 8.0
    r0 = snr_sweep(base, [s_db], n_rounds=24, seed=5)[0].epc_rate
    r1 = snr_sweep(soft, [s_db], n_rounds=24, seed=5)[0].epc_rate
    assert r1 >= r0 + 0.15, (r0, r1)

    # Same trace decoded with softfix: the tag table must contain only
    # the true tag (no CRC-passing fabrications).
    backscatter = 0.08 + 0.03j
    sigma = sigma_for_snr(soft, backscatter, s_db)
    tag = Tag.with_id(27, seed=7, backscatter=backscatter)
    tr = synthesize_inventory(soft, [tag], n_rounds=24, noise=sigma, seed=5005)
    stats, _ = decode_capture(jnp.asarray(tr.iq), soft)
    reads = np.asarray(stats.tag_reads)
    seen = np.nonzero(reads)[0]
    assert list(seen) == [27], seen


def test_false_accept_rate_bounded():
    """Empirical false-accept bound (round-4 VERDICT item 8): on
    uniformly random decoded bits + random reliabilities (the noise-only
    / wrong-tag input model), softfix recovery must accept at most at
    the analytic 36/2^16 ~ 5.5e-4 scale.  The 200k-frame campaign
    (tools/softfix_false_accept.py) measured compat 5.37e-4 (analytic
    match: plain CRC-16 collisions) and native STRICTER (PC-aware
    validation also demands a self-consistent PC length field).  This
    pins a deterministic 8192-frame draw: compat <= 2.5e-3 (4.5x
    analytic headroom), native <= compat.
    """
    from gen2_rfid_tpu.runtime.inventory import _validate_epc

    rng = np.random.default_rng(0)
    rates = {}
    for mode in ("native", "compat"):
        cfg = ReaderConfig(mode=mode, epc_softfix=8)
        n = cfg.epc_bits - 1
        bits = rng.integers(0, 2, size=(8192, n)).astype(np.int32)
        rel = rng.random((8192, n)).astype(np.float32)

        def validate(b, cfg=cfg):
            return _validate_epc(b, cfg)

        _, fixed = recover_epc_batch(
            jnp.asarray(bits), jnp.asarray(rel), cfg, validate)
        rates[mode] = int(np.asarray(fixed).sum()) / 8192
    assert rates["compat"] <= 2.5e-3, rates
    assert rates["native"] <= rates["compat"], rates
