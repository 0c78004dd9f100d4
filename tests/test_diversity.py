"""Multi-channel (antenna diversity) MRC decode (runtime/diversity.py).

The reference's hardware has two antennas but one RX chain
(apps/reader.py configures a single usrp_source); here C time-aligned RX
channels decode coherently with maximal-ratio combining.  Two-channel
captures are synthesized as the same inventory (same tag seed => same
RN16/EPC draws) through different channel phases with independent noise.
"""

import numpy as np
import jax.numpy as jnp

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.runtime.diversity import decode_capture_mrc
from gen2_rfid_tpu.runtime.inventory import decode_capture
from gen2_rfid_tpu.sim.snr import sigma_for_snr
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import synthesize_inventory

CFG = ReaderConfig(max_events=64)
BS_A = 0.08 * np.exp(0.4j)


def _two_channel(bs_b, noise_sigma, n_rounds):
    tr_a = synthesize_inventory(
        CFG, [Tag.with_id(27, seed=7, backscatter=BS_A)],
        n_rounds=n_rounds, noise=noise_sigma, seed=100)
    tr_b = synthesize_inventory(
        CFG, [Tag.with_id(27, seed=7, backscatter=bs_b)],
        n_rounds=n_rounds, noise=noise_sigma, seed=200)
    assert tr_a.iq.shape == tr_b.iq.shape
    return tr_a, tr_b


def test_mrc_clean_exact():
    tr_a, tr_b = _two_channel(0.08 * np.exp(-1.7j), 0.004, 4)
    st, dec = decode_capture_mrc([tr_a.iq, tr_b.iq], CFG)
    assert int(st.n_epc_correct) == 4
    assert int(np.asarray(st.tag_reads)[27]) == 4


def test_mrc_diversity_gain():
    """At 9 dB per-channel SNR each single channel loses about half its
    frames; the MRC combination (~3 dB array gain) decodes all of them."""
    sig = sigma_for_snr(CFG, BS_A, 9.0)
    tr_a, tr_b = _two_channel(0.08 * np.exp(-1.7j), sig, 12)
    s1, _ = decode_capture(jnp.asarray(tr_a.iq), CFG)
    s2, _ = decode_capture(jnp.asarray(tr_b.iq), CFG)
    sm, _ = decode_capture_mrc([tr_a.iq, tr_b.iq], CFG)
    assert int(s1.n_epc_correct) <= 9
    assert int(s2.n_epc_correct) <= 9
    assert int(sm.n_epc_correct) == 12


def test_mrc_faded_channel_not_harmful():
    """A 20 dB-faded second antenna must not drag the combination below
    the good channel (the statistic weights each channel by its own h)."""
    sig = sigma_for_snr(CFG, BS_A, 12.0)
    tr_a, tr_b = _two_channel(0.008 * np.exp(-1.7j), sig, 8)
    s1, _ = decode_capture(jnp.asarray(tr_a.iq), CFG)
    sm, _ = decode_capture_mrc([tr_a.iq, tr_b.iq], CFG)
    assert int(sm.n_epc_correct) >= int(s1.n_epc_correct)
