"""BLF sweep (40-640 kHz): config-generalized decode (BASELINE.md configs).

The reference pins BLF=40 kHz at compile time (global_vars.h:110); here the
whole sample-domain geometry derives from ReaderConfig, so other link
frequencies decode by picking an ADC rate / decimation that keeps enough
samples per tag bit.
"""

import jax.numpy as jnp
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.runtime.inventory import decode_capture
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import synthesize_inventory


@pytest.mark.parametrize(
    "blf,adc,decim",
    [
        (40e3, 2e6, 5),    # reference operating point
        (80e3, 2e6, 2),
        (160e3, 2e6, 1),
        (320e3, 2e6, 1),
        (640e3, 8e6, 2),
    ],
)
def test_blf_decode(blf, adc, decim):
    cfg = ReaderConfig(blf_hz=blf, adc_rate=adc, decim=decim, max_events=64)
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=3, seed=1)
    stats, _ = decode_capture(jnp.asarray(tr.iq), cfg)
    assert int(stats.n_queries) == 3
    assert int(stats.n_epc_correct) == 3
    assert int(stats.tag_reads[27]) == 3
