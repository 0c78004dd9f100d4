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
