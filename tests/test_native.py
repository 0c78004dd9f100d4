"""Native streaming engine: build, golden decode, JAX cross-validation."""

import numpy as np
import jax.numpy as jnp
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.native.engine import NativeEngine, native_available
from gen2_rfid_tpu.runtime.inventory import decode_capture
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import golden_trace, synthesize_inventory

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)

CFG = ReaderConfig()


def test_native_golden_tuple():
    tr = golden_trace(CFG)
    e = NativeEngine(CFG)
    e.feed(tr.iq)
    st = e.stats()
    assert int(st.n_queries) == 71
    assert int(st.cur_inventory_round) == 72
    assert int(st.n_epc_correct) == 70
    assert int(st.tag_reads[27]) == 70
    assert int(st.n_events) == 142


def test_native_streaming_chunks_equal_oneshot():
    tr = synthesize_inventory(CFG, [Tag.with_id(8, seed=5)], n_rounds=4, seed=17)
    one = NativeEngine(CFG)
    one.feed(tr.iq)
    chunked = NativeEngine(CFG)
    for piece in np.array_split(tr.iq, 11):
        chunked.feed(piece)
    a, b = one.stats(), chunked.stats()
    assert int(a.n_queries) == int(b.n_queries)
    assert int(a.n_epc_correct) == int(b.n_epc_correct)
    np.testing.assert_array_equal(a.tag_reads, b.tag_reads)


def test_native_cross_validates_jax_pipeline():
    """Independent C++ oracle and batched JAX pipeline must agree on stats
    and on gate event positions for a multi-round, multi-tag capture."""
    cfg = ReaderConfig(fixed_q=1)
    tags = [Tag.with_id(3, seed=1), Tag.with_id(77, seed=2)]
    tr = synthesize_inventory(cfg, tags, n_rounds=5, seed=13)
    e = NativeEngine(cfg)
    e.feed(tr.iq)
    st_n = e.stats()
    st_j, dec = decode_capture(jnp.asarray(tr.iq), cfg)
    assert int(st_n.n_queries) == int(st_j.n_queries)
    assert int(st_n.n_epc_correct) == int(st_j.n_epc_correct)
    assert int(st_n.cur_inventory_round) == int(st_j.cur_inventory_round)
    np.testing.assert_array_equal(st_n.tag_reads, np.asarray(st_j.tag_reads))
    ev_j = np.asarray(dec.index)[np.asarray(dec.valid)]
    ev_n = e.events()
    np.testing.assert_array_equal(np.sort(ev_n), np.sort(ev_j))


def test_native_decodes_pr_ask_capture():
    """The C++ engine demodulates |iq| like the gate, so a PR-ASK
    capture (signed baseband, phase reversals at every PIE low) decodes
    identically to DSB — modulation-agnosticism holds for the native
    plane too."""
    cfg = ReaderConfig(tx_mod="pr", tx_shape_us=2.5)
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)],
                              n_rounds=4, seed=11)
    e = NativeEngine(cfg)
    e.feed(tr.iq)
    st = e.stats()
    assert int(st.n_epc_correct) == 4
    assert int(st.tag_reads[27]) == 4


@pytest.mark.parametrize("m,adc,decim,trext", [(2, 2e6, 2, 0), (4, 4e6, 2, 0),
                                               (8, 8e6, 2, 1)])
def test_native_miller_decode(m, adc, decim, trext):
    """The C++ engine demodulates Miller-M too (chip-template sync +
    per-half-bit subcarrier correlation) and agrees with the JAX pipeline
    on a clean capture."""
    cfg = ReaderConfig(miller_m=m, trext=trext, adc_rate=adc, decim=decim)
    tr = synthesize_inventory(cfg, [Tag.with_id(27, seed=7)], n_rounds=3,
                              seed=1)
    e = NativeEngine(cfg)
    e.feed(tr.iq)
    st = e.stats()
    assert int(st.n_queries) == 3
    assert int(st.n_epc_correct) == 3
    assert int(st.tag_reads[27]) == 3
    st_j, _ = decode_capture(jnp.asarray(tr.iq), cfg)
    np.testing.assert_array_equal(st.tag_reads, np.asarray(st_j.tag_reads))
