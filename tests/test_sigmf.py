"""SigMF capture interop (io/sigmf.py): the reference's bare float32 I/Q
files carry no metadata (rate/carrier live in script constants,
apps/reader.py:52-61); SigMF pairs make captures self-describing and let
the decoder export its findings as standard annotations."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.io.sigmf import (command_annotations, epc_annotations,
                                    load_sigmf, save_sigmf)
from gen2_rfid_tpu.runtime.inventory import decode_capture
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import synthesize_inventory

CFG = ReaderConfig(max_events=64)


def _trace():
    return synthesize_inventory(CFG, [Tag.with_id(27, seed=7)], n_rounds=3,
                                seed=1)


def test_cf32_roundtrip_bit_exact(tmp_path):
    tr = _trace()
    base = str(tmp_path / "cap")
    meta_p, data_p = save_sigmf(base, tr.iq, CFG, description="test")
    iq, meta = load_sigmf(base + ".sigmf-meta")
    np.testing.assert_array_equal(iq, np.asarray(tr.iq, np.complex64))
    assert meta["global"]["core:sample_rate"] == CFG.adc_rate
    assert meta["captures"][0]["core:frequency"] == CFG.freq_hz
    # The sidecar is plain JSON any SigMF tool can read.
    with open(meta_p) as f:
        assert json.load(f)["global"]["core:datatype"] == "cf32_le"


@pytest.mark.parametrize("dt,tol", [("ci16_le", 1e-4), ("ci8", 2e-2)])
def test_integer_datatypes_decode(dt, tol, tmp_path):
    """Quantized SDR recording formats roundtrip within their LSB and
    still decode exactly (the capture has ~26 dB of margin)."""
    tr = _trace()
    base = str(tmp_path / "cap")
    save_sigmf(base, tr.iq, CFG, datatype=dt)
    iq, _ = load_sigmf(base)
    scale = np.abs(np.asarray(tr.iq)).max()
    assert np.max(np.abs(iq * scale - tr.iq)) <= tol * scale * 2
    stats, _ = decode_capture(jnp.asarray(iq), CFG)
    assert int(stats.n_epc_correct) == 3


def test_annotations_mark_reads_and_commands(tmp_path):
    tr = _trace()
    stats, dec = decode_capture(jnp.asarray(tr.iq), CFG)
    ann = epc_annotations(dec, CFG)
    assert len(ann) == 3
    for a in ann:
        assert a["core:label"] == "EPC " + "0" * 22 + "1b"
        # The annotation span lies inside the capture.
        assert 0 <= a["core:sample_start"] < tr.iq.size
    from gen2_rfid_tpu.runtime.sniffer import sniff_commands

    cmd = command_annotations(sniff_commands(tr.iq, CFG), CFG)
    assert sum(1 for a in cmd if a["core:label"].startswith("query")) == 3
    base = str(tmp_path / "cap")
    save_sigmf(base, tr.iq, CFG, annotations=ann + cmd)
    _, meta = load_sigmf(base)
    assert len(meta["annotations"]) == len(ann) + len(cmd)


def test_unsupported_datatype_raises(tmp_path):
    tr = _trace()
    with pytest.raises(ValueError):
        save_sigmf(str(tmp_path / "x"), tr.iq, CFG, datatype="cf64_le")
