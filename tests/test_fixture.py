"""Pinned golden capture fixtures (checked-in SigMF files).

Closes the self-referential-golden hole: `test_golden.py` decodes a trace
the simulator synthesizes at test time, so a *correlated* regression in
simulator + decoder (shared constants, shared chip model) could shift
both and stay green.  These tests pin absolute waveform-level behavior:

1. the decode of a byte-fixed file on disk must reproduce pinned stats
   (decoder drift alone is caught);
2. today's simulator must regenerate that file byte-identically
   (simulator drift alone is caught).

Both drifting *together in a compatible way* would still have to
reproduce the committed bytes — which is the definition of no drift.

Stand-in for the reference's real capture (`misc/data/file_source_test`,
README.md:43-53 — a missing large blob in this mount).
"""

import importlib.util
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from gen2_rfid_tpu.io.sigmf import load_sigmf, save_sigmf
from gen2_rfid_tpu.runtime.inventory import decode_capture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(REPO, "tests", "fixtures")

_spec = importlib.util.spec_from_file_location(
    "make_fixtures", os.path.join(REPO, "tools", "make_fixtures.py"))
make_fixtures = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(make_fixtures)

NAMES = sorted(make_fixtures.fixture_specs().keys())


def _expect(name):
    with open(os.path.join(FIXDIR, name + ".expect.json")) as f:
        return json.load(f)


@pytest.mark.parametrize("name", NAMES)
def test_fixture_file_decodes_to_pinned_stats(name):
    """Decode the committed bytes (incl. their ci16 quantization) — the
    decoder-side absolute pin."""
    cfg = make_fixtures.fixture_specs()[name]["cfg"]
    iq, meta = load_sigmf(os.path.join(FIXDIR, name))
    assert meta["global"]["core:sample_rate"] == float(cfg.adc_rate)
    stats, _ = decode_capture(jnp.asarray(iq), cfg)
    want = _expect(name)
    reads = np.asarray(stats.tag_reads)
    got = {
        "n_queries": int(stats.n_queries),
        "n_epc_correct": int(stats.n_epc_correct),
        "round": int(stats.cur_inventory_round),
        "tag_reads": {str(t): int(reads[t]) for t in np.nonzero(reads)[0]},
    }
    assert got == {k: want[k] for k in got}


@pytest.mark.parametrize("name", NAMES)
def test_simulator_regenerates_fixture_bytes(name):
    """Re-synthesize with today's simulator and compare raw bytes — the
    simulator-side absolute pin.  If this fails after an *intentional*
    waveform change, regenerate via tools/make_fixtures.py and commit the
    new bytes together with the change."""
    cfg, tr = make_fixtures.synthesize(name)
    tmp = os.path.join(FIXDIR, f".regen_{name}")
    try:
        meta_p, data_p = save_sigmf(
            tmp, tr.iq, cfg,
            description=f"gen2_rfid_tpu pinned fixture {name}",
            datatype="ci16_le")
        for suffix in (".sigmf-data", ".sigmf-meta"):
            with open(os.path.join(FIXDIR, name + suffix), "rb") as f:
                want = f.read()
            with open(tmp + suffix, "rb") as f:
                got = f.read()
            assert got == want, f"{name}{suffix} drifted ({len(got)} vs {len(want)} bytes)"
    finally:
        for suffix in (".sigmf-data", ".sigmf-meta"):
            if os.path.exists(tmp + suffix):
                os.remove(tmp + suffix)
