"""Generate the checked-in golden capture fixtures (tests/fixtures/).

The reference repo's only system artifact is a real capture
(`gr-rfid/misc/data/file_source_test`, README.md:43-53) that is a missing
large blob in this mount; these SigMF fixtures are the stand-in: small
committed captures with pinned expected stats, so the decode of a *file
on disk* is pinned across rounds independently of the simulator (a
correlated simulator+decoder drift cannot silently shift both — see
tests/test_fixture.py).

Run from the repo root after any *intentional* waveform change:
    env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/make_fixtures.py
and commit the diff together with the change that caused it.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "fixtures")


def fixture_specs():
    """Fixture name -> (cfg, tags, synth kwargs).  Imported by the tests
    so generation and verification can never drift apart."""
    from gen2_rfid_tpu.config import ReaderConfig
    from gen2_rfid_tpu.sim.tag import Tag

    return {
        "golden_fm0": dict(
            cfg=ReaderConfig(max_events=64),
            tags=[Tag.with_id(27, seed=7)],
            synth=dict(n_rounds=6, corrupt_slots=[3], seed=1234),
        ),
        "miller4_impaired": dict(
            cfg=ReaderConfig(miller_m=4, max_events=64, track_channel=True),
            tags=[Tag.with_id(77, seed=3, blf_offset=0.01, cfo_hz=300.0,
                              amp_ramp=0.1)],
            synth=dict(n_rounds=5, seed=99),
        ),
    }


def synthesize(name: str):
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    spec = fixture_specs()[name]
    tr = synthesize_inventory(spec["cfg"], spec["tags"], **spec["synth"])
    return spec["cfg"], tr


def main() -> int:
    import jax.numpy as jnp
    import numpy as np

    from gen2_rfid_tpu.io.sigmf import save_sigmf
    from gen2_rfid_tpu.runtime.inventory import decode_capture

    os.makedirs(FIXDIR, exist_ok=True)
    for name in fixture_specs():
        cfg, tr = synthesize(name)
        base = os.path.join(FIXDIR, name)
        meta_p, data_p = save_sigmf(
            base, tr.iq, cfg,
            description=f"gen2_rfid_tpu pinned fixture {name}",
            datatype="ci16_le")
        stats, _ = decode_capture(jnp.asarray(tr.iq), cfg)
        reads = np.asarray(stats.tag_reads)
        expect = {
            "n_queries": int(stats.n_queries),
            "n_epc_correct": int(stats.n_epc_correct),
            "round": int(stats.cur_inventory_round),
            "tag_reads": {str(t): int(reads[t]) for t in np.nonzero(reads)[0]},
            "expected_epc_pass": int(tr.expected_epc_pass),
        }
        with open(base + ".expect.json", "w") as f:
            json.dump(expect, f, indent=1, sort_keys=True)
            f.write("\n")
        sz = os.path.getsize(data_p)
        print(f"{name}: {sz/1e6:.2f} MB data, expect {expect}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
