"""The Miller robustness matrix, as a repeatable script.

Rounds 3-5 repeatedly cite a "24-scenario sweep" (M x BLF-error x
in-channel interferer x CFO) that guided the segment-cascade design
(docs/PERF.md round-4 fix 2: 18/24 exact at 32/M vs 15/24 at 16/M) but
lived in throwaway scripts.  This checks it in: the full matrix

    M in {2, 4, 8}            (adc/decim keeping >=5 samples/chip)
    BLF offset in {-4%, +4%}  (the grid edge)
    interferer in {off, -20 dBc CW at the FM0 link frequency}
    CFO in {0, 300 Hz with channel tracking}

decoded exactly-or-not per cell, CPU-runnable.  Expected failures: the
M=2 + interferer cells, because the Miller-2 subcarrier (M*BLF/2 =
40 kHz) coincides exactly with the interferer tone - the template
integrates it coherently (physics; dense-reader profiles use M=4/8 for
this reason; isolation in docs/PERF.md round-5).  The score
contextualizes rather than gates; the pinned envelopes live in
tests/test_miller.py and tests/test_dense_reader.py.

Run: env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/miller_robustness_sweep.py
One JSON line per cell + a summary line.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


GEOM = {2: (2e6, 2), 4: (4e6, 2), 8: (8e6, 2)}


def main():
    import jax.numpy as jnp

    from gen2_rfid_tpu.config import ReaderConfig
    from gen2_rfid_tpu.runtime.inventory import decode_capture
    from gen2_rfid_tpu.sim.impairments import (RxImpairments,
                                               apply_rx_impairments)
    from gen2_rfid_tpu.sim.tag import Tag
    from gen2_rfid_tpu.sim.trace import synthesize_inventory

    n_rounds = 3
    total = exact = 0
    for m, (adc, decim) in GEOM.items():
        for off in (-0.04, 0.04):
            for interf in (False, True):
                for cfo in (False, True):
                    cfg = ReaderConfig(miller_m=m, adc_rate=adc, decim=decim,
                                       max_events=64,
                                       track_channel=cfo)
                    tag = Tag.with_id(27, seed=7, blf_offset=off,
                                      cfo_hz=300.0 if cfo else 0.0)
                    tr = synthesize_inventory(cfg, [tag], n_rounds=n_rounds,
                                              seed=1)
                    iq = tr.iq
                    if interf:
                        imp = RxImpairments(interferer_dbc=-20.0,
                                            interferer_hz=40e3)
                        iq = apply_rx_impairments(iq, imp, cfg.adc_rate,
                                                  seed=7)
                    stats, _ = decode_capture(jnp.asarray(iq), cfg)
                    reads = int(stats.tag_reads[27])
                    ok = reads == n_rounds
                    total += 1
                    exact += ok
                    print(json.dumps({
                        "m": m, "blf_off": off,
                        "interferer": interf, "cfo_tracked": cfo,
                        "reads": reads, "exact": ok}), flush=True)
    print(json.dumps({"summary": f"{exact}/{total} exact"}), flush=True)


if __name__ == "__main__":
    main()
