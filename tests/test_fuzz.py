"""Property-based roundtrip fuzz: random in-spec link configs must decode.

The reference supports exactly one operating point (Tari 24 us, DR=8,
BLF 40 kHz, FM0, TRext=0, Q=0, 96-bit EPC - all compile-time constants,
global_vars.h:69-143).  This framework derives the whole geometry from
``ReaderConfig``; these tests sample that space at random - encoding
(FM0/Miller-M), TRext, Tari within its spec interval for the drawn
BLF/DR, Q, population size, per-tag EPC length, backscatter phase/power,
and mild real-world impairments (BLF offset, CFO, amplitude ramp) - and
require the closed-loop synthesize -> batch-decode roundtrip to be exact
(every expected EPC pass decodes, none invented).

Each case is reproducible from its seed; the synthesizer's own
``expected_epc_pass`` (which accounts for collisions) is the oracle.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from gen2_rfid_tpu.config import ReaderConfig
from gen2_rfid_tpu.runtime.inventory import decode_capture
from gen2_rfid_tpu.sim.tag import Tag
from gen2_rfid_tpu.sim.trace import synthesize_inventory

# Known-good sample-rate lattice per encoding (>= ~5 samples per chip);
# everything else about the scenario is drawn continuously.
_GEOM = [
    # (miller_m, adc_rate, decim, blf_hz, dr)
    (1, 2e6, 5, 40e3, 0),          # the reference operating point family
    (1, 2e6, 2, 80e3, 0),
    (1, 2e6, 1, 160e3, 1),         # DR=64/3 ratio
    (2, 2e6, 2, 40e3, 0),
    (4, 4e6, 2, 40e3, 0),
    (8, 8e6, 2, 40e3, 0),
]


def _scenario(seed: int):
    rng = np.random.default_rng(1000 + seed)
    m, adc, decim, blf, dr = _GEOM[int(rng.integers(len(_GEOM)))]
    # Tari uniform inside its spec-valid interval for this BLF/DR
    # (1.1*RTcal <= TRcal <= 3*RTcal with RTcal = 3*Tari, Gen2 6.3.1.2).
    trcal = (8.0 if dr == 0 else 64.0 / 3.0) / blf * 1e6
    lo = max(6.25, trcal / 9.0 * 1.001)
    hi = min(25.0, trcal / 3.3 * 0.999)
    tari = float(rng.uniform(lo, hi))
    trext = int(rng.integers(2))
    q = int(rng.integers(3))
    # Round-3 knobs ride along: CRC-guided soft recovery must never
    # change an exact in-spec roundtrip (it only touches frames that
    # FAILED validation), and Gaussian TX shaping must not cost the gate
    # or decode anything (sigma up to ~Tari/8, inside table 6.5).
    softfix = int(rng.choice([0, 8]))
    tx_shape = float(rng.choice([0.0, 1.0]) * rng.uniform(0.5, 1.0)
                     * tari / 8.0)
    # PR-ASK rides too (reversal transitions need shaping).
    tx_mod = "pr" if (tx_shape > 0 and rng.random() < 0.5) else "dsb"
    n_tags = 1 if q == 0 else int(rng.integers(1, 3))
    words = rng.choice([2, 6, 8], size=n_tags)
    # Gen2 v2 XPC: an occasional untraceable-flagged tag backscatters an
    # extra XPC_W1 word between PC and EPC (PC counts it, so the window
    # must be sized one word wider).
    u_flags = rng.random(n_tags) < 0.25
    cfg = ReaderConfig.for_link(
        blf_hz=blf, tari_us=tari, dr=dr, miller_m=m, trext=trext,
        adc_rate=adc, decim=decim, fixed_q=q, max_events=64,
        epc_softfix=softfix, tx_shape_us=tx_shape, tx_mod=tx_mod,
        epc_bits=16 + 16 * (int(words.max()) + int(u_flags.any())) + 16 + 1)
    # Inside both decode envelopes: FM0's reference period grid covers
    # +-1% (test_impairments.py), Miller's joint segment search +-4%
    # (test_miller.py) - sample to 80% of each so the oracle stays exact.
    blf_lim = 8e-3 if m == 1 else 0.032
    tags = [
        Tag.with_id(
            int(rng.integers(1, 255)), n_words=int(w), seed=int(rng.integers(1 << 16)),
            backscatter=float(rng.uniform(0.05, 0.1))
            * np.exp(2j * np.pi * rng.uniform()),
            blf_offset=float(rng.uniform(-blf_lim, blf_lim)),
            cfo_hz=float(rng.uniform(-25, 25)),
            amp_ramp=float(rng.uniform(-0.1, 0.1)),
        )
        for w in words
    ]
    for t, u in zip(tags, u_flags):
        if u:
            t.apply_untraceable(1, None, "none", 0, "normal")
    return cfg, tags, rng


@pytest.mark.parametrize("seed", range(16))
def test_random_link_roundtrip(seed):
    cfg, tags, rng = _scenario(seed)
    tr = synthesize_inventory(cfg, tags, n_rounds=3,
                              seed=int(rng.integers(1 << 16)))
    stats, _ = decode_capture(jnp.asarray(tr.iq), cfg)
    assert int(stats.n_queries) == tr.n_slots
    assert int(stats.n_epc_correct) == tr.expected_epc_pass
    # No invented tags: every read maps to a synthesized tag id.
    reads = np.asarray(stats.tag_reads)
    real = {int("".join(map(str, t.epc96[-8:])), 2) for t in tags}
    assert set(np.nonzero(reads)[0]) <= real
    assert int(reads.sum()) == tr.expected_epc_pass
