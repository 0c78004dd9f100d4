"""Characterize the slot-state classifier across SNR x collider-phase grids.

Round-1 VERDICT item 7: `runtime.inventory.classify_slots`'s thresholds
(energy_factor / margin_thresh / excess_factor) were hand-tuned; this sweep
measures per-class accuracy over the operating envelope and writes the
table committed as docs/CLASSIFIER.md.  tests/test_slots.py pins a coarse
sub-grid as a regression bound.

Grid:
  * noise sigma (complex AWGN std at ADC rate; |backscatter| fixed at 0.08,
    post-FIR amplitude SNR ~ 20*log10(0.08 / (sigma/sqrt(n_taps)))),
  * phase separation between two equal-amplitude colliding tags (0 =
    phase-aligned, the physically ambiguous worst case).

Run: env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/classifier_sweep.py
"""

from __future__ import annotations

import collections
import sys

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402

from gen2_rfid_tpu.config import ReaderConfig  # noqa: E402
from gen2_rfid_tpu.runtime.inventory import (  # noqa: E402
    CMD_QREP,
    CMD_QUERY,
    SLOT_COLLISION,
    SLOT_EMPTY,
    SLOT_SINGLE,
    decode_capture,
)
from gen2_rfid_tpu.sim.tag import Tag  # noqa: E402
from gen2_rfid_tpu.sim.trace import synthesize_inventory  # noqa: E402

_NAMES = {SLOT_EMPTY: "empty", SLOT_SINGLE: "single",
          SLOT_COLLISION: "collision"}
PAD_TO = 1 << 21        # fixed jit shape: zero-pad every trace to 2^21 ADC samples


def cell_confusion(noise: float, dphi: float, *, n_rounds: int = 12,
                   seed: int = 3) -> collections.Counter:
    """(truth, predicted) counts for one (noise, phase-separation) cell."""
    cfg = ReaderConfig(fixed_q=1, max_events=128)
    tags = [
        Tag.with_id(9, seed=seed, backscatter=0.08 + 0j),
        Tag.with_id(27, seed=seed + 1,
                    backscatter=0.08 * np.exp(1j * dphi)),
    ]
    tr = synthesize_inventory(cfg, tags, n_rounds=n_rounds, seed=seed,
                              noise=noise)
    truth = ["collision" if e.collided
             else ("single" if e.reply_tag is not None else "empty")
             for e in tr.events if e.kind in ("query", "query_rep")]
    iq = np.zeros(PAD_TO, np.complex64)
    assert tr.iq.size <= PAD_TO, tr.iq.size
    iq[: tr.iq.size] = tr.iq
    _, dec = decode_capture(jnp.asarray(iq), cfg)
    valid = np.asarray(dec.valid)
    cmd = np.asarray(dec.cmd_type)
    order = np.argsort(np.asarray(dec.index)[valid])
    states = np.asarray(dec.slot_state)[valid][order]
    cmds = cmd[valid][order]
    pred = [_NAMES[int(s)] for s, c in zip(states, cmds)
            if c in (CMD_QUERY, CMD_QREP)]
    assert len(pred) == len(truth), (len(pred), len(truth))
    return collections.Counter(zip(truth, pred))


def accuracy(conf: collections.Counter, cls: str) -> float:
    tot = sum(v for (t, _), v in conf.items() if t == cls)
    if tot == 0:
        return float("nan")
    return conf[(cls, cls)] / tot


def main():
    noises = [0.004, 0.016, 0.032, 0.064, 0.128, 0.192]
    dphis = [0.0, np.pi / 6, np.pi / 3, np.pi / 2, 2 * np.pi / 3, 5 * np.pi / 6]
    print("| noise | ~SNR dB | dphi | empty | single | collision |")
    print("|---|---|---|---|---|---|")
    for noise in noises:
        snr = 20 * np.log10(0.08 / (noise / np.sqrt(25)))
        for dphi in dphis:
            conf = collections.Counter()
            for seed in (3, 17, 31):
                conf += cell_confusion(noise, dphi, seed=seed)
            e, s, c = (accuracy(conf, k) for k in ("empty", "single",
                                                   "collision"))
            print(f"| {noise} | {snr:.0f} | {dphi / np.pi:.2f}pi "
                  f"| {e:.2f} | {s:.2f} | {c:.2f} |", flush=True)


if __name__ == "__main__":
    main()
