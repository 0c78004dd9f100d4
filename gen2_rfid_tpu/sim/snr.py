"""SNR sweep: decode success rate vs noise (BASELINE.md verification).

The reference publishes no BER curves; its implicit bound is "the golden
capture decodes" (README.md:43-53).  This utility quantifies the decoder's
operating region on synthetic traces: for each SNR it synthesizes
inventory rounds with AWGN and measures the EPC decode rate, where SNR is
defined per post-matched-filter half-symbol:

    SNR = |h_bs|^2 * n_taps / sigma^2      (coherent boxcar gain)

Coherent FM0 detection theory predicts a waterfall around a few dB; the
regression test pins "high SNR decodes everything / negative SNR decodes
nothing" plus monotonicity.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Sequence

import numpy as np

from ..config import ReaderConfig
from .tag import Tag
from .trace import synthesize_inventory


@dataclasses.dataclass
class SnrPoint:
    snr_db: float
    noise_sigma: float
    epc_rate: float          # decoded EPCs / expected EPCs
    n_expected: int


def sigma_for_snr(cfg: ReaderConfig, backscatter: complex, snr_db: float) -> float:
    n_taps = int(cfg.tag_bit_us / 2 * cfg.adc_rate / 1e6 / cfg.miller_m)
    return float(abs(backscatter) * math.sqrt(n_taps / (10 ** (snr_db / 10.0))))


def snr_sweep(
    cfg: ReaderConfig,
    snr_db: Sequence[float],
    n_rounds: int = 10,
    seed: int = 0,
    backscatter: complex = 0.08 + 0.03j,
) -> List[SnrPoint]:
    import jax.numpy as jnp

    from ..runtime.inventory import decode_capture

    out = []
    for k, s in enumerate(snr_db):
        sigma = sigma_for_snr(cfg, backscatter, s)
        tag = Tag.with_id(27, seed=7, backscatter=backscatter)
        tr = synthesize_inventory(
            cfg, [tag], n_rounds=n_rounds, noise=sigma, seed=seed + 1000 * k
        )
        stats, _ = decode_capture(jnp.asarray(tr.iq), cfg)
        out.append(
            SnrPoint(
                snr_db=float(s),
                noise_sigma=sigma,
                epc_rate=float(int(stats.n_epc_correct)) / max(tr.expected_epc_pass, 1),
                n_expected=tr.expected_epc_pass,
            )
        )
    return out
