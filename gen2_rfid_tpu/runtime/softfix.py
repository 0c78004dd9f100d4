"""CRC-guided soft-decision EPC recovery (new capability).

The reference discards any EPC frame whose CRC-16 fails
(``tag_decoder_impl.cc:330-344``) — near the sensitivity floor most
failures are one or two wrong *detector decisions*, and the coherent
detector knows exactly which decisions were marginal (small
|Re(d·h*)|).  This module re-slices failed frames by hypothesis testing
over the K least-reliable decisions: enumerate every single and pair of
decision flips, map each to its bit-flip mask, and accept the
maximum-likelihood (minimum flipped-reliability) candidate that passes
the full PC-aware CRC validation.

Error-event models (the flip masks) follow the line coding:

* **FM0** (``dsp/fm0.py``): bits are differentially decoded from sign
  decisions (``bit_j = sign_j != sign_{j-1}``), so one wrong sign j
  corrupts the adjacent bit *pair* {j, j+1} (only bit n-1 for the last
  sign).  Candidate events are sign flips ranked by
  ``epc_detect_soft``'s per-sign reliability.
* **Miller-M** (``dsp/miller.py``): each bit compares its own two
  half-bit subcarrier correlations, so events are single-bit flips
  ranked by the weaker half's reliability.

Everything is static-shape selection algebra: ``lax.top_k`` picks the K
ranked events, masks are arange comparisons, candidates are one XOR, and
validation reuses the batched GF(2) CRC matmuls
(``runtime/inventory.py::check_epc_crc_pc``) over the (E·C, n) candidate
table.  With K=8 that is 36 candidates/frame; a random candidate passes
plain CRC-16 with p = 2^-16, so the analytic false-accept rate is
~5.5e-4 per *failed* frame.  MEASURED (round-5 200k-random-frame
campaign, tools/softfix_false_accept.py): compat (fixed-96 CRC)
5.18e-4 (95% upper 6.3e-4 — the analytic model is exact); native
(PC-aware) **3.99e-5** — 14x stricter, because check_epc_crc_pc also
requires the candidate's own PC length field to name a valid in-window
length before its CRC hypothesis counts.  Pinned by
tests/test_softfix.py::test_false_accept_rate_bounded; the ML
(min-cost) pick prefers genuinely marginal decisions, pinned by the
recovery tests.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ReaderConfig


def _pair_indices(k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static (i, j) index vectors of all i < j pairs among k events."""
    pi, pj = np.triu_indices(k, 1)
    return pi.astype(np.int32), pj.astype(np.int32)


def candidate_flips(bits: jnp.ndarray, rel: jnp.ndarray, k: int,
                    fm0_pairs: bool):
    """Enumerate single+pair decision-flip candidates for one batch.

    bits, rel: (E, n).  Returns (candidates (E, C, n) int32,
    cost (E, C) float32) with C = k + k(k-1)/2, cost = summed reliability
    of the flipped decisions (the negative log-likelihood of that error
    pattern under AWGN, up to scale).
    """
    n = bits.shape[-1]
    neg, idx = jax.lax.top_k(-rel, k)              # (E, k) least reliable
    relk = -neg
    ar = jnp.arange(n, dtype=jnp.int32)
    masks = ar[None, None, :] == idx[:, :, None]   # (E, k, n)
    if fm0_pairs:
        # Sign event j flips bits {j, j+1}; j = n-1 flips only bit n-1.
        masks = masks | (ar[None, None, :] == idx[:, :, None] + 1)
    pi, pj = _pair_indices(k)
    pair_masks = jnp.logical_xor(masks[:, pi, :], masks[:, pj, :])
    all_masks = jnp.concatenate([masks, pair_masks], axis=1)  # (E, C, n)
    cost = jnp.concatenate([relk, relk[:, pi] + relk[:, pj]], axis=1)
    cands = jnp.bitwise_xor(bits[:, None, :].astype(jnp.int32),
                            all_masks.astype(jnp.int32))
    return cands, cost


def recover_epc_batch(
    epc_bits: jnp.ndarray,
    rel: jnp.ndarray,
    cfg: ReaderConfig,
    validate: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Try to repair CRC-failed EPC frames from decision reliabilities.

    epc_bits, rel: (E, n).  ``validate`` maps a (B, n) bit table to
    (pass (B,), tag_id (B,)) — pass the mode-aware validator so compat
    keeps the reference's fixed-96 check.  Returns (bits_out (E, n),
    fixed (E,) bool); ``fixed`` marks frames where some candidate passed
    (callers apply it only to frames that originally failed).
    """
    k = int(cfg.epc_softfix)
    e, n = epc_bits.shape
    cands, cost = candidate_flips(epc_bits, rel, k, cfg.miller_m == 1)
    c = cands.shape[1]
    ok, _ = validate(cands.reshape(e * c, n))
    ok = ok.reshape(e, c)
    score = jnp.where(ok, cost, jnp.inf)
    best = jnp.argmin(score, axis=1)
    fixed = jnp.any(ok, axis=1)
    bits_best = jnp.take_along_axis(
        cands, best[:, None, None], axis=1)[:, 0, :]
    bits_out = jnp.where(fixed[:, None], bits_best, epc_bits)
    return bits_out, fixed
