"""Miller-M subcarrier demodulation (new capability; no reference analogue).

The reference decodes FM0 only (its Query always sets M=00,
``global_vars.h:116``); Miller support in the new framework follows the same
batched design as ``fm0.py``:

* sync: chip-template correlation of the Miller preamble (4 spin-up bits +
  010111, TRext=0) over a jitter search window - one gather + matmul;
* chip-period refinement: 20-candidate grid maximizing subcarrier
  correlation energy over the data region (the FM0 amplitude-energy grid
  does not transfer: Miller chips are phase flips at constant magnitude);
* detection: per half-bit subcarrier correlation q = sum_a x[chip a] *
  (-1)^a, then bit_j = (sign(q_first) != sign(q_second)) - Miller data-1
  inverts phase mid-bit, so the within-bit comparison needs no differential
  chain at all.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ReaderConfig
from ..sim.tag import miller_chips


def _preamble_pm(m: int, trext: int = 0) -> np.ndarray:
    """+-1 chip template of the Miller preamble (no data bits)."""
    chips = miller_chips(np.zeros(0, dtype=np.int64), m, add_dummy=False,
                         trext=trext)
    return chips.astype(np.float32) * 2.0 - 1.0


def miller_sync(
    frame: jnp.ndarray, cfg: ReaderConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Locate the Miller preamble; return (chip0_index, h_est).

    chip0_index points at the first *data* chip (offset of preamble end).
    """
    m = cfg.miller_m
    pm = _preamble_pm(m, cfg.trext)
    n_chips = pm.shape[0]
    d = cfg.n_samples_chip
    n_off = cfg.sync_search
    pos = np.floor(np.arange(n_chips) * d).astype(np.int32)
    idx = jnp.arange(n_off, dtype=jnp.int32)[:, None] + jnp.asarray(pos)[None, :]
    g = frame[idx]                                   # (n_off, n_chips)
    corr = g @ jnp.asarray(pm)                       # (n_off,)
    power = jnp.real(corr) ** 2 + jnp.imag(corr) ** 2
    best = jnp.argmax(power).astype(jnp.int32)
    h_est = (g[best] * jnp.asarray(pm)).mean()
    data_index = best + jnp.int32(int(round(n_chips * d)))
    return data_index, h_est


def _halfbit_corr(
    frame: jnp.ndarray, index, chip: jnp.ndarray, n_half: int, m: int
) -> jnp.ndarray:
    """Subcarrier correlation per half-bit: q_k = sum_a x[(k*m+a)*chip] * (-1)^a."""
    k = jnp.arange(n_half, dtype=jnp.float32)[:, None]
    a = jnp.arange(m, dtype=jnp.float32)[None, :]
    pos = ((k * m + a) * chip).astype(jnp.int32) + index
    pos = jnp.minimum(pos, frame.shape[0] - 1)
    sub = jnp.asarray((-1.0) ** np.arange(m), dtype=jnp.float32)
    return (frame[pos] * sub[None, :]).sum(axis=1)    # (n_half,) complex


def miller_detect(
    frame: jnp.ndarray,
    index: jnp.ndarray,
    h_est: jnp.ndarray,
    cfg: ReaderConfig,
    n_bits: int,
    seg_bits: int = 16,
    n_offsets: int = 25,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode n_bits Miller-M bits with per-segment sub-chip re-alignment.

    A global chip-period grid search (the FM0 approach,
    tag_decoder_impl.cc:151-166) aliases for Miller: the subcarrier energy
    metric is nearly invariant under full-chip shifts, so over the ~2000
    chips of an M=8 EPC the search lands on a comb tooth and the frame tail
    desynchronizes.  Instead the frame is decoded in segments of
    ``seg_bits``; each segment independently searches a +-1.5 chip offset
    maximizing subcarrier correlation energy (which *does* peak sharply at
    sub-chip alignment), so accumulated timing drift is re-absorbed every
    segment regardless of its source.  Full-chip ambiguity per segment is
    harmless: a whole-chip shift flips both half-bit correlations
    consistently and the within-bit comparison is invariant.
    """
    m = cfg.miller_m
    d = jnp.float32(cfg.n_samples_chip)
    n_seg = (n_bits + seg_bits - 1) // seg_bits
    offsets = jnp.linspace(-1.5, 1.5, n_offsets).astype(jnp.float32) * d

    def segment(g):
        base = index.astype(jnp.float32) + g.astype(jnp.float32) * (
            2.0 * seg_bits * m
        ) * d

        def at(off):
            k = jnp.arange(2 * seg_bits * m, dtype=jnp.float32)
            pos = (base + off + k * d).astype(jnp.int32)
            pos = jnp.minimum(pos, frame.shape[0] - 1)
            sub = jnp.asarray((-1.0) ** np.arange(m), dtype=jnp.float32)
            x = frame[pos].reshape(2 * seg_bits, m)
            return (x * sub[None, :]).sum(axis=1)    # (2*seg_bits,) complex

        qs = jax.vmap(at)(offsets)                   # (n_offsets, 2*seg_bits)
        e = jnp.sum(jnp.real(qs) ** 2 + jnp.imag(qs) ** 2, axis=1)
        return qs[jnp.argmax(e)]

    q = jax.vmap(segment)(jnp.arange(n_seg)).reshape(-1)[: 2 * n_bits]
    stat = jnp.real(q * jnp.conj(h_est))
    if cfg.track_channel and cfg.mode != "compat":
        # Decision-directed channel tracking (new capability, shared with
        # FM0: fm0._track_and_slice).  Each clean Miller half-bit correlates
        # to q ~ +-(m/2) h - a full-swing BPSK constellation on h - so
        # scaling by 2/m matches the tracker's expected-swing confidence
        # gate, and every half-bit (unlike FM0's zero mid-bit samples)
        # contributes a phase measurement.  CFO robustness context: the
        # within-bit comparison is invariant to slow common rotation, but
        # the margin collapses as the rotation approaches pi/2; tracking
        # keeps the statistic at full swing instead.
        from .fm0 import _track_and_slice

        s = _track_and_slice(q * jnp.float32(2.0 / m), h_est).astype(
            jnp.float32)
    else:
        s = jnp.sign(stat)
    bits = (s[0::2] != s[1::2]).astype(jnp.int32)
    # Decision margin ~1 for a clean single tag: {0,h} chips alternating
    # with the subcarrier give |stat| = (m/2)*|h|^2 per half-bit; lower
    # under collisions - see fm0.rn16_detect_soft.
    h2 = jnp.real(h_est) ** 2 + jnp.imag(h_est) ** 2
    margin = jnp.mean(jnp.abs(stat)) / jnp.maximum(0.5 * m * h2, 1e-12)
    return bits, d, margin


def miller_rn16(frame, index, h, cfg):
    return miller_detect(frame, index, h, cfg, 16)[0]


def miller_rn16_soft(frame, index, h, cfg):
    bits, _, margin = miller_detect(frame, index, h, cfg, 16)
    return bits, margin


def miller_epc(frame, index, h, cfg):
    bits, chip, _ = miller_detect(frame, index, h, cfg, cfg.epc_data_bits)
    return bits, chip


miller_sync_batch = jax.vmap(miller_sync, in_axes=(0, None))
miller_rn16_batch = jax.vmap(miller_rn16, in_axes=(0, 0, 0, None))
miller_rn16_soft_batch = jax.vmap(miller_rn16_soft, in_axes=(0, 0, 0, None))
miller_epc_batch = jax.vmap(miller_epc, in_axes=(0, 0, 0, None))
