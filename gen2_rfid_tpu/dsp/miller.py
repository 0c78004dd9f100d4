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

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ReaderConfig
from ..runtime.frames import GRANULE
from ..sim.tag import miller_chips
from .fm0 import SEL_PRECISION


def _preamble_pm(m: int, trext: int = 0) -> np.ndarray:
    """+-1 chip template of the Miller preamble (no data bits)."""
    chips = miller_chips(np.zeros(0, dtype=np.int64), m, add_dummy=False,
                         trext=trext)
    return chips.astype(np.float32) * 2.0 - 1.0


def sync_eps_grid(frac: float) -> np.ndarray:
    """Preamble-correlation clock-error hypotheses: +-frac in 0.5% steps.

    Gen2 tags are allowed percent-level frequency tolerance (FT, Gen2
    table 6.9); at M=8 the preamble is ~160 chips long, so even 1% of
    clock error smears a nominal-period correlation by ~1.6 chips and
    sync dies before the data cascade ever runs.  Correlating against a
    small grid of period-scaled templates (one shared-weight matmul,
    n_eps x n_off columns) keeps the residual smear under ~0.4 chip
    across the grid.  ``frac`` comes from cfg.miller_grid_frac.
    """
    n = max(int(round(2 * frac / 0.005)) + 1, 3)
    return np.linspace(-frac, frac, n).astype(np.float32)


def seg_eps_grid(frac: float) -> np.ndarray:
    """Joint-search chip-period hypotheses: +-frac in 1% steps.

    The per-segment residual is +-0.5%, i.e. <=0.16 chip of intra-segment
    smear over a 32-chip segment - the term that capped the pure-offset
    cascade at ~+-2% (0.64 chip at the edge) no matter how well the
    segment *start* was predicted.
    """
    n = max(int(round(2 * frac / 0.01)) + 1, 3)
    return np.linspace(-frac, frac, n).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _miller_sync_selection(cfg: ReaderConfig):
    """(span, n_eps*n_off) preamble-correlation + channel-mean selection
    matrices (the FM0 pattern, sync.py::_sync_selection: per-frame chip
    gathers serialize on TPU; tiny shared-weight matmuls do not), one
    column group per clock-error hypothesis."""
    m = cfg.miller_m
    pm = _preamble_pm(m, cfg.trext)
    n_chips = pm.shape[0]
    d = cfg.n_samples_chip
    n_off = cfg.sync_search
    eps_grid = sync_eps_grid(cfg.miller_grid_frac)
    n_eps = eps_grid.shape[0]
    spans = []
    for e in eps_grid:
        spans.append(int(np.floor((n_chips - 1) * d * (1.0 + e))) + n_off)
    span = max(spans)
    s = np.zeros((span, n_eps * n_off), dtype=np.float32)
    sh = np.zeros((span, n_eps * n_off), dtype=np.float32)
    dshift = np.zeros(n_eps, dtype=np.int32)
    offs = np.arange(n_off)
    for t, e in enumerate(eps_grid):
        pos = np.floor(np.arange(n_chips) * d * (1.0 + e)).astype(np.int32)
        dshift[t] = int(round(n_chips * d * (1.0 + e)))
        for j in range(n_chips):
            cols = t * n_off + offs
            np.add.at(s, (pos[j] + offs, cols), pm[j])
            np.add.at(sh, (pos[j] + offs, cols), pm[j] / n_chips)
    return s, sh, span, dshift, n_off, eps_grid


def preamble_len_samples(cfg: ReaderConfig) -> int:
    """Nominal-clock preamble length in samples (data-start offset from
    the sync window start) - the b0 the SIC template bank anchors on."""
    m = cfg.miller_m
    n_chips = _preamble_pm(m, cfg.trext).shape[0]
    return int(round(n_chips * cfg.n_samples_chip))


def miller_sync_full(
    frame: jnp.ndarray, cfg: ReaderConfig
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Locate the Miller preamble; return (chip0_index, h_est, eps_sync).

    chip0_index points at the first *data* chip (offset of preamble end,
    under the winning clock-error hypothesis); eps_sync is that
    hypothesis's chip-period error — the frame's best single period
    estimate (the preamble integrates 10-160 chips, far more than one
    data segment), used to seed the segment cascade's eps tracker.
    """
    s_np, sh_np, span, dshift_np, n_off, eps_np = _miller_sync_selection(cfg)
    x = jax.lax.slice(frame, (0,), (span,))
    xr, xi = jnp.real(x), jnp.imag(x)
    hi = SEL_PRECISION
    s = jnp.asarray(s_np)
    cr = jnp.matmul(xr, s, precision=hi)
    ci = jnp.matmul(xi, s, precision=hi)
    power = cr ** 2 + ci ** 2
    best = jnp.argmax(power).astype(jnp.int32)
    sh = jnp.asarray(sh_np)
    hr = jnp.matmul(xr, sh, precision=hi)
    hi_ = jnp.matmul(xi, sh, precision=hi)
    # One-hot winner selection: per-frame dynamic gathers (h_all[best],
    # dshift[best // n_off]) under vmap are the v5e scalar-gather poison;
    # the contraction selects identical values (sums over exact zeros).
    onehot = (jnp.arange(power.shape[0]) == best).astype(jnp.float32)
    h_est = jax.lax.complex(jnp.dot(onehot, hr, precision=hi),
                            jnp.dot(onehot, hi_, precision=hi))
    oh_eps = jnp.sum(onehot.reshape(-1, n_off), axis=1)
    data_index = best % n_off + jnp.dot(
        oh_eps, jnp.asarray(dshift_np, dtype=jnp.float32),
        precision=hi).astype(jnp.int32)
    eps_sync = jnp.dot(oh_eps, jnp.asarray(eps_np), precision=hi)
    return data_index, h_est, eps_sync


def miller_sync(
    frame: jnp.ndarray, cfg: ReaderConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Locate the Miller preamble; return (chip0_index, h_est)."""
    data_index, h_est, _ = miller_sync_full(frame, cfg)
    return data_index, h_est


@functools.lru_cache(maxsize=32)
def _miller_segment_selection(cfg: ReaderConfig, n_bits: int, seg_bits: int,
                              off_chips: float):
    """Per-segment (span, n_eps * n_off * 2*seg_bits) joint
    (chip-period, offset) subcarrier-correlation selection tables.

    Column (e*n_off + o)*2S + h of segment g sums +-frame[start + pos]
    over the m chips of half-bit h at start offset o under chip-period
    hypothesis d*(1+eps_e), with pos = floor(g*(2S*m)*d + off_o +
    k*d*(1+eps_e)) (slice starts are integral so the floor is exact).  The
    joint grid is what extends BLF tolerance past ~+-2%: offset tracking
    alone leaves an intra-segment chip-period mismatch of eps * 32 chips
    that passes half a chip right around 2% (CLAUDE.md round-3 note);
    with +-0.5% period residual the smear stays under 0.16 chip at any
    in-span clock error.

    The offset grid keeps sub-sample steps - the fractional-phase
    diversity is real decode margin, not cosmetic: each sub-sample offset
    yields a different rounding pattern along the chip sequence, i.e. a
    distinct fractional-delay template - but spans [-off_chips,
    +off_chips + GRANULE/d] chips instead of +-off_chips.
    The upper GRANULE/d extension lets miller_detect slice each segment
    on a GRANULE boundary (the aligned row-gather pattern; a per-frame
    unaligned dynamic_slice under vmap is the v5e scalar-gather poison
    that made the Miller cascade 70 ms of an 82 ms iteration -
    tools/tpu_prof_miller*.py) and absorb the 0..GRANULE-1 sample
    remainder on the offset axis; miller_detect re-centers the tracker
    prior at the known remainder and hard-masks candidates outside
    +-off_chips of it.  Spans are padded to a GRANULE multiple.  Returns
    ((s0, span, D), ...) with positions rebased to each segment's minimum
    s0, the eps grid, and the offset grid (samples).
    """
    m = cfg.miller_m
    d = float(cfg.n_samples_chip)
    s = seg_bits
    n_seg = (n_bits + s - 1) // s
    eps = seg_eps_grid(cfg.miller_grid_frac)
    n_eps = eps.shape[0]
    # Sub-chip *sample-lattice* steps: at least as fine as the original
    # 0.125-chip lattice at every supported chip rate (1 sample once
    # d >= 8, 0.5 samples for 4 <= d < 8, 0.25 samples below - e.g.
    # Miller-8 at decim=1 has d=3.125, where 0.5-sample steps would be a
    # coarser 0.16 chip; round-4 ADVICE item), and - because every step
    # divides 1 sample - closed under the integer alignment remainder, so
    # the candidate template set relative to the signal is identical for
    # every event regardless of its slice's granule phase (the
    # pre-alignment design had that uniformity trivially; a non-closed
    # lattice loses marginal frames to per-event fractional-phase luck).
    step = 1.0 if d >= 8 else (0.5 if d >= 4 else 0.25)
    n_pts = int(np.ceil((2 * off_chips * d + GRANULE) / step)) + 1
    offsets = -off_chips * d + step * np.arange(n_pts)           # float64
    n_off = offsets.shape[0]
    sub = ((-1.0) ** np.arange(m)).astype(np.float32)
    tables = []
    for g in range(n_seg):
        # The tail segment covers only the bits that exist: its offset
        # search must not correlate against post-reply noise/CW (a 65-bit
        # access reply in 16-bit segments otherwise decodes its last bit
        # against a mostly-empty segment and misaligns).
        sg = min(s, n_bits - g * s)
        k = np.arange(2 * sg * m, dtype=np.float64)
        base = g * (2.0 * s * m) * d
        step = d * (1.0 + eps.astype(np.float64))          # (n_eps,)
        pos = np.floor(
            base + offsets[None, :, None]
            + k[None, None, :] * step[:, None, None]
        ).astype(np.int64)                                 # (E, O, K)
        s0 = int(pos.min())
        span = int(pos.max()) - s0 + 1
        span = -(-span // GRANULE) * GRANULE
        dmat = np.zeros((span, n_eps * n_off * 2 * sg), dtype=np.float32)
        half = np.arange(2 * sg * m) // m
        cols = (np.arange(n_eps)[:, None, None] * (n_off * 2 * sg)
                + np.arange(n_off)[None, :, None] * (2 * sg)
                + half[None, None, :])
        vals = np.broadcast_to(
            sub[np.tile(np.arange(m), 2 * sg)][None, None, :], pos.shape)
        np.add.at(dmat, (pos - s0, cols), vals)
        tables.append((s0, span, dmat))
    return tuple(tables), eps, offsets.astype(np.float32)


def default_seg_bits(m: int) -> int:
    """Segment length (bits) for the re-alignment cascade: 64 backscatter
    chips per segment across M (seg_bits = 32/M).

    The original 16/M sizing came from the round-2 *offset-only* cascade,
    where intra-segment clock-error drift (~ eps * seg chips) had to stay
    well under half a chip.  The round-3 joint (offset, chip-period)
    search absorbs that drift on the period axis (residual <= 0.5% x 64
    chips = 0.32 chip at the 1% grid pitch), so segments can be twice as
    long - and longer segments integrate twice the signal per alignment
    decision, which measurably *widens* the robustness envelope (a
    round-4 24-scenario sweep over M x BLF +-4% x -20 dBc interferer x
    CFO: 18/24 exact at 32/M vs 15/24 at 16/M - the M=8 interferer
    composes now pass) while halving the sequential segment chain the
    TPU profile shows is latency-bound (tools/tpu_prof_miller*.py).
    Shorter (8/M) breaks the -20 dBc dense-reader case outright - the
    offset decision integrates too little signal."""
    return max(2, 32 // m)


def miller_detect(
    frame: jnp.ndarray,
    index: jnp.ndarray,
    h_est: jnp.ndarray,
    cfg: ReaderConfig,
    n_bits: int,
    seg_bits: int = None,
    off_chips: float = 1.5,
    eps0: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode n_bits Miller-M bits with a drift-tracking joint
    (offset, chip-period) segment cascade.

    A global chip-period grid search (the FM0 approach,
    tag_decoder_impl.cc:151-166) aliases for Miller: the subcarrier energy
    metric is nearly invariant under full-chip shifts, so over the ~2000
    chips of an M=8 EPC the search lands on a comb tooth and the frame tail
    desynchronizes.  Instead the frame is decoded in segments of
    ``seg_bits``; each segment searches a +-1.5 chip offset grid x a
    +-miller_grid_frac chip-period grid maximizing subcarrier correlation
    energy (which *does* peak sharply at sub-chip alignment) around a
    *predicted* base.  The two grid axes decouple the two failure modes
    that capped the pure-offset cascade at ~+-2% (round-2 note): the
    period axis absorbs intra-segment chip drift (eps * 32 chips passes
    half a chip right at 2%) without shortening the segment, so the
    integration stays long enough for the -20 dBc dense-reader case.

    The cascade: tag BLF error makes timing drift grow linearly across
    the frame, so each segment's base extrapolates the measured drift
    with a slope clamped to within 0.75 chip/segment of the *measured
    chip-period error's* implied slope (eps_track * segment chips) - a
    keel the offset measurements cannot drag off course in one
    interference-corrupted segment, yet one that tracks any in-span
    clock error exactly.  eps_track itself is slew-limited to one grid
    step per segment and steered by a Gaussian prior (sigma 1.5%) around
    the previous value; the offset prior (sigma 1.25 chips, see round-2
    sweep notes) breaks the +-1-chip comb ties toward the tracked
    alignment.  An un-predicted window drifting past ~1 chip locks onto
    a comb tooth and decodes the whole segment complemented (a one-chip
    shift swaps each half-bit correlation onto its neighbor, inverting
    the within-bit comparison).  Measured envelope: exact decode through
    +-4% BLF error across M=2/4/8 (tests/test_miller.py), vs the FM0
    reference grid's +-1% (tag_decoder_impl.cc:151-169); the -20 dBc
    in-channel-interferer case stays exact (tests/test_dense_reader.py).
    """
    m = cfg.miller_m
    if seg_bits is None:
        seg_bits = default_seg_bits(m)
    tables, eps_np, off_np = _miller_segment_selection(cfg, n_bits, seg_bits,
                                                       off_chips)
    n_eps = eps_np.shape[0]
    n_off = off_np.shape[0]
    hi = SEL_PRECISION
    w = frame.shape[0]
    fr, fi = jnp.real(frame), jnp.imag(frame)
    # Granule rows for aligned slices (vmapped unaligned dynamic_slice is
    # the v5e scalar-gather poison; batched row gathers are not - the
    # gather_aligned_windows pattern, runtime/frames.py).
    n_rows = -(-w // GRANULE)
    pad = n_rows * GRANULE - w
    frows = jnp.pad(fr, (0, pad)).reshape(n_rows, GRANULE)
    firows = jnp.pad(fi, (0, pad)).reshape(n_rows, GRANULE)
    d = np.float32(cfg.n_samples_chip)
    # Offset values of the table's search grid (samples, segment-relative).
    off_vals = jnp.asarray(off_np)
    off_chips_grid = jnp.asarray(off_np / float(d))
    eps_vals = jnp.asarray(eps_np)
    seg_chips = 2 * seg_bits * m       # full-segment chips (tail is last)
    max_step = jnp.float32(0.75 * d)   # slope clamp (samples per segment)
    eps_sigma = jnp.float32(0.015)     # eps continuity prior width
    eps_slew = jnp.float32(0.01)       # eps_track slew limit per segment
    pred = jnp.float32(0.0)       # predicted drift at this segment's start
    prev = jnp.float32(0.0)       # measured drift one segment earlier
    # Tracked chip-period error, seeded from the sync stage's winning
    # period hypothesis when available (miller_sync_full: the preamble
    # integrates 10-160 chips — the frame's best single eps estimate, and
    # it lets even the first data segment run under the continuity prior,
    # which matters at low SNR where an unpriored 9x-wider joint grid
    # costs ~0.5 dB of waterfall).  None = cold acquisition (segment 0
    # unpriored on the eps axis).
    eps_track = eps0
    q_segs = []
    for g, (s0, span, d_np) in enumerate(tables):
        # One granule-aligned row gather per segment, then a shared-weight
        # +-1 selection matmul computing every (period, offset) hypothesis's
        # subcarrier correlations at once (per-frame chip gathers and
        # unaligned slices serialize on TPU).  The 0..GRANULE-1 alignment
        # remainder is known, covered by the offset grid's upper extension,
        # and re-centers the offset prior below.
        shift = jnp.round(pred).astype(jnp.int32)
        raw = jnp.clip(index + s0 + shift, 0, w - span)
        row0 = raw // GRANULE
        rem = (raw - row0 * GRANULE).astype(jnp.float32)
        rows = row0 + jnp.arange(span // GRANULE, dtype=jnp.int32)
        slri = jnp.stack([frows, firows])[:, rows].reshape(2, span)
        dj = jnp.asarray(d_np)
        qri = jnp.matmul(slri, dj, precision=hi).reshape(2, n_eps, n_off, -1)
        e = jnp.sum(qri[0] ** 2 + qri[1] ** 2, axis=2)     # (E, O)
        # Prediction-centered prior on the offset decision: segment energy
        # is nearly flat across whole-chip shifts (the comb), and under
        # strong in-channel interference the tone can out-shine the
        # backscatter on a short segment - a soft Gaussian prior (sigma
        # 1.25 chips; sweep in session notes: 0.75 costs decode margin at
        # +-1% BLF error under noise, 1.0-1.5 passes both the tolerance
        # and the -20 dBc dense-reader scenarios) around the predicted
        # position (= the alignment remainder, in slice coordinates)
        # breaks both ties toward the tracked alignment while costing a
        # sharply-peaked true offset almost nothing.
        # The grid's GRANULE-1 upper extension exists only to absorb the
        # alignment remainder: candidates beyond +-off_chips of the
        # prediction are masked out (the pre-alignment design's *hard*
        # search window - without it a -20 dBc in-channel interferer
        # hijacks the extra comb teeth the Gaussian prior alone only
        # damps; tests/test_dense_reader.py pins that envelope).
        rel = off_chips_grid - rem / d
        off_prior = jnp.where(
            jnp.abs(rel) <= np.float32(off_chips + 0.26 / d),
            jnp.exp(-(rel ** 2) / (2.0 * 1.25 ** 2)), 0.0)
        if eps_track is None:
            # Segment 0 acquires eps cold: the preamble sync already
            # aligned the segment start, so the period axis is the only
            # unknown and the energy peak is unambiguous.
            prior = off_prior[None, :]
        else:
            eps_prior = jnp.exp(
                -((eps_vals - eps_track) ** 2) / (2.0 * eps_sigma ** 2))
            prior = eps_prior[:, None] * off_prior[None, :]
        # Winner selection as one-hot algebra, not indexing: per-frame
        # dynamic gathers (qri[:, be, bo], eps_vals[be]) under vmap are
        # the same scalar-gather poison as the slices; a one-hot
        # contraction selects the identical values (sums over exact
        # zeros) on the vector/matrix units instead.
        b = jnp.argmax((e * prior).reshape(-1))
        onehot = (jnp.arange(n_eps * n_off) == b).astype(jnp.float32)
        q_segs.append(jax.lax.complex(
            jnp.matmul(onehot, qri[0].reshape(n_eps * n_off, -1),
                       precision=hi),
            jnp.matmul(onehot, qri[1].reshape(n_eps * n_off, -1),
                       precision=hi)))
        oh_eo = onehot.reshape(n_eps, n_off)
        eps_meas = jnp.dot(jnp.sum(oh_eo, axis=1), eps_vals, precision=hi)
        eps_track = eps_meas if eps_track is None else jnp.clip(
            eps_meas, eps_track - eps_slew, eps_track + eps_slew)
        drift = (row0 * GRANULE - index - s0).astype(jnp.float32) \
            + jnp.dot(jnp.sum(oh_eo, axis=0), off_vals, precision=hi)
        # Linear extrapolation: the measured drift slope, clamped to
        # within max_step of the slope the tracked chip-period error
        # implies - in-span clock error tracks exactly, while one
        # interference-corrupted offset measurement cannot launch the
        # cascade off the frame.
        slope_eps = eps_track * jnp.float32(seg_chips) * d
        if g == 0:
            slope = slope_eps
        else:
            slope = jnp.clip(drift - prev,
                             slope_eps - max_step, slope_eps + max_step)
        pred = drift + slope
        prev = drift

    q = jnp.concatenate(q_segs)[: 2 * n_bits]
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

        s, rel_half = _track_and_slice(q * jnp.float32(2.0 / m), h_est)
        s = s.astype(jnp.float32)
    else:
        s = jnp.sign(stat)
        rel_half = jnp.abs(stat)
    bits = (s[0::2] != s[1::2]).astype(jnp.int32)
    # Per-bit reliability for CRC-guided recovery (runtime/softfix.py):
    # bit j comes from half-bit signs (2j, 2j+1); a single half-bit error
    # flips exactly bit j, and the weaker half dominates its probability.
    rel_bits = jnp.minimum(rel_half[0::2], rel_half[1::2])
    # Decision margin ~1 for a clean single tag: {0,h} chips alternating
    # with the subcarrier give |stat| = (m/2)*|h|^2 per half-bit; lower
    # under collisions - see fm0.rn16_detect_soft.
    h2 = jnp.real(h_est) ** 2 + jnp.imag(h_est) ** 2
    margin = jnp.mean(jnp.abs(stat)) / jnp.maximum(0.5 * m * h2, 1e-12)
    # Estimated chip period (the Miller analogue of the FM0 t_half
    # estimate): nominal scaled by the tracked chip-period error.
    chip_est = jnp.float32(cfg.n_samples_chip) * (1.0 + eps_track)
    return bits, chip_est, margin, rel_bits


def miller_rn16(frame, index, h, cfg, eps0=None):
    return miller_detect(frame, index, h, cfg, 16, eps0=eps0)[0]


def miller_rn16_soft(frame, index, h, cfg, eps0=None):
    bits, _, margin, _ = miller_detect(frame, index, h, cfg, 16, eps0=eps0)
    return bits, margin


def miller_epc(frame, index, h, cfg, eps0=None):
    bits, chip, _, _ = miller_detect(frame, index, h, cfg, cfg.epc_data_bits,
                                     eps0=eps0)
    return bits, chip


def miller_epc_soft(frame, index, h, cfg, eps0=None):
    """(bits, chip_est, rel_bits) — per-bit reliabilities for
    runtime/softfix.py (Miller events are single-bit flips, unlike FM0's
    adjacent pairs)."""
    bits, chip, _, rel = miller_detect(frame, index, h, cfg,
                                       cfg.epc_data_bits, eps0=eps0)
    return bits, chip, rel


miller_sync_batch = jax.vmap(miller_sync, in_axes=(0, None))
miller_sync_full_batch = jax.vmap(miller_sync_full, in_axes=(0, None))
miller_rn16_batch = jax.vmap(miller_rn16, in_axes=(0, 0, 0, None))
miller_rn16_soft_batch = jax.vmap(miller_rn16_soft, in_axes=(0, 0, 0, None))
miller_epc_batch = jax.vmap(miller_epc, in_axes=(0, 0, 0, None))
# Sync-seeded variants: the per-frame eps estimate rides along.
miller_rn16_soft_eps_batch = jax.vmap(
    lambda f, i, h, e, cfg: miller_rn16_soft(f, i, h, cfg, eps0=e),
    in_axes=(0, 0, 0, 0, None))
miller_epc_eps_batch = jax.vmap(
    lambda f, i, h, e, cfg: miller_epc(f, i, h, cfg, eps0=e),
    in_axes=(0, 0, 0, 0, None))
miller_epc_soft_eps_batch = jax.vmap(
    lambda f, i, h, e, cfg: miller_epc_soft(f, i, h, cfg, eps0=e),
    in_axes=(0, 0, 0, 0, None))
