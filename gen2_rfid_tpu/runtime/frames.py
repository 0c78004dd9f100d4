"""Decode-window extraction from gated command events.

Replaces the gate's streaming forward-and-close path
(``gate_impl.cc:183-195``): instead of emitting one variable-length window at
a time, all candidate windows are gathered at once as a fixed-shape
(max_events, epc_window) batch (the XLA static-shape idiom), DC-corrected
with the per-event estimate, with the |.|^2 side channel
(``magn_squared_samples``, gate_impl.cc:170-186) computed alongside.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import ReaderConfig
from ..dsp.gate import GateEvents

# Window starts are rounded down to multiples of this granule so frame
# extraction gathers whole rows of a reshaped view (one gather index per
# GRANULE samples instead of per sample - XLA scalar gathers are slow on
# TPU).  The residual 0..GRANULE-1 start offset is absorbed by the
# decoder's preamble sync search, whose slack covers reply-start jitter.
GRANULE = 8


def gather_aligned_windows(y: jnp.ndarray, starts: jnp.ndarray, width: int):
    """(len(starts), width + GRANULE) windows at starts rounded down to the
    granule; out-of-range rows clamp to the last row (masked by fits flags
    downstream)."""
    g = GRANULE
    n = y.shape[0]
    n_rows = -(-n // g)
    yp = jnp.pad(y, (0, n_rows * g - n)).reshape(n_rows, g)
    w_rows = width // g + 2
    r0 = jnp.maximum(starts, 0) // g
    rows = jnp.minimum(
        r0[:, None] + jnp.arange(w_rows, dtype=jnp.int32)[None, :], n_rows - 1
    )
    out = yp[rows]                                   # (E, w_rows, g)
    return out.reshape(starts.shape[0], w_rows * g)[:, : width + g]


def gather_aligned_windows_multi(
    y_c: jnp.ndarray, starts: jnp.ndarray, chans: jnp.ndarray, width: int
):
    """Channel-aware aligned window gather: event e reads
    ``gather_aligned_windows(y_c[chans[e]], starts[e], width)`` — same
    per-channel row clamp, bit-identical values — but as ONE flat row
    gather over the (C * n_rows, GRANULE) view.  A per-channel vmap of the
    single-channel gather adds a batch dimension to the gather operand
    lattice, which v5e lowers ~2x slower (docs/PERF.md round-5 wideband
    isolation); folding the channel into the row index keeps the flagship's
    2-D gather shape at any channel count."""
    g = GRANULE
    c, n = y_c.shape
    n_rows = -(-n // g)
    yp = jnp.pad(y_c, ((0, 0), (0, n_rows * g - n))).reshape(c * n_rows, g)
    w_rows = width // g + 2
    r0 = jnp.maximum(starts, 0) // g
    rows = jnp.minimum(
        r0[:, None] + jnp.arange(w_rows, dtype=jnp.int32)[None, :], n_rows - 1
    ) + chans[:, None] * n_rows
    out = yp[rows]                                   # (E, w_rows, g)
    return out.reshape(starts.shape[0], w_rows * g)[:, : width + g]


def extract_windows(
    y: jnp.ndarray, events: GateEvents, cfg: ReaderConfig
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gather DC-corrected decode windows for all events.

    Returns (frames (E, epc_window + GRANULE) complex64, matching magn2,
             rn16_fits (E,) bool, epc_fits (E,) bool).

    Windows are gathered at the maximum (EPC) length; an RN16 decode only
    reads indices < rn16_window so the tail is harmless.  ``*_fits`` mirror
    the reference's "process only once n_samples_to_ungate are buffered"
    precondition (tag_decoder_impl.cc:223,291).
    """
    n = y.shape[0]
    w = cfg.epc_window
    frames = gather_aligned_windows(y, events.index, w) - events.dc[:, None]
    magn2 = jnp.real(frames) ** 2 + jnp.imag(frames) ** 2
    rn16_fits = events.valid & (events.index + cfg.rn16_window <= n)
    epc_fits = events.valid & (events.index + w <= n)
    return frames, magn2.astype(jnp.float32), rn16_fits, epc_fits
