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

import jax.numpy as jnp

from ..config import ReaderConfig
from ..dsp.gate import GateEvents


def extract_windows(
    y: jnp.ndarray, events: GateEvents, cfg: ReaderConfig
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gather DC-corrected decode windows for all events.

    Returns (frames (E, epc_window) complex64,
             magn2 (E, epc_window) float32,
             rn16_fits (E,) bool, epc_fits (E,) bool).

    Windows are gathered at the maximum (EPC) length; an RN16 decode only
    reads indices < rn16_window so the tail is harmless.  ``*_fits`` mirror
    the reference's "process only once n_samples_to_ungate are buffered"
    precondition (tag_decoder_impl.cc:223,291).
    """
    n = y.shape[0]
    w = cfg.epc_window
    pos = events.index[:, None] + jnp.arange(w, dtype=jnp.int32)[None, :]
    pos_c = jnp.minimum(pos, n - 1)
    frames = y[pos_c] - events.dc[:, None]
    magn2 = jnp.real(frames) ** 2 + jnp.imag(frames) ** 2
    rn16_fits = events.valid & (events.index + cfg.rn16_window <= n)
    epc_fits = events.valid & (events.index + w <= n)
    return frames, magn2.astype(jnp.float32), rn16_fits, epc_fits
