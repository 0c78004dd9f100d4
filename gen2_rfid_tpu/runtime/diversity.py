"""Multi-channel (antenna-diversity) capture decode: MRC pipeline driver.

Decodes C time-aligned RX channels of the SAME air interface coherently
(dsp/mrc.py): the gate triggers on the channel-summed amplitude, windows
are extracted and DC-corrected per channel, and every detection statistic
maximal-ratio combines across channels.  A fading null on one antenna no
longer loses the tag — the classic diversity gain the reference's single
RX chain cannot have (``apps/reader.py`` configures one usrp_source).

Batch/paranoid shape (both decode windows per event, like compat mode);
the role-specialized fast path can be added the same way as in
runtime/inventory.py if multi-channel throughput ever matters.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ReaderConfig
from ..dsp import mrc
from ..dsp.gate import _event_window_stats, gate_detect
from ..dsp.filters import matched_filter_decimate, moving_sum, run_sum
from .frames import gather_aligned_windows
from .inventory import (DecodedEvents, _tag_ids, check_epc_crc_batch,
                        classify_commands, classify_slots, matched_taps,
                        replay_inventory)
from .stats import InventoryStats


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode_capture_mrc_planar(
    iq2c: jnp.ndarray, cfg: ReaderConfig
) -> Tuple[InventoryStats, DecodedEvents, jnp.ndarray]:
    """iq2c: (C, 2, N) float32 planar ADC captures, one per RX channel,
    time-aligned (same TX, different antennas/paths).

    Returns (stats, events, h_chan) with h_chan (E, C, 2) float32: the
    per-event per-channel channel estimates - the interferometric
    observable (per-antenna backscatter phase) that
    ``runtime/ranging.py::estimate_aoa`` turns into an angle of arrival.
    """
    assert cfg.miller_m == 1, "MRC decode is FM0-only for now"
    taps = matched_taps(cfg)

    def fir_one(x2):
        return matched_filter_decimate(
            jax.lax.complex(x2[0], x2[1]), taps, cfg.decim)

    ys = jax.vmap(fir_one)(iq2c)                     # (C, Nd) complex
    n = ys.shape[1]
    i32 = jnp.int32

    # Gate on the channel-summed power envelope (commands are TX leak,
    # visible on every channel; replies add non-coherently).
    amp = jnp.sqrt(jnp.sum(jnp.real(ys) ** 2 + jnp.imag(ys) ** 2, axis=0))
    if cfg.mode == "compat":
        msum = moving_sum(amp, cfg.win_length)
    else:
        msum = run_sum(amp, cfg.win_length)
    avg = msum / jnp.float32(cfg.win_length)
    events = gate_detect(ys[0], cfg, amp=amp, avg=avg)
    cmd = classify_commands(events.n_pulses, cfg)
    ev_c = jnp.minimum(events.index, n - 1)

    # Per-channel DC / CW-noise stats at each event.
    dcs, nvs = jax.vmap(
        lambda y: _event_window_stats(y, ev_c, cfg.dc_length))(ys)

    w = cfg.epc_window

    def windows_one(y, dc):
        fr = gather_aligned_windows(y, events.index, w) - dc[:, None]
        return fr

    frames_c = jax.vmap(windows_one)(ys, dcs)        # (C, E, W+g)
    frames = jnp.swapaxes(frames_c, 0, 1)            # (E, C, W+g)
    magn2 = (jnp.real(frames) ** 2 + jnp.imag(frames) ** 2).astype(
        jnp.float32)

    index, h = mrc.tag_sync_mrc_batch(frames, cfg)   # (E,), (E, C)
    rn16_bits, margin = mrc.rn16_detect_mrc_batch(frames, index, h, cfg)
    epc_bits, t_half = mrc.epc_detect_mrc_batch(frames, magn2, index, h, cfg)
    epc_pass = check_epc_crc_batch(epc_bits)

    rn16_fits = events.valid & (events.index + cfg.rn16_window <= n)
    epc_fits = events.valid & (events.index + w <= n)
    energy = jnp.mean(jnp.sum(magn2[:, :, : cfg.rn16_window], axis=1),
                      axis=1)
    h2 = jnp.sum(jnp.real(h) ** 2 + jnp.imag(h) ** 2, axis=1)
    nv_sum = jnp.sum(nvs, axis=0)
    dec = DecodedEvents(
        index=events.index,
        valid=events.valid,
        rn16_fits=rn16_fits,
        epc_fits=epc_fits,
        rn16_bits=rn16_bits,
        epc_bits=epc_bits,
        epc_pass=epc_pass,
        tag_id=_tag_ids(epc_bits),
        t_half=t_half,
        h_est=jnp.stack([jnp.real(h[:, 0]), jnp.imag(h[:, 0])], axis=-1),
        slot_state=classify_slots(energy, margin, nv_sum, h2),
        rn16_energy=energy,
        rn16_margin=margin,
        cmd_type=cmd,
    )
    h_chan = jnp.stack([jnp.real(h), jnp.imag(h)], axis=-1)  # (E, C, 2)
    return replay_inventory(dec, cfg), dec, h_chan


def decode_capture_mrc(
    iq_channels, cfg: ReaderConfig
) -> Tuple[InventoryStats, DecodedEvents]:
    """Host-facing entry: iq_channels = sequence of complex (N,) captures."""
    return decode_capture_mrc_full(iq_channels, cfg)[:2]


def decode_capture_mrc_full(
    iq_channels, cfg: ReaderConfig
) -> Tuple[InventoryStats, DecodedEvents, jnp.ndarray]:
    """decode_capture_mrc + the (E, C, 2) per-channel channel estimates
    (AoA observable, see estimate_aoa)."""
    planar = jnp.asarray(np.stack([
        np.stack([np.asarray(x).real.astype(np.float32),
                  np.asarray(x).imag.astype(np.float32)])
        for x in iq_channels
    ]))
    return decode_capture_mrc_planar(planar, cfg)
