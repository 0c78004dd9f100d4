"""Maximal-ratio combining across RX channels (antenna diversity).

New capability with no reference analogue: the reference hardware uses two
antennas but only one RX chain (``README.md:96-100``, `apps/reader.py`
configures a single usrp_source) — a fading null on that one path loses
the tag.  Here any number of time-aligned RX channels decode coherently:

* sync: the preamble correlation POWER sums across channels (non-coherent
  across channels, coherent within each), so the peak survives any single
  channel's null;
* channel estimates h_c per channel from the shared peak offset;
* detection: the per-channel differential samples d_c project onto their
  own h_c and the real parts add — exactly the maximal-ratio statistic
  Σ_c Re(d_c conj(h_c)), giving the classic array gain (~3 dB for two
  equal-power channels, more when one channel is faded);
* the EPC period grid sums |frame|² across channels.

Everything reuses the single-channel selection matrices (sync.py, fm0.py)
batched over a leading channel axis — the combining itself is a sum.
FM0 only for now (the Miller path combines the same way if needed).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ReaderConfig
from . import fm0, sync


def tag_sync_mrc(
    frames: jnp.ndarray, cfg: ReaderConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """frames: (C, W) complex64, one row per RX channel, time-aligned.

    Returns (data_index, h_est (C,) complex): one shared sync offset from
    the channel-summed correlation power, per-channel h estimates.
    """
    s_np, sh_np, span = sync._sync_selection(cfg)
    x = jax.lax.slice(frames, (0, 0), (frames.shape[0], span))
    hi = fm0.SEL_PRECISION
    s = jnp.asarray(s_np)
    xr, xi = jnp.real(x), jnp.imag(x)
    cr = jnp.matmul(xr, s, precision=hi)             # (C, n_off)
    ci = jnp.matmul(xi, s, precision=hi)
    power = jnp.sum(cr ** 2 + ci ** 2, axis=0)       # (n_off,)
    max_index = jnp.argmax(power).astype(jnp.int32)
    sh = jnp.asarray(sh_np)
    h_all = jax.lax.complex(
        jnp.matmul(xr, sh, precision=hi), jnp.matmul(xi, sh, precision=hi)
    )                                                 # (C, n_off)
    h_est = h_all[:, max_index]
    half = cfg.n_samples_tag_bit / 2.0
    data_index = max_index + jnp.int32(
        int(cfg.tag_preamble_bits * cfg.n_samples_tag_bit + half))
    return data_index, h_est


def _mrc_signs(d: jnp.ndarray, h: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """d: (C, K) complex differential samples, h: (C,) channel estimates.
    Returns (signs (K,), combined statistic (K,))."""
    stat = jnp.sum(jnp.real(d * jnp.conj(h)[:, None]), axis=0)
    return jnp.where(stat > 0, jnp.int32(1), jnp.int32(-1)), stat


def rn16_detect_mrc(
    frames: jnp.ndarray, index: jnp.ndarray, h_est: jnp.ndarray,
    cfg: ReaderConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(C, W) frames -> (16 bits, margin) via the MRC statistic."""
    sel_span = fm0._rn16_selection_matrix(cfg)
    d = jax.vmap(
        lambda f: fm0._aligned_diff_samples(f, index, sel_span)
    )(frames)                                          # (C, 16)
    signs, stat = _mrc_signs(d, h_est)
    h2 = jnp.sum(jnp.real(h_est) ** 2 + jnp.imag(h_est) ** 2)
    margin = jnp.mean(jnp.abs(stat)) / jnp.maximum(h2, 1e-12)
    return fm0._diff_decode(signs), margin


def epc_detect_mrc(
    frames: jnp.ndarray, magn2: jnp.ndarray, index: jnp.ndarray,
    h_est: jnp.ndarray, cfg: ReaderConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(C, W) frames + (C, W) |.|^2 -> (128 bits, t_half) with the period
    grid run on the channel-summed energy and MRC bit decisions."""
    cand, _ = fm0.epc_period_grid(cfg)
    w = magn2.shape[1]
    hi = fm0.SEL_PRECISION
    m2sum = jnp.sum(magn2, axis=0)                    # (W,)
    s_all_np, b0, steps, n_off = fm0._energy_selection_all(cfg, w)
    if s_all_np is not None:
        e_all = jnp.matmul(m2sum, jnp.asarray(s_all_np), precision=hi)
        o = jnp.clip(index - b0, 0, n_off - 1)
        energy = jax.lax.dynamic_slice(e_all, (o * steps,), (steps,))
    else:
        sel, k = fm0._energy_selection_matrix(cfg)
        a_start = jnp.minimum(index, w - k)
        aligned = jax.lax.dynamic_slice(m2sum, (a_start,), (k,))
        energy = jnp.matmul(aligned, jnp.asarray(sel), precision=hi)
    t_sel = jnp.argmax(energy)
    t_half = jnp.asarray(cand)[t_sel]

    sel_d, span, steps_b, nb = fm0._bit_selection_matrix(cfg)
    sl_start = jnp.minimum(index, w - span)
    sl = jax.lax.dynamic_slice(
        frames, (0, sl_start), (frames.shape[0], span))
    dj = jnp.asarray(sel_d)
    d_re = jnp.matmul(jnp.real(sl), dj, precision=hi).reshape(
        frames.shape[0], steps_b, nb)
    d_im = jnp.matmul(jnp.imag(sl), dj, precision=hi).reshape(
        frames.shape[0], steps_b, nb)
    d = jax.lax.complex(d_re[:, t_sel], d_im[:, t_sel])  # (C, 128)
    signs, _ = _mrc_signs(d, h_est)
    return fm0._diff_decode(signs), t_half


tag_sync_mrc_batch = jax.vmap(tag_sync_mrc, in_axes=(0, None))
rn16_detect_mrc_batch = jax.vmap(rn16_detect_mrc, in_axes=(0, 0, 0, None))
epc_detect_mrc_batch = jax.vmap(epc_detect_mrc, in_axes=(0, 0, 0, 0, None))
