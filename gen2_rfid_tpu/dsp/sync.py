"""Frame sync: preamble correlation and channel estimation.

Vectorized re-design of ``tag_decoder_impl::tag_sync``
(``tag_decoder_impl.cc:78-109``): the 15-offset x 12-half-bit correlation
and the 6-chip channel estimate both become tiny +-1 / (1/6) selection
matmuls over the frame head — one (W0, n_off) weight matrix each, batched
over all frames, no gathers (per-frame scalar gathers serialize on TPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TAG_PREAMBLE_BITS_PATTERN, ReaderConfig
from .fm0 import SEL_PRECISION

# +-1 correlation template (tag_decoder_impl.cc:102).
_PREAMBLE_PM = np.array(TAG_PREAMBLE_BITS_PATTERN, dtype=np.float32) * 2.0 - 1.0
# Half-bit offsets of the six high preamble chips used for the channel
# estimate (tag_decoder_impl.cc:103): chips {0,1,3,6,10,11}.
_H_CHIPS = np.array([0, 1, 3, 6, 10, 11], dtype=np.int32)


@functools.lru_cache(maxsize=32)
def _sync_selection(cfg: ReaderConfig):
    """(span, n_off) correlation + channel-mean selection matrices.

    corr[off] = sum_j pm[j] * frame[floor(j*half) + off]   (S)
    h[off]    = mean_k     frame[floor(k*half) + off], k in _H_CHIPS  (Sh)
    """
    half = cfg.n_samples_tag_bit / 2.0
    n_off = cfg.sync_search
    n_hb = cfg.preamble_half_bits
    hb_pos = np.floor(np.arange(n_hb) * half).astype(np.int32)
    span = int(hb_pos[-1]) + n_off
    s = np.zeros((span, n_off), dtype=np.float32)
    sh = np.zeros((span, n_off), dtype=np.float32)
    offs = np.arange(n_off)
    for j in range(n_hb):
        np.add.at(s, (hb_pos[j] + offs, offs), _PREAMBLE_PM[j])
    chips = _H_CHIPS[_H_CHIPS < n_hb]
    for k in chips:
        np.add.at(sh, (hb_pos[k] + offs, offs), 1.0 / len(chips))
    return s, sh, span


def tag_sync(frame: jnp.ndarray, cfg: ReaderConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Locate the FM0 preamble and estimate the channel for one frame.

    frame: (W,) complex64 decode window.  Returns (data_index, h_est) where
    data_index points half a bit past the preamble end (the reference's
    ``max_index + TAG_PREAMBLE_BITS*T + T/2`` shift, tag_decoder_impl.cc:107).
    """
    half = cfg.n_samples_tag_bit / 2.0                      # float, ref semantics
    s_np, sh_np, span = _sync_selection(cfg)
    x = jax.lax.slice(frame, (0,), (span,))
    hi = SEL_PRECISION
    s = jnp.asarray(s_np)
    sh = jnp.asarray(sh_np)
    xr, xi = jnp.real(x), jnp.imag(x)
    corr_re = jnp.matmul(xr, s, precision=hi)
    corr_im = jnp.matmul(xi, s, precision=hi)
    power = corr_re ** 2 + corr_im ** 2
    max_index = jnp.argmax(power).astype(jnp.int32)

    # One-hot winner selection: the per-frame scalar gather h_all[max_index]
    # under vmap is the v5e serialization poison; the contraction selects
    # the identical value (sums over exact zeros).
    onehot = (jnp.arange(power.shape[0]) == max_index).astype(jnp.float32)
    h_est = jax.lax.complex(
        jnp.dot(onehot, jnp.matmul(xr, sh, precision=hi), precision=hi),
        jnp.dot(onehot, jnp.matmul(xi, sh, precision=hi), precision=hi),
    )

    data_index = max_index + jnp.int32(
        int(cfg.tag_preamble_bits * cfg.n_samples_tag_bit + half)
    )
    return data_index, h_est


tag_sync_batch = jax.vmap(tag_sync, in_axes=(0, None))
