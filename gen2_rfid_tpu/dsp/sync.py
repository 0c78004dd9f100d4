"""Frame sync: preamble correlation and channel estimation.

Vectorized re-design of ``tag_decoder_impl::tag_sync``
(``tag_decoder_impl.cc:78-109``): the 15-offset x 12-half-bit correlation
becomes one gather + a tiny matmul per frame, batched over all frames with
``vmap`` so the whole sync stage is a single (F, 15, 12) x (12,) contraction.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TAG_PREAMBLE_BITS_PATTERN, ReaderConfig

# +-1 correlation template (tag_decoder_impl.cc:102).
_PREAMBLE_PM = np.array(TAG_PREAMBLE_BITS_PATTERN, dtype=np.float32) * 2.0 - 1.0
# Half-bit offsets of the six high preamble chips used for the channel
# estimate (tag_decoder_impl.cc:103): chips {0,1,3,6,10,11}.
_H_CHIPS = np.array([0, 1, 3, 6, 10, 11], dtype=np.int32)


def tag_sync(frame: jnp.ndarray, cfg: ReaderConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Locate the FM0 preamble and estimate the channel for one frame.

    frame: (W,) complex64 decode window.  Returns (data_index, h_est) where
    data_index points half a bit past the preamble end (the reference's
    ``max_index + TAG_PREAMBLE_BITS*T + T/2`` shift, tag_decoder_impl.cc:107).
    """
    half = cfg.n_samples_tag_bit / 2.0                      # float, ref semantics
    n_off = cfg.sync_search                                 # int(1.5 * T)
    n_hb = cfg.preamble_half_bits
    # Sample positions: off + int(j * half)  (tag_decoder_impl.cc:92
    # truncates).  Each half-bit contributes a contiguous offset run, so the
    # correlation is built from n_hb STATIC slices (no gather at all):
    # segs[j, off] = frame[hb_pos[j] + off].
    hb_pos = np.floor(np.arange(n_hb) * half).astype(np.int32)
    segs = jnp.stack(
        [jax.lax.slice(frame, (int(p),), (int(p) + n_off,)) for p in hb_pos]
    )                                                        # (n_hb, n_off)
    tmpl = jnp.asarray(_PREAMBLE_PM[:n_hb])
    corr = tmpl.astype(segs.real.dtype) @ segs               # (n_off,) complex
    power = jnp.real(corr) ** 2 + jnp.imag(corr) ** 2
    max_index = jnp.argmax(power).astype(jnp.int32)

    # Channel estimate: the high preamble chips k are exactly rows k of segs
    # (hb_pos[k] = floor(k*half)) at column max_index.
    h_est = jnp.mean(segs[jnp.asarray(_H_CHIPS), max_index])

    data_index = max_index + jnp.int32(
        int(cfg.tag_preamble_bits * cfg.n_samples_tag_bit + half)
    )
    return data_index, h_est


tag_sync_batch = jax.vmap(tag_sync, in_axes=(0, None))
