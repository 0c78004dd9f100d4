"""Matched filter + decimation and causal moving-window sums.

TPU-native replacement for the stock GNU Radio ``filter.fir_filter_ccc``
(instantiated at ``apps/reader.py:75`` with 25 boxcar taps, decimation 5: the
half-FM0-symbol matched filter).  Instead of a per-sample FIR loop this maps
onto XLA's strided convolution (which tiles onto the MXU) with the GNU Radio
history convention: ``ntaps-1`` zeros precede the first input, so
``y[k] = sum_j taps[j] * x[k*decim - (ntaps-1) + j]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _conv1d(x: jnp.ndarray, taps: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Real-valued strided convolution of a batch of 1-D signals.

    x: (B, N) float32, taps: (T,) float32 -> (B, (N - T)//stride + 1).
    """
    b, n = x.shape
    t = taps.shape[0]
    out = jax.lax.conv_general_dilated(
        x[:, None, :],                    # (B, C=1, N)
        taps[None, None, ::-1],           # (O=1, I=1, T) - conv flips, we want corr
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out[:, 0, :]


def matched_filter_decimate(
    iq: jnp.ndarray, taps: np.ndarray | jnp.ndarray, decim: int,
    block_out: int = 8192,
) -> jnp.ndarray:
    """Complex FIR + decimate with GNU Radio history alignment.

    iq: (N,) complex64 at ADC rate -> ((N // decim,) complex64 at ADC/decim.
    Real taps (matched filters for FM0/Miller are real); real and imaginary
    parts ride through one batched strided conv.

    Long inputs are re-blocked into overlap-save rows of ``block_out``
    outputs each (halo = ntaps-1, gather-free shifted-tail concat) so the
    conv sees a large batch dimension instead of a degenerate batch-2
    single-channel problem - numerically identical (same windows, same conv
    op), measured ~3x faster on v5e.
    """
    taps = jnp.asarray(taps, dtype=jnp.float32)
    t = taps.shape[0]
    n = iq.shape[0]
    x = jnp.stack([jnp.real(iq), jnp.imag(iq)]).astype(jnp.float32)  # (2, N)
    n_out = n // decim
    block_in = block_out * decim
    if n >= 2 * block_in and t - 1 <= block_in:
        nb = -(-n // block_in)
        xb = jnp.pad(x, ((0, 0), (0, nb * block_in - n)))
        blocks = xb.reshape(2, nb, block_in)
        heads = jnp.pad(blocks[:, :-1, block_in - (t - 1):],
                        ((0, 0), (1, 0), (0, 0)))  # zero history for row 0
        ext = jnp.concatenate([heads, blocks], axis=2)  # (2, nb, bi + t - 1)
        y = _conv1d(ext.reshape(2 * nb, block_in + t - 1), taps, decim)
        y = y.reshape(2, nb * block_out)[:, :n_out]
        return jax.lax.complex(y[0], y[1])
    x = jnp.pad(x, ((0, 0), (t - 1, 0)))  # GNU Radio zero history
    # Truncate so output length == N // decim (gr decimator semantics).
    y = _conv1d(x, taps, decim)[:, :n_out]
    return jax.lax.complex(y[0], y[1])


def moving_sum(x: jnp.ndarray, win: int, block: int = 8192) -> jnp.ndarray:
    """Causal moving-window sum: out[i] = sum(x[i-win+1 .. i]), zero-padded.

    Replaces the gate's incremental circular-buffer running sums
    (``gate_impl.cc:131-133`` amplitude window, ``:141-143`` DC window).

    TPU-shaped implementation: a single-channel length-N conv lowers very
    poorly on TPU (the gate front-end measured ~15x slower than roofline),
    so the signal is re-blocked into overlapping (nb, halo+block) tiles and
    the windowed sum becomes a *local* cumulative-sum difference - local, so
    there is no long-cumsum float drift (each tile's accumulator spans at
    most halo+block values), and the minor axis is long, which the VPU
    likes.
    """
    x = x.astype(jnp.float32)
    n = x.shape[0]
    if n == 0:
        return x
    halo = max(win, 1)
    ext = _overlap_blocks(x, block, halo)          # (nb, halo + block)
    c = jnp.cumsum(ext, axis=1)
    ms = c[:, halo:] - c[:, halo - win : halo + block - win]
    return ms.reshape(-1)[:n]


def _overlap_blocks(x: jnp.ndarray, block: int, halo: int) -> jnp.ndarray:
    """(nb, halo+block) overlapping view of a 1-D array, gather-free.

    ext[i] = x[i*block - halo : i*block + block] with zero padding outside;
    built from reshapes + a shifted-tail concat (XLA gathers are slow on
    TPU and would dominate the windowed-sum pipeline).
    """
    assert halo <= block, (halo, block)
    n = x.shape[0]
    nb = -(-n // block)
    xp = jnp.pad(x, (0, nb * block - n))
    blocks = xp.reshape(nb, block)
    tails = jnp.pad(blocks[:-1, block - halo:], ((1, 0), (0, 0)))
    return jnp.concatenate([tails, blocks], axis=1)


def moving_sum_complex(x: jnp.ndarray, win: int) -> jnp.ndarray:
    re = moving_sum(jnp.real(x), win)
    im = moving_sum(jnp.imag(x), win)
    return jax.lax.complex(re, im)


def boxcar_taps(n: int) -> np.ndarray:
    """The reference's matched filter: [1]*n (apps/reader.py:65)."""
    return np.ones(n, dtype=np.float32)


def run_sum(x01: jnp.ndarray, win: int) -> jnp.ndarray:
    """Causal windowed sum of a 0/1 indicator, via dyadic doubling.

    out[i] = sum(x01[i-win+1 .. i]) exactly (integer-valued f32 sums are
    order-independent), in ceil(log2 win) shifted adds plus popcount(win)-1
    combines - flat shifts XLA fuses into a handful of passes, vs the
    O(log n) full-array passes of the blocked-cumsum ``moving_sum``.  Used
    for the gate's pulse-width / T1-quiet run lengths (gate_impl.cc:148-180
    semantics); NOT for amplitude sums, where summation order changes f32
    results and compat mode pins the reference's order.
    """
    x = x01.astype(jnp.float32)

    def shifted(a, s):
        return jnp.pad(a, (s, 0))[: a.shape[0]] if s else a

    pows = [x]
    while (1 << len(pows)) <= win:
        p = pows[-1]
        pows.append(p + shifted(p, 1 << (len(pows) - 1)))
    out = None
    off = 0
    for j in reversed(range(len(pows))):
        if win & (1 << j):
            term = shifted(pows[j], off)
            out = term if out is None else out + term
            off += 1 << j
    return out
