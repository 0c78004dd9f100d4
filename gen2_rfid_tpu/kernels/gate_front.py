"""Pallas TPU kernel: fused gate front-end (FIR + |.| + windowed sums).

The gate's per-sample quantities (``gate_impl.cc:127-143``) are, in the
batch design, four separate array passes: matched-filter conv, amplitude,
the 100-sample amplitude moving sum, and the 48-sample complex DC moving
sum.  XLA fuses elementwise chains but not across its conv/reduce-window
boundaries, so each pass round-trips HBM.  This kernel computes all of them
in ONE pass over the ADC-rate input:

    x2 (2, N) f32  ->  y2 (2, Ny), amp (Ny,), avgsum (Ny,), dcsum2 (2, Ny)

per post-decimation sample (Ny = N // decim), with

    y[k]      = sum_{j<T} x[k*decim - (T-1) + j]        (boxcar matched filter,
                                                         zero history)
    amp[k]    = |y[k]|
    avgsum[k] = sum_{w<W} amp[k-w]                      (W = win_length)
    dcsum[k]  = sum_{w<D} y[k-w]                        (D = dc_length)

Design: 1-D grid over output blocks.  Each step loads its input slab plus a
left halo of (W+T/decim) samples from HBM, computes the FIR via the
polyphase reshape (decim phases x taps/decim shifted adds - all
VMEM-resident), then forms the windowed sums as shifted adds over the
in-register amplitude/IQ vectors.  Everything is (8, 128)-shaped f32; the
boxcar structure means no MXU is needed and arithmetic intensity stays high
enough that the kernel is HBM-bound on exactly one read of x and one write
of each output.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ReaderConfig


def _gate_front_kernel(
    x_ref, y_ref, amp_ref, avg_ref, dc_ref,
    *, decim: int, n_taps: int, win: int, dcw: int, block_y: int, halo_y: int,
):
    """One grid step: out block of ``block_y`` post-decim samples.

    x_ref block: (2, halo_x + block_x) where block_x = block_y*decim and
    halo_x = halo_y*decim + (n_taps-1), already positioned by the BlockSpec
    index map (the global input is left-padded so indices stay in range).
    """
    ext = halo_y + block_y                       # FIR outputs incl. halo
    x = x_ref[...]                               # (2, halo_x + block_x)

    # --- polyphase boxcar FIR + decimate on the extended range ---
    # y_ext[k] = sum_{j<T} x[k*decim + j], k in [0, ext)
    # with x locally indexed so that k=0 is the first halo output.
    acc_re = jnp.zeros((ext,), jnp.float32)
    acc_im = jnp.zeros((ext,), jnp.float32)
    base = jax.lax.broadcasted_iota(jnp.int32, (ext, 1), 0)[:, 0] * decim
    for j in range(n_taps):
        acc_re = acc_re + jnp.take(x[0], base + j, axis=0)
        acc_im = acc_im + jnp.take(x[1], base + j, axis=0)

    amp_ext = jnp.sqrt(acc_re * acc_re + acc_im * acc_im)

    # --- windowed sums as shifted adds over the extended vectors ---
    def moving(v_ext, w):
        out = jnp.zeros((block_y,), jnp.float32)
        for s in range(w):
            out = out + jax.lax.dynamic_slice(v_ext, (halo_y - s,), (block_y,))
        return out

    avg_ref[...] = moving(amp_ext, win)
    dc_ref[0, :] = moving(acc_re, dcw)
    dc_ref[1, :] = moving(acc_im, dcw)
    y_ref[0, :] = jax.lax.dynamic_slice(acc_re, (halo_y,), (block_y,))
    y_ref[1, :] = jax.lax.dynamic_slice(acc_im, (halo_y,), (block_y,))
    amp_ref[...] = jax.lax.dynamic_slice(amp_ext, (halo_y,), (block_y,))


@functools.partial(
    jax.jit, static_argnames=("decim", "n_taps", "win", "dcw", "block_y",
                              "interpret")
)
def gate_front(
    x2: jnp.ndarray,
    decim: int,
    n_taps: int,
    win: int,
    dcw: int,
    block_y: int = 2048,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused FIR/amp/moving-sum front-end.  x2: (2, N) planar f32.

    Returns (y2 (2, Ny), amp (Ny,), avgsum (Ny,), dcsum2 (2, Ny)) matching
    ``matched_filter_decimate`` + ``moving_sum`` / ``moving_sum_complex``
    exactly (same shifted-add accumulation over f32).
    """
    n = x2.shape[1]
    ny = n // decim
    halo_y = max(win, dcw)
    halo_x = halo_y * decim + (n_taps - 1)
    ny_pad = ((ny + block_y - 1) // block_y) * block_y

    # Left-pad with the zero history + halo; right-pad to the block grid.
    x_pad = jnp.pad(x2.astype(jnp.float32),
                    ((0, 0), (halo_x, (ny_pad - ny) * decim)))

    grid = (ny_pad // block_y,)
    block_x = block_y * decim
    kernel = functools.partial(
        _gate_front_kernel, decim=decim, n_taps=n_taps, win=win, dcw=dcw,
        block_y=block_y, halo_y=halo_y,
    )
    out_shape = (
        jax.ShapeDtypeStruct((2, ny_pad), jnp.float32),   # y2
        jax.ShapeDtypeStruct((ny_pad,), jnp.float32),     # amp
        jax.ShapeDtypeStruct((ny_pad,), jnp.float32),     # avgsum
        jax.ShapeDtypeStruct((2, ny_pad), jnp.float32),   # dcsum2
    )
    y2, amp, avg, dc2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (2, halo_x + block_x),
                lambda i: (0, i * block_x),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=(
            pl.BlockSpec((2, block_y), lambda i: (0, i * block_y),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_y,), lambda i: (i * block_y,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_y,), lambda i: (i * block_y,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, block_y), lambda i: (0, i * block_y),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(x_pad)
    return y2[:, :ny], amp[:ny], avg[:ny], dc2[:, :ny]


def gate_front_for_cfg(x2: jnp.ndarray, cfg: ReaderConfig, **kw):
    n_taps = int(cfg.tag_bit_us / 2 * cfg.adc_rate / 1e6 / cfg.miller_m)
    return gate_front(x2, cfg.decim, n_taps, cfg.win_length, cfg.dc_length, **kw)
