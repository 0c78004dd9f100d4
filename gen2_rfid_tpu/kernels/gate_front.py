"""Pallas TPU kernel: fused gate front-end (FIR + |.| + windowed sums).

The gate's per-sample quantities (``gate_impl.cc:127-143``) are, in the
batch design, four separate array passes: matched-filter conv, amplitude,
the 100-sample amplitude moving sum, and the 48-sample complex DC moving
sum.  XLA fuses elementwise chains but not across its conv/reduce-window
boundaries, so each pass round-trips HBM.  This kernel computes all of them
in ONE pass over the (phase-split) ADC-rate input:

    x2 (2, N) f32  ->  y2 (2, Ny), amp (Ny,), avgsum (Ny,), dcsum2 (2, Ny)

per post-decimation sample (Ny = N // decim), with

    y[k]      = sum_{j<T} x[k*decim - (T-1) + j]   (boxcar, zero history)
    amp[k]    = |y[k]|
    avgsum[k] = sum_{w<W} amp[k-w]                 (W = win_length)
    dcsum[k]  = sum_{w<D} y[k-w]                   (D = dc_length)

Design notes (Mosaic-shaped):

* the polyphase decomposition x[k*decim+b] happens OUTSIDE the kernel as an
  XLA transpose to (decim, 2, N/decim) - Mosaic rejects minor-dim=decim
  reshapes in-kernel; after the split every tap is a contiguous 2-D slice;
* the input stays in HBM (`pltpu.ANY`); each grid step DMAs its slab plus a
  left halo into VMEM scratch (overlapping reads are inexpressible with
  blocked BlockSpecs);
* windowed sums are static shifted adds over the in-VMEM extended vectors;
  all arrays are rank >= 2 with the long axis minor.
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


def _kernel(
    ph_hbm, y_ref, amp_ref, avg_ref, dc_ref, buf, sem,
    *, decim: int, n_taps: int, win: int, dcw: int, block_y: int, halo_y: int,
):
    ext = halo_y + block_y
    # DMA slice lengths along the minor dim must be 128-aligned on TPU.
    slab = ext + 128
    i = pl.program_id(0)

    cp = pltpu.make_async_copy(
        ph_hbm.at[:, :, pl.ds(i * block_y, slab)], buf, sem
    )
    cp.start()
    cp.wait()

    # Polyphase FIR: tap j = a*decim + b reads buf[b, :, a : a + ext].
    acc = jnp.zeros((2, ext), jnp.float32)
    for j in range(n_taps):
        a, b = divmod(j, decim)
        acc = acc + jax.lax.slice(buf[b], (0, a), (2, a + ext))

    amp_ext = jnp.sqrt(acc[0] * acc[0] + acc[1] * acc[1])[None, :]  # (1, ext)

    def moving(mat, w):
        # mat: (r, ext) -> (r, block_y) causal windowed sum.
        r = mat.shape[0]
        out = jax.lax.slice(mat, (0, halo_y), (r, halo_y + block_y))
        for s in range(1, w):
            out = out + jax.lax.slice(
                mat, (0, halo_y - s), (r, halo_y - s + block_y)
            )
        return out

    avg_ref[...] = moving(amp_ext, win)
    dc_ref[...] = moving(acc, dcw)
    y_ref[...] = jax.lax.slice(acc, (0, halo_y), (2, halo_y + block_y))
    amp_ref[...] = jax.lax.slice(amp_ext, (0, halo_y), (1, halo_y + block_y))


@functools.partial(
    jax.jit,
    static_argnames=("decim", "n_taps", "win", "dcw", "block_y", "interpret"),
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

    Matches ``matched_filter_decimate`` + ``moving_sum`` /
    ``moving_sum_complex`` up to f32 summation order.
    """
    n = x2.shape[1]
    ny = n // decim
    halo_y = max(win, dcw, 128)
    ext = halo_y + block_y
    ny_pad = ((max(ny, 1) + block_y - 1) // block_y) * block_y
    grid = (ny_pad // block_y,)

    # Zero history for taps + window lookback, then right-pad so the phase
    # view covers every slab: phases[b][p] = x_pad[p*decim + b], p up to
    # ny_pad + ext + 128 (the 128-aligned DMA slab overhang).
    left = halo_y * decim + (n_taps - 1)
    p_len = ny_pad + ext + 128
    right = p_len * decim - (left + n)
    x_pad = jnp.pad(x2.astype(jnp.float32), ((0, 0), (left, max(right, 0))))
    phases = (
        x_pad[:, : p_len * decim].reshape(2, p_len, decim).transpose(2, 0, 1)
    )  # (decim, 2, p_len)

    kernel = functools.partial(
        _kernel, decim=decim, n_taps=n_taps, win=win, dcw=dcw,
        block_y=block_y, halo_y=halo_y,
    )
    out_shape = (
        jax.ShapeDtypeStruct((2, ny_pad), jnp.float32),
        jax.ShapeDtypeStruct((1, ny_pad), jnp.float32),
        jax.ShapeDtypeStruct((1, ny_pad), jnp.float32),
        jax.ShapeDtypeStruct((2, ny_pad), jnp.float32),
    )
    y2, amp, avg, dc2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((2, block_y), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_y), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_y), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, block_y), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((decim, 2, ext + 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(phases)
    return y2[:, :ny], amp[0, :ny], avg[0, :ny], dc2[:, :ny]


def gate_front_for_cfg(x2: jnp.ndarray, cfg: ReaderConfig, **kw):
    n_taps = int(cfg.tag_bit_us / 2 * cfg.adc_rate / 1e6 / cfg.miller_m)
    return gate_front(x2, cfg.decim, n_taps, cfg.win_length, cfg.dc_length, **kw)
