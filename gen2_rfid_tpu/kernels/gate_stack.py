"""Pallas TPU kernel: fused gate flag stack (amp -> avg -> edge flags).

The round-3 verdict's one remaining fusion candidate: after the
overlap-save FIR (which XLA wins on the MXU — measured round 2,
docs/PERF.md), the native gate (dsp/gate.py::gate_detect) computes from
``y``:

    amp        = |y|
    avg        = win_length moving sum of amp (threshold basis)
    above      = amp > avg * thresh_fraction / win
    rise       = above & ~above[-1]
    below_run  = (pw/2+1)-window count of ~above  -> qualify
    above_run  = (T1+1)-window count of above     -> marker, quiet_after

in XLA as an elementwise chain plus three dyadic windowed sums — each a
full-array HBM pass unless fused.  This kernel computes the whole stack
in ONE pass over the post-decimation samples and emits a single packed
int32 flag array (bit 0 rise, 1 qualify, 2 marker, 3 quiet_after), so
the downstream segmented pulse scan + trigger solve read one array
instead of recomputing five.

Shapes follow kernels/gate_front.py's recipe: input stays in HBM
(`pl.ANY`), each grid step DMAs its slab + left/right halo into VMEM
scratch (overlapping reads are inexpressible with blocked BlockSpecs);
windowed sums are static shifted adds over in-VMEM vectors (dyadic
doubling, identical f32 summation order to dsp/filters.run_sum).

Semantics pinned against gate_detect's native mode by
tests/test_kernels.py::test_gate_stack_flags_match_native.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ReaderConfig


def _kernel(y_hbm, flags_ref, buf, sem, *, win: int, pw_half: int, nt1: int,
            frac: float, block: int, lh: int, rh: int):
    ext = lh + block + rh
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(y_hbm.at[:, pl.ds(i * block, ext)], buf, sem)
    cp.start()
    cp.wait()

    y = buf[...]                                        # (2, ext)
    amp = jnp.sqrt(y[0] * y[0] + y[1] * y[1])[None, :]  # (1, ext)

    def shift(a, k):
        if k == 0:
            return a
        pad = jnp.zeros((a.shape[0], k), a.dtype)
        return jax.lax.concatenate([pad, a[:, :-k]], 1)

    def run(vec, w):
        # Dyadic doubling + binary combine, bit-identical f32 summation
        # order to dsp/filters.run_sum (gate_detect native's sums).
        pows = [vec]
        while (1 << len(pows)) <= w:
            p = pows[-1]
            pows.append(p + shift(p, 1 << (len(pows) - 1)))
        out = None
        off = 0
        for j in reversed(range(len(pows))):
            if w & (1 << j):
                term = shift(pows[j], off)
                out = term if out is None else out + term
                off += 1 << j
        return out

    msum = run(amp, win)
    # Same elementwise order as gate_detect: avg = msum/win; thresh = avg*frac.
    thresh = (msum / jnp.float32(win)) * jnp.float32(frac)
    above = amp > thresh
    prev_above = shift(above.astype(jnp.float32), 1) > 0.5
    rise = above & jnp.logical_not(prev_above)

    below_run = run(jnp.logical_not(prev_above).astype(jnp.float32),
                    pw_half + 1)
    # Mosaic iota must be integer-typed; convert after.
    gidx = (jnp.float32(i * block - lh)
            + jax.lax.broadcasted_iota(jnp.int32, (1, ext), 1)
            .astype(jnp.float32))
    need = jnp.minimum(jnp.float32(pw_half + 1), gidx)
    qualify = rise & (below_run >= need) & (gidx >= jnp.float32(pw_half))

    above_run = run(above.astype(jnp.float32), nt1 + 1)
    marker = above_run >= jnp.float32(nt1 + 1)
    # quiet_after[i] = above_run[i + nt1 + 1] filled with False past the
    # slab (the right halo covers nt1+1 <= rh for in-block positions).
    qshift = jax.lax.concatenate(
        [above_run[:, nt1 + 1:], jnp.zeros((1, nt1 + 1), jnp.float32)], 1)
    quiet = qshift >= jnp.float32(nt1 + 1)

    flags = (rise.astype(jnp.int32)
             + 2 * qualify.astype(jnp.int32)
             + 4 * marker.astype(jnp.int32)
             + 8 * quiet.astype(jnp.int32))
    flags_ref[...] = jax.lax.slice(flags, (0, lh), (1, lh + block))


@functools.partial(
    jax.jit,
    static_argnames=("win", "pw_half", "nt1", "frac", "block", "interpret"),
)
def gate_stack_flags(
    y2: jnp.ndarray,
    win: int,
    pw_half: int,
    nt1: int,
    frac: float,
    block: int = 8192,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused flag stack.  y2: (2, Ny) planar f32 post-decimation I/Q.

    Returns (Ny,) int32 packed flags (bit 0 rise, 1 qualify, 2 marker,
    3 quiet_after), matching dsp/gate.py::gate_detect native mode.
    """
    ny = y2.shape[1]
    lh = max(win, 128)                # avg lookback (win) dominates
    rh = -(-max(nt1 + 1, 1) // 128) * 128
    ny_pad = -(-max(ny, 1) // block) * block
    grid = (ny_pad // block,)
    # Zero history on the left; right pad covers the last block + halo.
    yp = jnp.pad(y2.astype(jnp.float32),
                 ((0, 0), (lh, ny_pad - ny + rh)))

    kernel = functools.partial(
        _kernel, win=win, pw_half=pw_half, nt1=nt1, frac=float(frac),
        block=block, lh=lh, rh=rh)
    flags = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, ny_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, lh + block + rh), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(yp)
    return flags[0, :ny]


def gate_stack_for_cfg(y2: jnp.ndarray, cfg: ReaderConfig, **kw) -> jnp.ndarray:
    return gate_stack_flags(
        y2, cfg.win_length, cfg.n_samples_pw // 2, cfg.n_samples_t1,
        cfg.thresh_fraction, **kw)


def native_flags_reference(y: jnp.ndarray, cfg: ReaderConfig) -> jnp.ndarray:
    """XLA reference for the same packed flags (the exact ops gate_detect
    native mode runs; used for equivalence tests and the A/B bench)."""
    from ..dsp.filters import run_sum

    i32 = jnp.int32
    n = y.shape[0]
    arange = jnp.arange(n, dtype=i32)
    amp = jnp.abs(y).astype(jnp.float32)
    msum = run_sum(amp, cfg.win_length)
    avg = msum / jnp.float32(cfg.win_length)
    thresh = avg * jnp.float32(cfg.thresh_fraction)
    above = amp > thresh
    prev_above = jnp.concatenate([jnp.zeros((1,), bool), above[:-1]])
    rise = above & jnp.logical_not(prev_above)
    pw_half = cfg.n_samples_pw // 2
    nt1 = cfg.n_samples_t1
    below_run = run_sum(jnp.logical_not(prev_above), pw_half + 1)
    need = jnp.minimum(jnp.float32(pw_half + 1), arange.astype(jnp.float32))
    qualify = rise & (below_run >= need) & (arange >= pw_half)
    above_run = run_sum(above, nt1 + 1)
    marker = above_run >= jnp.float32(nt1 + 1)
    shifted = jnp.concatenate(
        [above_run[nt1 + 1:], jnp.zeros((nt1 + 1,), jnp.float32)])
    quiet = shifted >= jnp.float32(nt1 + 1)
    return (rise.astype(i32) + 2 * qualify.astype(i32)
            + 4 * marker.astype(i32) + 8 * quiet.astype(i32))
