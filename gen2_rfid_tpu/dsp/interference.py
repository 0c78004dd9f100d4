"""Capture-level CW interferer cancellation (new capability).

Dense-reader deployments put other readers' carriers inside the listen
channel.  Miller-M rejects tones away from its subcarrier by template
integration (docs/PERF.md; tests/test_dense_reader.py), but a tone
sitting ON the subcarrier (e.g. the round-5 sweep's M=2 cells: the
interferer at exactly M*BLF/2) is integrated coherently and cannot be
separated by any per-frame filter — the tag reply and the tone share a
frequency.  What DOES separate them is time coherence: a reader carrier
is phase-continuous over the whole capture, while backscatter exists
only inside reply windows.  So the canceller estimates each tone
globally and subtracts it from the raw capture before the front end:

1. coarse frequency from the peak of one full-capture FFT (DC/carrier
   bins masked — the wanted CW sits at baseband 0);
2. frequency refinement from the projection phase difference between the
   two capture halves (delta-phi / (2*pi*T/2): sub-mHz at capture SNR,
   which keeps the subtraction coherent over seconds — a raw FFT bin
   alone would drift ~1 rad over the capture);
3. amplitude/phase by least squares (one exact complex projection);
4. a guard: cancel only when the peak exceeds ``min_excess_db`` over the
   median off-DC spectrum — clean captures (no tone) are left untouched,
   so the flag is safe to leave on (pinned by tests/test_interference.py:
   the golden tuple is byte-identical with the flag enabled).

Everything is static-shape and jit-safe (pow2-padded FFT, fixed
``n_tones`` loop, planar float32 in/out); enabled by
``ReaderConfig.cancel_cw = n_tones`` inside ``decode_capture_planar``
(runtime/inventory.py), CLI ``decode --cancel-cw N``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Fraction of the spectrum around DC treated as the wanted carrier
# (baseband CW + PIE command energy + backscatter DSB lobes live within
# a few x BLF of DC; an adjacent reader's CW is further out).  At the
# default 2 Msps ADC rate this masks +-20 kHz.
_DC_MASK_FRAC = 0.01


def _pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@functools.partial(jax.jit, static_argnames=("n_tones", "min_excess_db"))
def cancel_cw_planar(x2: jnp.ndarray, n_tones: int = 1,
                     min_excess_db: float = 15.0) -> jnp.ndarray:
    """Estimate and subtract up to ``n_tones`` strong CW tones.

    x2: planar (2, N) float32.  Returns the cleaned planar capture;
    bit-identical input when no tone clears the guard.
    """
    n = x2.shape[1]
    nf = _pow2(n)
    x = jax.lax.complex(x2[0], x2[1])
    t = jnp.arange(n, dtype=jnp.float32)

    half = n // 2
    guard_lin = jnp.float32(10.0 ** (min_excess_db / 20.0))

    def one_tone(x, _):
        xf = jnp.fft.fft(x, n=nf)
        mag = jnp.abs(xf)
        k = jnp.arange(nf)
        dc_w = int(max(1, round(nf * _DC_MASK_FRAC)))
        near_dc = (k < dc_w) | (k >= nf - dc_w)
        magm = jnp.where(near_dc, 0.0, mag)
        kpk = jnp.argmax(magm)
        peak = magm[kpk]
        # Median of the off-DC spectrum (subsampled 16x: the median of a
        # broadband floor is insensitive to decimation, the full sort is
        # not worth paying on a 16M-bin FFT).
        med = jnp.nanmedian(jnp.where(near_dc, jnp.nan, mag)[::16])
        accept = peak > guard_lin * med
        # Coarse normalized frequency (cycles/sample), signed.
        f0 = jnp.where(kpk <= nf // 2, kpk, kpk - nf) / jnp.float32(nf)
        # Refine: projection phase of each capture half onto f0; the
        # phase advance between half centers gives the frequency error.
        rot = jnp.exp(-2j * jnp.pi * f0 * t)
        z = x * rot
        p1 = jnp.sum(z[:half])
        p2 = jnp.sum(z[half: 2 * half])
        dphi = jnp.angle(p2 * jnp.conj(p1))
        f = f0 + dphi / (2.0 * jnp.pi * half)
        # LS amplitude/phase at the refined frequency (exact projection).
        e = jnp.exp(-2j * jnp.pi * f * t)
        c = jnp.sum(x * e) / n
        tone = jnp.where(accept, c, 0.0) * jnp.conj(e)
        return x - tone, None

    x, _ = jax.lax.scan(one_tone, x, None, length=n_tones)
    return jnp.stack([jnp.real(x), jnp.imag(x)]).astype(jnp.float32)


def cancel_cw(iq, n_tones: int = 1, min_excess_db: float = 15.0):
    """Host convenience: complex capture in/out."""
    iq = np.asarray(iq)
    x2 = jnp.asarray(np.stack([iq.real, iq.imag]).astype(np.float32))
    out = np.asarray(cancel_cw_planar(x2, n_tones, min_excess_db))
    return (out[0] + 1j * out[1]).astype(np.complex64)
