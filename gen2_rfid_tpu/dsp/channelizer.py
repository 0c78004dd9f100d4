"""Polyphase filterbank channelizer: wideband capture -> per-reader channels.

New capability (no reference analogue): the reference front end is one USRP
tuned to a single 2 Msps channel (``gr-rfid/apps/reader.py:17-43,53``).  A
TPU-scale deployment instead records ONE wideband capture spanning many
FCC-hop channels (e.g. 16 Msps covering eight 2 MHz channels) and splits it
into per-channel baseband streams on-device, feeding the framework's
channel-parallel mesh axis (shard/mesh.py) - dense-reader monitoring without
per-channel radios.

TPU-first formulation: the classic analysis PFB
(mix-down -> lowpass -> decimate per channel) is rearranged so all N channels
share one grouped strided convolution plus one small FFT:

    y_k[m] = sum_j h[j] x[mN - j] e^{+j 2 pi k j / N}            (exactly the
           = N * IFFT_p( u_p[m] )[k]                              mixed+filtered+
    u_p[m] = sum_r h[p + rN] x[(m - r)N - p]                      decimated stream)

so the per-sample mixers disappear (the decimated mixer phase
e^{-j 2 pi k mN / N} = 1), the branch filters run as ONE blocked
overlap-save selection matmul on the MXU (round 5; the tap-shift loop's
(M, N) arrays ran at 1/16 v5e lane utilization and a depthwise grouped
conv misses the MXU entirely - five formulations measured in
docs/PERF.md, tools/tpu_prof_wideband.py), and the N-point IDFT over
branches is one N x N matmul.  Channel k sits at center frequency
k * (rate/N), FFT order (k >= N/2 are negative offsets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Output rows (decimated samples m) per selection-matmul block in the
# branch-filter stage; 128 puts whole (8, 128) v5e tiles on both matmul
# axes (columns = 128 m-rows x 8 branches = 1024 lanes).
_TAP_BLOCK = 128


@functools.lru_cache(maxsize=8)
def _tap_selection(n_chan: int, taps_per_branch: int):
    """(ext, out) branch-filter selection matrix for one output block.

    Column i*N+q of the matmul computes u_q[m0+i] = sum_r h_q[r] *
    s2[m0+i-r, q] from the block's extended commutator slab (T-1 history
    rows + B rows, flattened (m', q) -> m'*N + q).  One dense MXU matmul
    replaces the 12 tap-shift multiply-adds on (M, N) arrays whose
    N-element minor dimension ran at 1/16 lane utilization - the whole
    12 ms PFB cost on v5e (docs/PERF.md round-5 isolation: pfb_taps
    11.96 of pfb 12.19 ms; the flat-shift and dense-conv and Pallas-free
    alternatives all measured worse).
    """
    t = taps_per_branch
    h_np = pfb_taps(n_chan, t)
    # Row q of hpq is branch N-1-q (the unreversed-commutator column
    # order, see channelize_planar).
    hpq = np.ascontiguousarray(h_np.reshape(t, n_chan).T[::-1, :])  # (N, T)
    b = _TAP_BLOCK
    ext_rows = b + t - 1
    sel = np.zeros((ext_rows * n_chan, b * n_chan), dtype=np.float32)
    for i in range(b):
        for q in range(n_chan):
            for r in range(t):
                sel[(i - r + t - 1) * n_chan + q, i * n_chan + q] = hpq[q, r]
    return sel


def pfb_taps(n_chan: int, taps_per_branch: int = 12) -> np.ndarray:
    """Hamming-windowed-sinc prototype lowpass for an N-channel PFB.

    Length n_chan * taps_per_branch, cutoff at half the channel spacing
    (normalized fc = 1/(2N) of the input rate), unity DC gain - a CW carrier
    at a channel center passes with amplitude ~1 so the downstream gate's
    absolute thresholds behave as they would on a single-channel capture.
    """
    length = n_chan * taps_per_branch
    t = np.arange(length, dtype=np.float64) - (length - 1) / 2.0
    h = np.sinc(t / n_chan) / n_chan           # 2*fc*sinc(2*fc*t), fc=1/(2N)
    h *= np.hamming(length)
    h /= h.sum()                               # unity gain at DC
    return h.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_chan", "taps_per_branch"))
def channelize_planar(
    iq2: jnp.ndarray, n_chan: int, taps_per_branch: int = 12
) -> jnp.ndarray:
    """Split a planar (2, N) wideband capture into (n_chan, 2, N//n_chan).

    Channel k is numerically the mix-down by k/n_chan of the input rate,
    prototype-lowpass filter, decimate-by-n_chan stream (the oracle identity
    tested in tests/test_channelizer.py).  Planar float32 in/out: complex64
    stays strictly inside jit (TPU runtime boundary rule, see CLAUDE.md).
    """
    n = iq2.shape[1]
    m = n // n_chan
    t = taps_per_branch
    # Polyphase commutator, PLANAR and movement-minimal.  The textbook
    # form (complex view, column reversal, (2, M, N) -> (2, N, M)
    # transpose feeding a depthwise grouped conv + length-N jnp.fft.ifft)
    # measured 9.7 ms of data movement alone for ~60 MB on v5e
    # (tools/tpu_prof_wideband.py: half the whole wideband iteration).
    # Here the commutator is one front-pad + reshape - S2[c, m, q] =
    # x[mN + q - (N-1)], i.e. column q holds branch p = N-1-q - and the
    # branch reversal and the IDFT's branch indexing are folded into the
    # *static* tap/twiddle constants, so no flip, no transpose, and no
    # complex round-trip touch the data until one final (2, M, N) ->
    # (N, 2, M) output transpose.
    xe = jnp.pad(iq2[:, : m * n_chan], ((0, 0), (n_chan - 1, 0)))
    # Branch filters h_p[r] = h[p + rN] (row q of the selection matrix is
    # branch N-1-q, matching the unreversed commutator columns) as ONE
    # blocked overlap-save selection matmul: the previous 12 tap-shift
    # multiply-adds on (2, M, N) arrays ran at 1/16 lane utilization
    # (N-element minor dim) and were the entire 12 ms PFB cost on v5e
    # (docs/PERF.md round-5 isolation).  Blocks of _TAP_BLOCK decimated
    # rows extend left by T-1 rows of history (zero for the first block -
    # the same zero-history convention), so block b's slab is
    # flat[b*B*N - (T-1)*N : (b+1)*B*N], and the dense (extN, B*N) matmul
    # rides the MXU.
    b = _TAP_BLOCK
    nb = -(-m // b)
    flat = jnp.pad(xe[:, : m * n_chan],
                   ((0, 0), ((t - 1) * n_chan, (nb * b - m) * n_chan)))
    # Split the slab matmul at the history boundary so the main part is a
    # pure reshape of `flat` (no (B+T-1)-wide ext concatenation - that
    # materialized an extra 63 MB copy): ext @ sel = tails @ sel_top +
    # blocks @ sel_bot with tails = the first T-1 rows of each block's
    # flat range (zero history for block 0 via the front pad).
    blocks = flat[:, (t - 1) * n_chan:].reshape(2, nb, b * n_chan)
    tails = flat[:, : nb * b * n_chan].reshape(
        2, nb, b * n_chan)[:, :, : (t - 1) * n_chan]
    sel = _tap_selection(n_chan, taps_per_branch)
    hi = jax.lax.Precision.HIGHEST
    cut = (t - 1) * n_chan
    u = (jnp.einsum("cbj,jo->cbo", tails, jnp.asarray(sel[:cut]),
                    precision=hi)
         + jnp.einsum("cbj,jo->cbo", blocks, jnp.asarray(sel[cut:]),
                      precision=hi))
    u = u.reshape(2, nb * b, n_chan)[:, :m]          # (2, M, N)
    # y[k] = sum_p u_p e^{+j 2 pi k p / N} (= ifft * N): one N x N IDFT
    # matmul on the minor branch axis, twiddles pre-permuted for the
    # q = N-1-p column order.
    k_idx = np.arange(n_chan)
    w = np.exp(2j * np.pi * np.outer(k_idx, k_idx) / n_chan)
    wq = np.ascontiguousarray(w[:, ::-1].T)                 # (q, k)
    wr = jnp.asarray(wq.real.astype(np.float32))
    wi = jnp.asarray(wq.imag.astype(np.float32))
    ur, ui = u[0], u[1]                                     # (M, N)
    # Full-precision IDFT contraction: default f32 matmul uses bf16 MXU
    # multiplies on TPU (the CLAUDE.md conv trap), which would mix ~2^-8
    # relative error across branches — about -48 dB of cross-channel
    # leakage against the documented >40 dB isolation.  The N x N twiddle
    # matmul is tiny, so HIGHEST costs nothing measurable.
    hi = jax.lax.Precision.HIGHEST
    yr = jnp.matmul(ur, wr, precision=hi) - jnp.matmul(ui, wi, precision=hi)
    yi = jnp.matmul(ur, wi, precision=hi) + jnp.matmul(ui, wr, precision=hi)
    return jnp.transpose(jnp.stack([yr, yi]), (2, 0, 1))    # (n_chan, 2, M)


def channelize(iq, n_chan: int, taps_per_branch: int = 12) -> np.ndarray:
    """Host convenience: complex wideband capture -> (n_chan, M) complex64."""
    iq = np.asarray(iq)
    iq2 = jnp.asarray(
        np.stack([iq.real.astype(np.float32), iq.imag.astype(np.float32)])
    )
    out = np.asarray(channelize_planar(iq2, n_chan, taps_per_branch))
    return (out[:, 0] + 1j * out[:, 1]).astype(np.complex64)


def channel_frequency(k: int, n_chan: int, input_rate: float) -> float:
    """Center frequency offset of PFB channel k (FFT order: k >= N/2 are
    negative)."""
    kk = k if k < n_chan / 2 else k - n_chan
    return kk * input_rate / n_chan


def decode_wideband_sharded(iq, n_chan: int, cfg, mesh,
                            events_per_shard: int = 256,
                            taps_per_branch: int = 12):
    """Channelize + decode all channels on a (time, chan) device mesh.

    One jitted program: the PFB splits the wideband capture into
    ``n_chan`` baseband streams, which feed the framework's sharded decode
    (shard/decode_sharded.py) - channels ride the mesh ``chan`` axis,
    time blocks the ``time`` axis with ppermute halos.  The PFB itself runs
    replicated (its cost is one grouped conv, ~1/n_chan of the front-end
    FIR work); a pod-scale refinement would time-shard it with a
    taps-deep halo like the decode FIR.

    Returns (per-channel InventoryStats stacked on the channel axis,
    merged DecodedEvents).
    """
    import numpy as np

    from ..shard.decode_sharded import make_sharded_decoder
    from ..shard.mesh import TIME_AXIS

    iq = np.asarray(iq)
    iq2 = jnp.asarray(
        np.stack([iq.real.astype(np.float32), iq.imag.astype(np.float32)])
    )
    n_time = mesh.shape[TIME_AXIS]
    m = iq.shape[0] // n_chan
    m_use = m - m % (n_time * cfg.decim)
    dec_fn = make_sharded_decoder(cfg, mesh, events_per_shard)

    @jax.jit
    def run(x2):
        ch = channelize_planar(x2, n_chan, taps_per_branch)  # (C, 2, M)
        return dec_fn(ch[:, :, :m_use])

    return run(iq2)


def decode_wideband(iq, n_chan: int, cfg, taps_per_branch: int = 12):
    """Channelize a wideband capture and run the full decode per channel.

    Returns a list of (InventoryStats, DecodedEvents), one per PFB channel.
    Each channel stream comes out at input_rate / n_chan, which must equal
    ``cfg.adc_rate`` (e.g. a 16 Msps capture with n_chan=8 feeds the default
    2 Msps pipeline).  Channels are independent - a pod deployment maps them
    onto the mesh channel axis (shard/mesh.py) instead of this host loop.
    """
    from ..runtime.inventory import decode_capture

    chans = channelize(iq, n_chan, taps_per_branch)
    return [decode_capture(chans[k], cfg) for k in range(n_chan)]
