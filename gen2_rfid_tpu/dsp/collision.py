"""Collision recovery by successive interference cancellation (SIC).

New capability with no reference analogue: the reference loses every
collided slot (it only ever learns about the collision when the EPC CRC
fails, ``tag_decoder_impl.cc:366-387``).  Real tags reply with independent
T1 timing and channel phases, so a collided RN16 window is usually
*separable*:

1. decode the dominant reply with the standard coherent slicer (capture
   effect: when the colliders' timings differ, sync locks to the stronger
   correlation peak; even perfectly aligned colliders decode to the
   stronger tag's bits — disagreeing bits project to |h1|^2 - |h2|^2);
2. re-synthesize the decoded tag's matched-filtered OOK waveform from its
   chip train (closed-form FM0 re-encoding — no scan: the FM0 level
   recursion is a cumulative XOR) over a small static bank of timing
   hypotheses (decim ADC phases x integer shifts, since the simulator and
   real edges land on ADC samples), least-squares fit the complex
   amplitude, and subtract the best hypothesis;
3. re-run sync + slicing on the residual to recover the second tag.

The reader can then ACK either tag (capture-style inventory: the matching
tag answers with its EPC — ``sim/channel.py`` models exactly this), instead
of losing the slot.

TPU shape: everything is selection/matmul algebra — the chip train is a
cumxor, the template bank is one (E, 46) x (46, C*L) matmul, hypothesis
scoring is a (C, L) x (L,) contraction per frame, and the only per-frame
dynamic ops are two dynamic slices and one dynamic-update-slice.

The same machinery generalizes to the **EPC window** (``epc_sic``): when
two tags happen to draw the same RN16 (or a mis-framed ACK matches both),
both backscatter their EPC frames superposed during cw_ack.  The template
bank is just longer (129-bit frames instead of 17), and the CRC-16 gives a
per-recovered-frame validity check the RN16 window never had.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TAG_PREAMBLE_BITS_PATTERN, ReaderConfig
from . import fm0, sync
from .fm0 import SEL_PRECISION

N_SHIFTS = 7          # integer decim-sample alignment hypotheses
# The slice anchor (shift0) is config-derived in _template_bank: the sync
# correlation peaks ~(taps/decim) samples AFTER the reply start.


class SicResult(NamedTuple):
    bits1: jnp.ndarray    # (16,) dominant tag's RN16
    bits2: jnp.ndarray    # (16,) cancelled-residual tag's RN16
    h1: jnp.ndarray       # () complex refined LS amplitude of tag 1 (per-chip
                          #    backscatter scale, i.e. post-MF amplitude / taps)
    h1_sync: jnp.ndarray  # () complex pass-1 preamble estimate (post-MF scale)
    h2: jnp.ndarray       # () complex preamble channel estimate of tag 2
    margin1: jnp.ndarray  # () f32 slicer margin of pass 1
    margin2: jnp.ndarray  # () f32 slicer margin of pass 2 (on the residual)
    cancel_ratio: jnp.ndarray  # () f32 energy removed / window energy


def fm0_chip_train(bits16: jnp.ndarray, cfg: ReaderConfig) -> jnp.ndarray:
    """Preamble + FM0 half-bit chips (0/1) for a payload + dummy-1 (any
    length: 16-bit RN16 or 128-bit EPC frame).

    Closed form of the sequential level recursion in ``sim.tag.fm0_chips``
    (first_i = cumxor_{<i}, second_i = 1 - cumxor_{<=i}, starting from the
    preamble's trailing high chip) — verified equal in tests.
    """
    bits = jnp.concatenate(
        [bits16.astype(jnp.int32), jnp.ones((1,), jnp.int32)])
    cx = jnp.cumsum(bits) % 2
    cx_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), cx[:-1]])
    first = cx_prev
    second = 1 - cx
    data = jnp.stack([first, second], axis=-1).reshape(-1)
    pre = np.asarray(TAG_PREAMBLE_BITS_PATTERN, np.int32)
    if cfg.trext:
        # TRext=1: the pilot tone ((1,0) chip pairs) precedes the preamble
        # (sim.tag.fm0_chips).
        pre = np.concatenate(
            [np.tile([1, 0], cfg.pilot_tone_bits).astype(np.int32), pre])
    return jnp.concatenate([jnp.asarray(pre), data])


def miller_chip_train(bits16: jnp.ndarray, cfg: ReaderConfig) -> jnp.ndarray:
    """Preamble + Miller-M chips (0/1) for a payload + dummy-1 (any length).

    Closed form of ``sim.tag.miller_chips``'s phase recursion: the baseband
    phase of bit i is (-1)^(#data-1 bits before i + #00-boundaries up to i)
    — both cumulative sums — times the M-cycle subcarrier, with the second
    half-bit of every data-1 inverted.  Verified equal in tests.
    """
    m = cfg.miller_m
    n_spin = 16 if cfg.trext else 4
    pre = jnp.asarray(
        np.array([0] * n_spin + [0, 1, 0, 1, 1, 1], np.int32))
    seq = jnp.concatenate(
        [pre, bits16.astype(jnp.int32), jnp.ones((1,), jnp.int32)])
    prev = jnp.concatenate([jnp.ones((1,), jnp.int32), seq[:-1]])
    inv = ((seq == 0) & (prev == 0)).astype(jnp.int32)
    ones_before = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(seq)[:-1]])
    flips = (jnp.cumsum(inv) + ones_before) % 2
    phase = 1 - 2 * flips                                # (n_bits,) +-1
    sub = jnp.asarray(np.tile([1, -1], m).astype(np.int32))
    chips_pm = phase[:, None] * sub[None, :]             # (n_bits, 2m)
    halfflip = jnp.where(
        (seq == 1)[:, None]
        & (jnp.arange(2 * m, dtype=jnp.int32) >= m)[None, :], -1, 1)
    return ((chips_pm * halfflip).reshape(-1) + 1) // 2


def chip_train(bits16: jnp.ndarray, cfg: ReaderConfig) -> jnp.ndarray:
    return (fm0_chip_train(bits16, cfg) if cfg.miller_m == 1
            else miller_chip_train(bits16, cfg))


@functools.lru_cache(maxsize=8)
def _template_bank(cfg: ReaderConfig, n_bits: int = 16):
    """(n_chips, C*L) static basis: column c*L+k is the matched-filtered
    response at window sample k of a unit chip, for timing hypothesis c =
    (shift s, ADC phase phi).

    Chip hb occupies ADC [round(phi + s*decim + hb*chip_adc) ..
    round(.. + (hb+1)*chip_adc)) relative to the slice start — the same
    per-edge rounding as ``sim.tag.superpose_reply`` — and window sample k
    integrates ADC (k*decim - (t-1) .. k*decim] (the GNU Radio history
    convention of filters.matched_filter_decimate).  Reply starts land on
    integer ADC samples, so one phase hypothesis reproduces the waveform
    exactly at nominal BLF.  Works for FM0 (chip = half bit) and Miller-M
    (chip = subcarrier half-cycle).

    Returns (basis, c_hyp, l_win, shift0): the slice anchor offset is
    sync_peak + shift0, with shift0 = -(round(taps/decim) + 3) because the
    sync correlation peaks ~taps/decim samples after the true reply start
    (its per-chip samples integrate a full MF window inside each chip);
    the 7 shift hypotheses then bracket the true start.
    """
    decim = cfg.decim
    m = cfg.miller_m
    t = int(cfg.tag_bit_us / 2 * cfg.adc_rate / 1e6 / m)  # MF taps
    chip_adc = cfg.tag_bit_us / (2 * m) * cfg.adc_rate / 1e6  # float
    if m == 1:
        n_chips = 2 * cfg.tag_preamble_bits + 2 * (n_bits + 1)
        if cfg.trext:
            n_chips += 2 * cfg.pilot_tone_bits        # pilot tone chips
    else:
        n_spin = 16 if cfg.trext else 4
        n_chips = (n_spin + 6 + n_bits + 1) * 2 * m
    shift0 = -(max(int(round(t / decim)), 1) + 3)
    a_hyp_max = (N_SHIFTS - 1) * decim + (decim - 1)
    a_max = a_hyp_max + int(round(n_chips * chip_adc)) + 1
    l_win = (a_max + t - 1) // decim + 2
    c_hyp = N_SHIFTS * decim
    p = np.zeros((n_chips, c_hyp, l_win), dtype=np.float32)
    k_idx = np.arange(n_chips + 1, dtype=np.float64)
    for s in range(N_SHIFTS):
        for phi in range(decim):
            a_base = phi + s * decim
            edges = np.round(a_base + k_idx * chip_adc).astype(np.int64)
            for hb in range(n_chips):
                a0, a1 = int(edges[hb]), int(edges[hb + 1])
                k0 = max(a0 // decim, 0)
                k1 = min((a1 + t - 1) // decim + 1, l_win - 1)
                for k in range(k0, k1 + 1):
                    lo = k * decim - (t - 1)
                    ov = min(k * decim + 1, a1) - max(lo, a0)
                    if ov > 0:
                        p[hb, s * decim + phi, k] = ov
    return p.reshape(n_chips, c_hyp * l_win), c_hyp, l_win, shift0


def _sync_rn16(frame: jnp.ndarray, cfg: ReaderConfig):
    """Encoding dispatch: (data_index, h_est, bits, margin, b0) where b0 is
    the preamble span the sync index includes (anchor = index - b0)."""
    if cfg.miller_m == 1:
        idx, h = sync.tag_sync(frame, cfg)
        bits, margin = fm0.rn16_detect_soft(frame, idx, h, cfg)
        b0 = _fm0_b0(cfg)
    else:
        from . import miller

        idx, h, eps = miller.miller_sync_full(frame, cfg)
        bits, margin = miller.miller_rn16_soft(frame, idx, h, cfg, eps0=eps)
        b0 = miller.preamble_len_samples(cfg)
    return idx, h, bits, margin, b0


def _fm0_b0(cfg: ReaderConfig) -> int:
    """Samples between the FM0 reply start and the sync data index:
    preamble span + the half-bit shift (tag_decoder_impl.cc:107), plus the
    pilot tone under TRext=1 (the template's chip train starts at the
    pilot's first chip)."""
    half = cfg.n_samples_tag_bit / 2.0
    b0 = int(cfg.tag_preamble_bits * cfg.n_samples_tag_bit + half)
    if cfg.trext:
        b0 += int(round(cfg.pilot_tone_bits * cfg.n_samples_tag_bit))
    return b0


def _sic_pass(frame: jnp.ndarray, cfg: ReaderConfig):
    """One decode-and-cancel pass: sync, slice, LS-fit + subtract the
    re-synthesized dominant reply.  Returns (bits, margin, h_sync, alpha,
    cancel_ratio, residual_frame)."""
    p_np, c_hyp, l_win, shift0 = _template_bank(cfg)
    w = frame.shape[0]
    hi = SEL_PRECISION

    idx1, h1c, bits1, margin1, b0 = _sync_rn16(frame, cfg)

    # Template bank for THESE bits: (n_chips,) x (n_chips, C*L) matmul.
    chips = chip_train(bits1, cfg).astype(jnp.float32)
    bank = jnp.matmul(chips, jnp.asarray(p_np), precision=hi).reshape(
        c_hyp, l_win)

    # Window slice anchored at sync peak + shift0 (see _template_bank).
    m1 = idx1 - jnp.int32(b0)
    start = jnp.clip(m1 + jnp.int32(shift0), 0, w - l_win)
    xw = jax.lax.dynamic_slice(frame, (start,), (l_win,))
    xr, xi_ = jnp.real(xw), jnp.imag(xw)

    # LS amplitude per hypothesis: alpha_c = <x, tpl_c> / <tpl_c, tpl_c>.
    pr = jnp.matmul(bank, xr, precision=hi)              # (C,)
    pi = jnp.matmul(bank, xi_, precision=hi)
    tt = jnp.maximum(jnp.sum(bank * bank, axis=1), 1e-20)
    score = (pr ** 2 + pi ** 2) / tt                     # explained energy
    best = jnp.argmax(score)
    tpl = bank[best]
    a_re = pr[best] / tt[best]
    a_im = pi[best] / tt[best]

    res = jax.lax.complex(xr - a_re * tpl, xi_ - a_im * tpl)
    r = jax.lax.dynamic_update_slice(frame, res, (start,))

    e_before = jnp.sum(xr ** 2 + xi_ ** 2)
    e_after = jnp.sum(jnp.real(res) ** 2 + jnp.imag(res) ** 2)
    cancel_ratio = 1.0 - e_after / jnp.maximum(e_before, 1e-20)
    return (bits1, margin1, h1c, jax.lax.complex(a_re, a_im),
            cancel_ratio, r)


def rn16_sic(frame: jnp.ndarray, cfg: ReaderConfig) -> SicResult:
    """Recover two superposed RN16 replies from one decode window.

    frame: (W,) complex64, DC-corrected (CW mean removed, so the window is
    tag backscatter only).  Pass 1 decodes the dominant tag; the LS-fitted
    template is subtracted; pass 2 decodes the residual.
    """
    bits1, margin1, h1c, alpha, cancel_ratio, r = _sic_pass(frame, cfg)
    idx2, h2c, bits2, margin2, _ = _sync_rn16(r, cfg)

    return SicResult(
        bits1=bits1,
        bits2=bits2,
        h1=alpha,
        h1_sync=h1c,
        h2=h2c,
        margin1=margin1,
        margin2=margin2,
        cancel_ratio=cancel_ratio,
    )


def _sync_epc(frame: jnp.ndarray, cfg: ReaderConfig):
    """EPC-window encoding dispatch: (data_index, h_est, bits (128,), b0).

    Same structure as ``_sync_rn16`` but decoding the 128-bit EPC payload
    (period-grid estimation included for FM0, per tag_decoder_impl.cc:
    145-193; segment re-alignment for Miller)."""
    if cfg.miller_m == 1:
        idx, h = sync.tag_sync(frame, cfg)
        m2 = (jnp.real(frame) ** 2 + jnp.imag(frame) ** 2).astype(
            jnp.float32)
        bits, _ = fm0.epc_detect(frame, m2, idx, h, cfg)
        b0 = _fm0_b0(cfg)
    else:
        from . import miller

        idx, h, eps = miller.miller_sync_full(frame, cfg)
        bits, _ = miller.miller_epc(frame, idx, h, cfg, eps0=eps)
        b0 = miller.preamble_len_samples(cfg)
    return idx, h, bits, b0


def _sic_detect_template(frame: jnp.ndarray, cfg: ReaderConfig,
                         kind: str = "rn16"):
    """Detect the dominant reply in ``frame`` and return (bits, margin,
    h_sync, template-in-frame-coordinates (W,) f32).

    kind: "rn16" (16-bit payload) or "epc" (128-bit payload; margin is 0 —
    EPC validity is judged by the CRC instead)."""
    n_bits = cfg.epc_data_bits if kind == "epc" else 16
    p_np, c_hyp, l_win, shift0 = _template_bank(cfg, n_bits)
    w = frame.shape[0]
    hi = SEL_PRECISION

    if kind == "epc":
        idx1, h1c, bits1, b0 = _sync_epc(frame, cfg)
        margin1 = jnp.float32(0.0)
    else:
        idx1, h1c, bits1, margin1, b0 = _sync_rn16(frame, cfg)
    chips = chip_train(bits1, cfg).astype(jnp.float32)
    bank = jnp.matmul(chips, jnp.asarray(p_np), precision=hi).reshape(
        c_hyp, l_win)
    m1 = idx1 - jnp.int32(b0)
    start = jnp.clip(m1 + jnp.int32(shift0), 0, w - l_win)
    xw = jax.lax.dynamic_slice(frame, (start,), (l_win,))
    pr = jnp.matmul(bank, jnp.real(xw), precision=hi)
    pi = jnp.matmul(bank, jnp.imag(xw), precision=hi)
    tt = jnp.maximum(jnp.sum(bank * bank, axis=1), 1e-20)
    best = jnp.argmax((pr ** 2 + pi ** 2) / tt)
    tpl_full = jax.lax.dynamic_update_slice(
        jnp.zeros((w,), jnp.float32), bank[best], (start,))
    return bits1, margin1, h1c, tpl_full


def rn16_sic_n(frame: jnp.ndarray, cfg: ReaderConfig, n_tags: int = 3):
    """Iterative N-way separation with joint amplitude re-fit.

    Each round detects the dominant reply in the current residual, adds its
    re-synthesized template (in frame coordinates), then re-fits the
    complex amplitudes of ALL templates found so far by joint least squares
    against the ORIGINAL window - so the early templates' fits improve as
    later interferers are discovered (naive sequential subtraction
    accumulates fit bias and fails beyond 2 tags).

    Returns (bits (n_tags, 16), h_sync (n_tags,) complex, margin (n_tags,),
    cancel (n_tags,)) in detection order; cancel[k] is the fraction of the
    original window energy removed after k+1 joint-fitted templates.
    Callers judge per-pass validity from margin / cancel deltas - trailing
    passes on an exhausted window decode noise.
    """
    w = frame.shape[0]
    xr0, xi0 = jnp.real(frame), jnp.imag(frame)
    e0 = jnp.maximum(jnp.sum(xr0 ** 2 + xi0 ** 2), 1e-20)

    bits_all, h_all, margin_all, cancel_all = [], [], [], []
    templates = []
    r = frame
    for k in range(n_tags):
        bits, margin, h_sync, tpl = _sic_detect_template(r, cfg)
        templates.append(tpl)
        t = jnp.stack(templates)                       # (k+1, W)
        g = t @ t.T + 1e-12 * jnp.eye(k + 1)           # (k+1, k+1)
        a_re = jnp.linalg.solve(g, t @ xr0)
        a_im = jnp.linalg.solve(g, t @ xi0)
        rr = xr0 - a_re @ t
        ri = xi0 - a_im @ t
        r = jax.lax.complex(rr, ri)
        bits_all.append(bits)
        h_all.append(h_sync)
        margin_all.append(margin)
        cancel_all.append(1.0 - jnp.sum(rr ** 2 + ri ** 2) / e0)
    return (jnp.stack(bits_all), jnp.stack(h_all), jnp.stack(margin_all),
            jnp.stack(cancel_all))


class EpcSicResult(NamedTuple):
    bits: jnp.ndarray     # (n_tags, 128) recovered EPC frames, detect order
    crc_ok: jnp.ndarray   # (n_tags,) bool CRC-16 verdict per frame
    h_sync: jnp.ndarray   # (n_tags,) complex preamble channel estimates
    cancel: jnp.ndarray   # (n_tags,) f32 cumulative energy removed


def epc_sic(frame: jnp.ndarray, cfg: ReaderConfig,
            n_tags: int = 2) -> EpcSicResult:
    """Recover superposed EPC replies from one ACK decode window.

    Gen2 tags that drew the *same* RN16 in a slot both match the ACK and
    both backscatter their EPC frames (the reference's decode garbles and
    the CRC rejects, tag_decoder_impl.cc:366-387; the slot is lost).  The
    RN16 SIC machinery applies unchanged — only the template is longer
    (129-bit frame) — with two EPC-specific twists:

    * joint amplitude re-fit (as ``rn16_sic_n``): over a 3.4 ms frame the
      sequential-subtraction fit bias compounds, so every pass re-solves
      all templates' complex amplitudes against the original window;
    * per-frame CRC-16 validity: unlike RN16s, each recovered EPC frame
      self-validates, so callers take exactly the passes whose CRC checks
      (a noise-only residual passes with probability 2^-16).

    Pass 1 on the original window is identical to the plain EPC decode, so
    using this in place of ``epc_detect`` never changes single-tag results.
    """
    from ..runtime.inventory import check_epc_crc_batch

    xr0, xi0 = jnp.real(frame), jnp.imag(frame)
    e0 = jnp.maximum(jnp.sum(xr0 ** 2 + xi0 ** 2), 1e-20)

    bits_all, h_all, cancel_all = [], [], []
    templates = []
    r = frame
    for k in range(n_tags):
        bits, _, h_sync, tpl = _sic_detect_template(r, cfg, kind="epc")
        templates.append(tpl)
        t = jnp.stack(templates)                       # (k+1, W)
        g = t @ t.T + 1e-12 * jnp.eye(k + 1)           # (k+1, k+1)
        a_re = jnp.linalg.solve(g, t @ xr0)
        a_im = jnp.linalg.solve(g, t @ xi0)
        rr = xr0 - a_re @ t
        ri = xi0 - a_im @ t
        r = jax.lax.complex(rr, ri)
        bits_all.append(bits)
        h_all.append(h_sync)
        cancel_all.append(1.0 - jnp.sum(rr ** 2 + ri ** 2) / e0)
    bits = jnp.stack(bits_all)
    return EpcSicResult(
        bits=bits,
        crc_ok=check_epc_crc_batch(bits),
        h_sync=jnp.stack(h_all),
        cancel=jnp.stack(cancel_all),
    )


rn16_sic_batch = jax.vmap(rn16_sic, in_axes=(0, None))
epc_sic_batch = jax.vmap(epc_sic, in_axes=(0, None))
