"""Per-slot window decode for the live loop (jitted, stable shapes).

Split out of runtime/live.py (round 4 decomposition).  `_window_decoder`
is the lru-cached jitted decode program (one per (config, mode));
`SlotDecodeMixin` carries the RX context tail between exchanges, buckets
block shapes so warmed-up slots never recompile, and classifies slots
with the batch thresholds.  See runtime/live.py for the loop that drives
it.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

from ..config import ReaderConfig


@dataclasses.dataclass
class _RnResult:
    bits: np.ndarray
    energy: float
    margin: float
    h2: float
    noise_var: float
    # SIC mode (mode="sic"): the residual's second decoded RN16 + quality.
    bits2: Optional[np.ndarray] = None
    margin2: float = 0.0
    cancel_ratio: float = 0.0


@functools.lru_cache(maxsize=None)
def _window_decoder(cfg: ReaderConfig, mode: str):
    """Jitted per-slot window decode (FIR -> gate -> newest-event frame ->
    sync/FM0-or-Miller -> bits + soft stats), fixed output shapes.

    mode: "rn16" | "epc" | "sic" (RN16 window with successive interference
    cancellation: dsp/collision.py - pass 1 equals the plain decode, so the
    SIC decoder transparently replaces "rn16" when capture is enabled) |
    "epc_sic" (EPC window with SIC: recovers BOTH EPC frames when two tags
    that drew the same RN16 answer the ACK superposed; pass 1 equals the
    plain EPC decode, each recovered frame self-validates via CRC-16) |
    "acc:<n>" (n-bit access-command reply: Req_RN handle or Read data;
    CRC checks happen host-side on the returned bits).

    The live loop re-enters this at a handful of stable block shapes (one
    per command kind), so after warmup every slot is a single compiled
    call - this is what takes per-slot latency from ~56 ms of eager op
    dispatch to ~2 ms (see README).
    """
    import jax
    import jax.numpy as jnp

    from ..dsp import fm0, miller, sync
    from ..dsp.filters import matched_filter_decimate
    from ..dsp.gate import gate_detect
    from .inventory import matched_taps

    ev_cfg = dataclasses.replace(cfg, max_events=8)
    want_epc = mode in ("epc", "epc_sic")
    acc_bits = int(mode.split(":")[1]) if mode.startswith("acc:") else 0
    if acc_bits:
        w = cfg.reply_window(acc_bits)
    else:
        w = cfg.epc_window if want_epc else cfg.rn16_window

    @jax.jit
    def run(block2):
        y = matched_filter_decimate(
            jax.lax.complex(block2[0], block2[1]), matched_taps(cfg),
            cfg.decim)
        ev = gate_detect(y, ev_cfg)
        # Newest command event (invalid slots hold index n, so mask first).
        idx_arr = jnp.where(ev.valid, ev.index, jnp.int32(-1))
        pos = jnp.argmax(idx_arr)
        found = jnp.any(ev.valid)
        idx = jnp.maximum(idx_arr[pos], 0)
        fits = found & (idx + w <= y.shape[0])
        start = jnp.minimum(idx, jnp.int32(y.shape[0] - w))
        frame = jax.lax.dynamic_slice(y, (start,), (w,)) - ev.dc[pos]
        if acc_bits:
            if cfg.miller_m == 1:
                di, h = sync.tag_sync(frame, cfg)
                bits = fm0.payload_detect(frame, di, h, cfg, acc_bits)
            else:
                di, h, eps = miller.miller_sync_full(frame, cfg)
                bits = miller.miller_detect(frame, di, h, cfg, acc_bits,
                                            eps0=eps)[0]
            return fits, bits
        if mode == "epc_sic":
            from ..dsp.collision import epc_sic

            r = epc_sic(frame, cfg, n_tags=2)
            return (fits, r.bits[0], r.crc_ok[0], r.bits[1], r.crc_ok[1])
        if mode == "sic":
            from ..dsp.collision import rn16_sic

            r = rn16_sic(frame, cfg)
            energy = jnp.mean(jnp.abs(frame[: cfg.rn16_window]) ** 2)
            # Post-MF-scale channel power (the classifier's normalization).
            h1sq = jnp.real(r.h1_sync) ** 2 + jnp.imag(r.h1_sync) ** 2
            return (fits, r.bits1, r.margin1, energy, h1sq,
                    ev.noise_var[pos], r.bits2, r.margin2, r.cancel_ratio)
        rel = None
        if cfg.miller_m == 1:
            di, h = sync.tag_sync(frame, cfg)
            if want_epc:
                m2 = (jnp.abs(frame) ** 2).astype(jnp.float32)
                if cfg.epc_softfix:
                    bits, _, rel = fm0.epc_detect_soft(frame, m2, di, h, cfg)
                else:
                    bits, _ = fm0.epc_detect(frame, m2, di, h, cfg)
            else:
                bits, margin = fm0.rn16_detect_soft(frame, di, h, cfg)
        else:
            di, h, eps = miller.miller_sync_full(frame, cfg)
            if want_epc:
                if cfg.epc_softfix:
                    bits, _, rel = miller.miller_epc_soft(frame, di, h, cfg,
                                                          eps0=eps)
                else:
                    bits, _ = miller.miller_epc(frame, di, h, cfg, eps0=eps)
            else:
                bits, margin = miller.miller_rn16_soft(frame, di, h, cfg,
                                                       eps0=eps)
        if want_epc:
            # Mode-aware validation (+ optional CRC-guided soft recovery):
            # native parses the PC length field (variable-length EPC),
            # compat pins the reference's fixed check.  h rides out planar
            # (re, im): the per-read phase observable (runtime/ranging.py
            # Doppler / PDOA in the live loop).
            from .inventory import _validate_epc_soft

            okv, _, bitsv = _validate_epc_soft(
                bits[None], None if rel is None else rel[None], cfg)
            return (fits, bitsv[0], okv[0], jnp.real(h), jnp.imag(h))
        energy = jnp.mean(jnp.abs(frame[: cfg.rn16_window]) ** 2)
        h2 = jnp.real(h) ** 2 + jnp.imag(h) ** 2
        return fits, bits, margin, energy, h2, ev.noise_var[pos]

    return run


class SlotDecodeMixin:
    """Carried-context per-slot decoding: the live loop's bridge to the
    batch DSP primitives (host side of `_window_decoder`)."""

    # ADC samples per live block-shape bucket: PIE command waveforms vary
    # with the bit values (data-1 is 2x data-0, reader_impl.cc:55-56), so
    # un-bucketed blocks get a fresh shape - and a fresh XLA compile -
    # almost every ACK.  Zero-padding up to the bucket keeps the handful of
    # shapes stable after warmup (trailing zeros sit after the reply window
    # and decode as silence).
    BLOCK_BUCKET = 512

    def _reset_ctx(self) -> None:
        """Zero (not empty) context keeps block shapes stable across
        power-down resets, so no recompiles occur mid-inventory."""
        self._ctx = np.zeros(self._ctx_len, np.complex64)

    def _decode_window(self, rx: np.ndarray, mode: str):
        block = np.concatenate([self._ctx, rx])
        self._ctx = block[-self._ctx_len:]
        pad = -len(block) % self.BLOCK_BUCKET
        padded = np.concatenate([block, np.zeros(pad, block.dtype)])
        self._block_shapes.add((len(padded), mode))
        block2 = np.stack([padded.real, padded.imag]).astype(np.float32)
        out = _window_decoder(self.cfg, mode)(block2)
        if not bool(out[0]):
            return None
        if mode.startswith("acc:"):
            return np.asarray(out[1])
        if mode == "epc":
            return (np.asarray(out[1]), bool(out[2]),
                    complex(float(out[3]), float(out[4])))
        if mode == "epc_sic":
            return (np.asarray(out[1]), bool(out[2]),
                    np.asarray(out[3]), bool(out[4]))
        r = _RnResult(
            bits=np.asarray(out[1]),
            energy=float(out[3]),
            margin=float(out[2]),
            h2=float(out[4]),
            noise_var=float(out[5]),
        )
        if mode == "sic":
            r.bits2 = np.asarray(out[6])
            r.margin2 = float(out[7])
            r.cancel_ratio = float(out[8])
        return r

    def _classify(self, rn: Optional[_RnResult]) -> int:
        """Live slot state via the batch classifier's thresholds
        (runtime.inventory.classify_slots) on scalar measurements."""
        from .inventory import SLOT_COLLISION, SLOT_EMPTY, SLOT_SINGLE, classify_slots

        if rn is None:
            return SLOT_EMPTY
        state = classify_slots(
            np.float32(rn.energy), np.float32(rn.margin),
            np.float32(rn.noise_var), np.float32(rn.h2))
        return int(state)
