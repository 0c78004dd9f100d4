"""Closed-loop live reader: TX synthesis driven by decoded replies.

The real-time counterpart of the reference application (its non-DEBUG mode,
``apps/reader.py:82-96``): the reader transmits Query/QueryRep, decodes the
RN16 from the returning samples, transmits an ACK *containing the decoded
bits*, and decodes the EPC - one slot at a time, with decode results feeding
back into what gets transmitted.  The batch decoder can never demonstrate
this loop (pre-recorded traces already contain the answers); here a wrong
RN16 decode silences the tag (see sim/channel.py), so every EPC read proves
the loop.

FSM parity with the reference's 10-state transmit machine
(``reader_impl.cc:200-380``):

* START power-up CW and POWER_DOWN (2 ms of zeros, ``reader_impl.cc:226-230``)
  are emitted (power-down behind ``power_down_every``; the reference builds
  the waveform but only reaches the state via commented-out decoder
  transitions, ``tag_decoder_impl.cc:280,337,374``);
* SEND_QUERY / SEND_ACK+SEND_CW / SEND_QUERY_REP exactly as before;
* SEND_QUERY_ADJUST with a live Annex-D Q controller (``adaptive=True``):
  Qfp += C on a collision slot, -= C on an empty slot, QueryAdjust issued
  when round(Qfp) changes - the reference ships the synthesis
  (``reader_impl.cc:156-162``) but pins FIXED_Q;
* SEND_NAK_QR / SEND_NAK_Q (``reader_impl.cc:233-249``) behind
  ``nak_on_fail``: a failed EPC CRC triggers a NAK before the next
  Query/QueryRep (the reference's transition is commented out,
  ``tag_decoder_impl.cc:376,381``).

Slot classification (empty / single / collision) reuses the batch
classifier's thresholds on the same live-measured signals (reply-window
energy vs the gate's CW noise estimate, decision margin, |h_est|^2).

Per-slot decoding reuses the batch primitives on small blocks: inline FIR,
the block-parallel gate with a carried RX context tail, and the per-frame
sync/FM0/CRC stack.  ``LiveStats.slot_latency_s`` records the wall time of
every full slot (TX -> decode -> ACK -> decode); see ``latency_summary``.

Radio I/O is abstracted behind a ``channel.exchange(kind, bits, tx_env,
cw_us)`` callable; `sim.channel.SimTagChannel` provides the simulated air
interface, and `io.radio` provides a UHD-style adapter shape for real
hardware.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import time
from typing import Dict, List, Optional

import numpy as np

from ..config import ReaderConfig
from ..protocol import gen2
from ..tx.pie import PieEncoder
from ..runtime.stats import N_TAG_BINS

# The reference logs every FSM transition through log4cpp's debug logger
# (GR_LOG_INFO(d_debug_logger, ...), reader_impl.cc:219-358); this is the
# Python-logging analogue, silent unless the application enables it.
_log = logging.getLogger("gen2_rfid_tpu.live")


@dataclasses.dataclass
class LiveStats:
    n_queries: int = 0
    n_epc_correct: int = 0
    cur_round: int = 1
    cur_slot: int = 1
    n_no_rn16: int = 0          # slots where no command event / reply decoded
    tag_reads: Optional[np.ndarray] = None
    # Slot classification + adaptive-Q bookkeeping (new vs the reference,
    # which only ever learns a slot failed via the EPC CRC).
    n_empty_slots: int = 0
    n_single_slots: int = 0
    n_collision_slots: int = 0
    n_qadjust: int = 0
    n_nak: int = 0
    n_target_flips: int = 0    # A<->B inventoried-flag target flips
    n_sic_recovered: int = 0   # collided slots whose EPC was still read
    n_epc_sic_second: int = 0  # extra EPCs read from the EPC-window residual
    n_req_rn_ok: int = 0       # handles fetched (access sequence)
    n_read_ok: int = 0         # Read replies with CRC + handle echo OK
    n_write_ok: int = 0        # Write replies with CRC + handle echo OK
    n_access_ok: int = 0       # Access sequences completed (-> Secured)
    n_lock_ok: int = 0         # Lock success replies verified
    n_blockwrite_ok: int = 0   # BlockWrite success replies verified
    n_blockerase_ok: int = 0   # BlockErase success replies verified
    n_blockpermalock_ok: int = 0  # BlockPermalock (Read/Lock=1) successes
    n_truncated_reads: int = 0  # EPCs read via truncated replies
    n_kill_ok: int = 0         # tags killed (second-half success reply)
    n_auth_ok: int = 0         # TAM1 Authenticate responses verified
    n_auth_fail: int = 0       # Authenticate replies that failed crypto
    n_buffer_auth_ok: int = 0  # Challenge-precomputed (ReadBuffer) verifies
    n_untraceable_ok: int = 0  # Untraceable success replies verified
    n_keyupdate_ok: int = 0    # KeyUpdate success replies verified
    n_tam2_ok: int = 0         # TAM2 confidential reads verified
    n_secure_read_ok: int = 0  # SecureComm(Read) replies decrypted+verified
    n_secure_write_ok: int = 0  # SecureComm(Write) success replies
    n_auth_comm_ok: int = 0    # AuthComm-encapsulated command successes
    secure_read_words: Dict[int, np.ndarray] = dataclasses.field(
        default_factory=dict)  # tag id -> last TAM2/SecureComm-decrypted
    #                            data bits (confidential reads)
    # Tag error-specific replies (Gen2 Annex I) decoded from failed access
    # commands: error name -> count.  The LLRP access-op result-code
    # analogue; empty when tags stay silent on failure.
    error_counts: Dict[str, int] = dataclasses.field(default_factory=dict)
    read_words: Dict[int, np.ndarray] = dataclasses.field(
        default_factory=dict)  # tag id -> last Read data bits
    permalock_status: Dict[int, np.ndarray] = dataclasses.field(
        default_factory=dict)  # tag id -> BlockPermalock status bits
    # Per-read localization observables: tag id -> [(t_s, phase_rad,
    # rssi_dbfs, carrier_hz), ...] from each correct EPC's channel
    # estimate - the live counterpart of runtime/ranging.py::
    # tag_phase_series, with the hop carrier recorded so a hopping
    # session yields live PDOA range.
    phase_reads: Dict[int, List[tuple]] = dataclasses.field(
        default_factory=dict)
    # SIC diagnostics: (acked RN16, residual RN16) per collided slot.
    sic_rn16_pairs: List[tuple] = dataclasses.field(default_factory=list)
    q_trace: List[int] = dataclasses.field(default_factory=list)
    # Link-rate adaptation (link_profiles): (round, miller_m) at every
    # profile switch - the reader's rate-control trace.
    link_trace: List[tuple] = dataclasses.field(default_factory=list)
    # Listen-before-talk: (round, MHz) at every busy-channel move, plus
    # the defer count (EN 302 208-style clear-channel assessment).
    lbt_trace: List[tuple] = dataclasses.field(default_factory=list)
    n_lbt_defers: int = 0
    slot_latency_s: List[float] = dataclasses.field(default_factory=list)

    def __post_init__(self):
        if self.tag_reads is None:
            self.tag_reads = np.zeros(N_TAG_BINS, np.int64)

    def phase_series(self, tag_id: int) -> Dict[str, np.ndarray]:
        """(time_s, phase_rad, rssi_dbfs, freq_hz) arrays for one tag -
        feed to runtime.ranging.estimate_velocity (one carrier) or
        ``range_estimate`` (hopping session)."""
        rows = np.asarray(self.phase_reads.get(tag_id, []), dtype=np.float64)
        if rows.size == 0:
            rows = rows.reshape(0, 4)
        return {"time_s": rows[:, 0], "phase_rad": rows[:, 1],
                "rssi_dbfs": rows[:, 2], "freq_hz": rows[:, 3]}

    def range_estimate(self, tag_id: int):
        """Live PDOA range from a frequency-hopping session: the per-read
        phases are grouped by hop carrier (circular mean each) and fit
        across frequency (runtime.ranging.estimate_range).  None unless
        the tag was read on >= 2 carriers."""
        from .ranging import circular_mean, estimate_range

        s = self.phase_series(tag_id)
        by_f: Dict[float, list] = {}
        for ph, f in zip(s["phase_rad"], s["freq_hz"]):
            by_f.setdefault(float(f), []).append(float(ph))
        if len(by_f) < 2:
            return None
        fs = sorted(by_f)
        return estimate_range(fs, [circular_mean(np.asarray(by_f[f]))
                                   for f in fs])

    def latency_summary(self) -> Dict[str, float]:
        lat = np.asarray(self.slot_latency_s, dtype=np.float64)
        if lat.size == 0:
            return {}
        return {
            "mean_ms": float(lat.mean() * 1e3),
            "p50_ms": float(np.percentile(lat, 50) * 1e3),
            "p95_ms": float(np.percentile(lat, 95) * 1e3),
            "n_slots": int(lat.size),
        }


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


#: ETSI EN 302 208 lower-band 4-channel plan (MHz): the four 200 kHz
#: high-power channels European readers share - the natural LBT set.
ETSI_LOWER_MHZ = (865.7, 866.3, 866.9, 867.5)


def default_link_profiles(cfg: ReaderConfig, ms=(1, 2, 4)):
    """A ready-made link ladder from a base config: one profile per
    requested encoding (fastest first), sharing the base radio rates,
    each with the decimation that leaves ~5 RX samples per chip (half-bit
    for FM0) — the reference's own operating density (SURVEY §2.4).

    With the 2 Msps reference rates this yields FM0/decim-5, Miller-2/
    decim-2 and Miller-4/decim-1 (6.25 samples per chip post-decimation
    for the Miller rungs).
    """
    out = []
    for m in ms:
        chip_us = cfg.tag_bit_us / (2 * max(m, 1))
        chip_samples = chip_us * cfg.adc_rate / 1e6
        decim = max(1, int(chip_samples / 5))
        assert chip_samples / decim >= 2.5, (
            f"M={m} chips unresolvable at {cfg.adc_rate/1e6:.1f} Msps")
        out.append(dataclasses.replace(cfg, miller_m=m, decim=decim))
    return out


class LiveReader:
    """Drives inventory rounds over an interactive channel.

    ``adaptive``: run a Q controller (QueryAdjust when round(Qfp) moves).
    ``q_mode`` selects it:

    * ``"annexd"`` — the Gen2 Annex-D walk the reference ships synthesis
      for (reader_impl.cc:156-162): Qfp += q_c on a collision slot,
      -= q_c on an empty slot.  Blind to collision *multiplicity*, so it
      climbs one fractional step per collided slot and oscillates at the
      optimum.
    * ``"backlog"`` — population-estimating controller (new capability,
      enabled by SIC): each slot yields an occupancy observation k_hat
      (0 empty / 1 single / 2.39 collision — E[colliders | collision] at
      the Aloha optimum, Schoute 1983).  At each round boundary the
      population estimate n_hat = mean(k_hat) * 2^Q (blended 50/50 with
      the carried estimate) sets Qfp = log2(n_hat) directly, so Q
      *jumps* to the right value instead of walking; mid-round
      QueryAdjust fires only on decisive under-sizing (qfp - q >= 1.5,
      i.e. collisions so dense the round is pointless to finish —
      aborting a round re-randomizes every tag, so weak evidence must
      never do it).  With ``sic=True`` the SIC pass-1 cancel ratio
      refines k_hat: a "collision" verdict whose window is ~fully
      explained by one template (cancel > 0.985; measured split:
      singles >= 0.992, true collisions <= 0.975) downgrades to 1.5,
      and a "single" verdict with substantial unexplained energy
      upgrades to 2.39 (phase-aligned collisions the margin classifier
      misses).

    ``nak_on_fail``: transmit a NAK after a failed EPC CRC on an occupied
    slot (SEND_NAK_QR/Q parity).  In session inventory a NAK also keeps
    the failed tag in the current pass: it returns the tag to arbitrate
    WITHOUT toggling its inventoried flag (Gen2 6.3.2.4).
    ``power_down_every``: emit POWER_DOWN + START CW before every Nth
    Query round (0 = never, the reference's effective behavior).
    ``target_ab``: session inventory (new capability; the reference pins
    TARGET=0, global_vars.h:121).  Queries carry the reader's current
    target flag; singulated tags toggle their inventoried flag and drop
    out of the pass, and when a full Query round comes back empty the
    reader flips its target to inventory the other population — each tag
    is read exactly once per pass instead of once per round.  Requires a
    channel with session semantics (``SimTagChannel(session_ab=True)``).
    ``select_mask``: (mask_bits, pointer) — transmit a Gen2 Select
    (6.3.2.12.1.1; mandatory in the spec, absent from the reference) at
    power-up and after every power-down, asserting SL on tags whose EPC
    bank matches ``mask_bits`` at bit address ``pointer`` (0x20 = EPC
    field start); Queries then carry Sel=SL so only the masked
    sub-population is inventoried.  ``select_bank`` ("epc"/"tid"/"user"),
    ``select_target`` ("sl", or "s0".."s3" to pre-position a session's
    inventoried flags instead — pair with ``target_ab``), and
    ``select_action`` (0-7, table 6.29) generalize it; Untraceable-hidden
    words never match.
    ``access_read``: (wordptr, wordcount[, bank]) — after every correct
    EPC, run the Gen2 access sequence (6.3.2.12.3; the reference never
    leaves inventory): Req_RN(RN16) → CRC-checked 16-bit handle →
    Read(bank, wordptr, wordcount) → header-0 + data words + handle echo
    + CRC-16, all verified.  Read words land in
    ``LiveStats.read_words[tag_id]``.
    ``access_write``: (wordptr, word_bits16[, bank]) — Write one word
    (default USER bank; EPC-bank words >= 2 re-label the tag): a second
    Req_RN(handle) fetches the cover-code RN16, the data travels XOR'd
    with it, and the tag's header-0 + handle + CRC-16 success reply is
    verified.  Combine with ``access_read`` for write-then-read-back.
    ``access_pwd``: 32-bit password — run the Gen2 Access sequence
    (6.3.2.12.3.6) after the handle: two cover-coded halves, each echoed
    with the handle; success moves the tag to Secured, unlocking
    password-locked reads/writes and enabling Lock.
    ``lock``: a 20-bit Lock payload (``gen2.lock_payload``) transmitted
    from the Secured state (6.3.2.12.3.5); the header-0 + handle + CRC
    success reply is verified.
    ``block_write``: (wordptr, data_bits[, bank]) — one BlockWrite of
    ``len(data_bits)//16`` words, plaintext data (6.3.2.12.3.7).
    ``kill_pwd``: 32-bit kill password — after each correct EPC, transmit
    the two-step Kill sequence (6.3.2.12.3.4); on the second success reply
    the tag is dead and never answers again.
    ``authenticate``: (key_id, key16bytes) — Gen2 v2 cryptographic tag
    authentication (6.3.2.12.3.11 + ISO 29167-10 AES-128 TAM1): after each
    correct EPC and handle, the reader draws a fresh 96-bit challenge,
    transmits Authenticate (SenRep=1), decodes the 128-bit immediate
    response, decrypts it and verifies the embedded challenge — proof the
    tag holds the key, replay-proof by construction.
    ``challenge_auth``: (key_id, key16bytes) — the broadcast variant
    (6.3.2.12.3.10): one Challenge before inventory lets every tag
    precompute its response; after singulation a ReadBuffer (6.3.2.12.3.12)
    fetches and verifies it, amortizing the crypto across the population.
    ``untraceable``: kwargs dict for ``gen2.untraceable_bits`` (e.g.
    ``dict(epc_words=2, tid="all", range_="reduced")``) — the Gen2 v2
    privacy command (6.3.2.12.3.13), issued from the Secured state after
    each correct EPC: the tag thereafter exposes a truncated EPC, hides
    TID/USER memory, and/or answers at reduced backscatter power.
    ``key_update``: (key_id, old_key16, new_key16) — over-the-air key
    provisioning (Gen2 v2 KeyUpdate shape + ISO 29167-10): the new key
    travels AES-encrypted under the current key, from the Secured state;
    the delayed success reply is verified.  Combine with ``authenticate``
    under the new key on a later pass to prove installation.
    ``authenticate_read``: (key_id, key16, wordptr, n_blocks[, bank]) —
    TAM2 authenticated *confidential* read: one Authenticate both proves
    the key and returns ``n_blocks`` 128-bit blocks of tag memory
    CBC-encrypted under it (IV = the tag-random auth block, so repeated
    reads of the same words never produce the same ciphertext).  Decrypted
    words land in ``LiveStats.secure_read_words[tag_id]``.
    """

    #: E[tags per collided slot] at the framed-Aloha optimum (Schoute).
    SCHOUTE_K = 2.39
    #: SIC pass-1 cancel-ratio split between one-tag and multi-tag windows.
    SIC_MULTI_CANCEL = 0.985

    def __init__(
        self,
        cfg: ReaderConfig,
        *,
        adaptive: bool = False,
        q_init: Optional[int] = None,
        q_c: float = 0.35,
        q_mode: str = "annexd",
        nak_on_fail: bool = False,
        power_down_every: int = 0,
        sic: bool = False,
        target_ab: bool = False,
        select_mask=None,
        select_bank: str = "epc",
        select_target: str = "sl",
        select_action: int = 0,
        select_truncate: bool = False,
        access_read=None,
        access_write=None,
        access_pwd: Optional[int] = None,
        lock=None,
        block_write=None,
        block_erase=None,
        block_permalock=None,
        kill_pwd: Optional[int] = None,
        authenticate=None,
        challenge_auth=None,
        untraceable=None,
        key_update=None,
        authenticate_read=None,
        secure_read=None,
        secure_write=None,
        auth_comm_write=None,
        hop_mhz=None,
        hop_every: int = 1,
        link_profiles=None,
        link_down_after: int = 1,
        link_up_after: int = 4,
        link_probe: bool = True,
        lbt_mhz=None,
        lbt_listen_us: float = 200.0,
        lbt_margin_db: float = 6.0,
        lbt_floor_min: float = 1e-9,
    ):
        assert q_mode in ("annexd", "backlog")
        self.target_ab = target_ab
        self.target = int(cfg.target)
        self.select_mask = select_mask
        # Select generality (Gen2 6.3.2.12.1.1): bank (epc/tid/user),
        # target ("sl" or "s0".."s3" = a session's inventoried flag) and
        # action (0-7, table 6.29).  Queries carry Sel=SL only when the
        # Select targets SL; session-flag Selects pre-position the A/B
        # populations instead.
        self.select_bank = select_bank
        self.select_target = select_target
        self.select_action = select_action
        self._sel = (gen2.SEL_SL
                     if select_mask is not None and select_target == "sl"
                     else None)
        # Select Truncate=1 (Gen2 6.3.2.12.1.1): ACKed tags backscatter
        # only the EPC following the mask (+ header-0 + CRC-16) - the
        # air-time saving for long masks.  The reader derives the reply
        # length from its own mask and the population EPC length
        # (cfg.epc_bits), so the decode window is static.
        self.select_truncate = select_truncate
        self._trunc_nb = None
        if select_truncate:
            assert select_mask is not None, "truncate needs a Select mask"
            mask, pointer = select_mask
            epc_len = 16 * ((cfg.epc_bits - 33) // 16)
            rem = (0x20 + epc_len) - (pointer + len(mask))
            assert rem >= 8, "mask leaves too little EPC to identify a tag"
            self._trunc_nb = 1 + rem + 16      # header + remainder + CRC
        self.access_read = access_read
        self.access_write = access_write
        self.access_pwd = access_pwd
        self.lock = lock
        self.block_write = block_write
        # (wordptr, wordcount[, bank]): BlockErase after each correct EPC.
        self.block_erase = block_erase
        # (blockptr, mask_bits | None): BlockPermalock - None mask reads
        # the permalock status, a mask permalocks those blocks (Secured).
        self.block_permalock = block_permalock
        self.kill_pwd = kill_pwd
        # Gen2 v2 authentication: (key_id, 16-byte AES-128 key).
        self.authenticate = authenticate
        self.challenge_auth = challenge_auth
        # Gen2 v2 Untraceable kwargs (needs Secured: pair with access_pwd
        # unless the tag's access password is zero).
        self.untraceable = untraceable
        # (key_id, old_key, new_key) over-the-air key provisioning.
        self.key_update = key_update
        # (key_id, key, wordptr, n_blocks[, bank]) TAM2 confidential read.
        self.authenticate_read = authenticate_read
        # Gen2 v2 AuthComm/SecureComm encapsulation (6.3.2.12.3.14-15):
        # one TAM1 exchange establishes the session, then
        #   secure_read  = (key_id, key, wordptr, wordcount[, bank]) -
        #     encrypted Read: the words never travel in clear;
        #   secure_write = (key_id, key, wordptr, data_bits16[, bank]) -
        #     encrypted Write (supersedes RN16 cover-coding);
        #   auth_comm_write = (key_id, key, wordptr, data_bits16[, bank]) -
        #     MAC-authenticated cleartext Write (a keyless rogue reader
        #     cannot forge it).
        # When several are set they share the first option's session.
        self.secure_read = secure_read
        self.secure_write = secure_write
        self.auth_comm_write = auth_comm_write
        # FCC frequency hopping: cycle these carriers (MHz), retuning the
        # channel every ``hop_every`` Query rounds.  A hopping session's
        # per-read phases span multiple carriers -> live PDOA range
        # (``LiveStats.range_estimate``).  The FCC plan is 50 channels /
        # 500 kHz in 902.75-927.25; any >= 2 distinct carriers work.
        self.hop_mhz = list(hop_mhz) if hop_mhz else None
        self.hop_every = max(1, int(hop_every))
        self._carrier_hz = float(cfg.freq_hz)
        self._challenge = None       # outstanding broadcast challenge bits
        self._auth_rng = np.random.default_rng(0x29167)
        self.cfg = cfg
        self.enc = PieEncoder(cfg)
        self.stats = LiveStats()
        self.adaptive = adaptive
        self.q_mode = q_mode
        self._n_est = 1.0        # carried population estimate (backlog)
        self._round_k = 0.0      # sum of k_hat over this round's slots
        self._round_slots = 0
        # Capture-style collision recovery (dsp/collision.py, FM0 and
        # Miller-M incl. TRext pilots): the SIC decoder's pass 1 equals
        # the plain RN16 decode, so on a collided slot the ACK carries
        # the dominant tag's exact RN16 and its EPC is read instead of
        # the slot being lost.
        self.sic = sic
        self.q = cfg.fixed_q if q_init is None else q_init
        self.qfp = float(self.q)
        self.q_c = q_c
        self.nak_on_fail = nak_on_fail
        self.power_down_every = power_down_every
        # Link-rate adaptation (new capability; Gen2 readers own the M /
        # TRext fields of every Query, 6.3.2.12.1, so the reply encoding
        # is a per-round reader decision - commercial readers' "autoset").
        # ``link_profiles`` is an ordered ladder, fastest link first, most
        # robust (highest Miller M) last; all profiles share the radio
        # rates (adc/dac) and differ in miller_m / decim / trext.  A round
        # with occupied slots decoding < 50% steps down the ladder after
        # ``link_down_after`` consecutive such rounds; ``link_up_after``
        # consecutive fully-clean rounds step back up.  The SimTagChannel
        # honors the commanded M per Query (sim/channel.py link_cfg), so
        # switches take effect mid-inventory with no channel restart.
        self.link_profiles = list(link_profiles) if link_profiles else None
        self._link_idx = 0
        self._link_bad = 0
        self._link_clean = 0
        self.link_down_after = max(1, int(link_down_after))
        self.link_up_after = max(1, int(link_up_after))
        self.link_probe = bool(link_probe)
        # Listen-before-talk over a channel plan (new capability; ETSI
        # EN 302 208-style clear-channel assessment - see ETSI_LOWER_MHZ).
        # Before each Query round the reader listens with its TX off; a
        # channel more than ``lbt_margin_db`` above the plan's measured
        # noise floor (surveyed once at start) is busy, and the reader
        # moves to the next channel of the plan instead of transmitting
        # over the other occupant.
        self.lbt_mhz = list(lbt_mhz) if lbt_mhz else None
        self.lbt_listen_us = float(lbt_listen_us)
        self.lbt_margin_db = float(lbt_margin_db)
        # Absolute lower bound on the measured noise floor: in a clean
        # (noiseless-sim / high-gain-squelched) environment the measured
        # floor can be ~0, which would make every nonzero channel read
        # busy; and the per-channel history keeps the floor fresh when the
        # ambient level or RX gain changes mid-inventory (a one-shot
        # survey would go stale).
        self.lbt_floor_min = float(lbt_floor_min)
        self._lbt_hist: dict = {}
        self._lbt_idx = 0
        if self.lbt_mhz:
            assert hop_mhz is None, "LBT and fixed hopping are exclusive"
            diffs = [abs(f * 1e6 - cfg.freq_hz) for f in self.lbt_mhz]
            self._lbt_idx = int(np.argmin(diffs))
        if self.link_profiles:
            rates = {(p.adc_rate, p.dac_rate) for p in self.link_profiles}
            assert len(rates) == 1, "link profiles must share radio rates"
            assert cfg in self.link_profiles, (
                "cfg must be one of link_profiles (the starting rung)")
            self._link_idx = self.link_profiles.index(cfg)
        # RX context carried between exchanges so the gate's moving average
        # and DC state are warm when each reply window arrives.
        n_taps = int(cfg.tag_bit_us / 2 * cfg.adc_rate / 1e6 / cfg.miller_m)
        self._ctx_len = (cfg.win_length + cfg.n_samples_t1 + 64) * cfg.decim + n_taps
        self._block_shapes = set()   # distinct (len, mode) decode shapes
        self._reset_ctx()

    # ---- link-rate adaptation ----

    def _apply_link_profile(self, idx: int) -> None:
        """Switch to ladder rung ``idx``: the next Query carries the new
        M/TRext (tags follow it per spec), and the reader's own TX tables,
        decode jits and gate context re-key to the new config."""
        p = self.link_profiles[idx]
        self._link_idx = idx
        self.cfg = p
        self.enc = PieEncoder(p)
        n_taps = int(p.tag_bit_us / 2 * p.adc_rate / 1e6 / p.miller_m)
        self._ctx_len = ((p.win_length + p.n_samples_t1 + 64) * p.decim
                         + n_taps)
        self._reset_ctx()
        self.stats.link_trace.append((self.stats.cur_round, p.miller_m))
        _log.debug("LINK | -> M=%d decim=%d", p.miller_m, p.decim)

    def _link_update(self, occupied: int, ok: int) -> None:
        """Round-boundary rate control: downshift on failing (or, with
        ``link_probe``, silent) rounds, upshift after sustained clean
        rounds.

        ``link_probe`` matters under strong in-channel interference: the
        jammer inflates the gate's CW noise estimate, so jammed slots
        classify *empty* — indistinguishable from an absent tag at this
        layer.  Probing downward on silence is safe either way: an absent
        tag merely parks the reader on the robust rung (reads resume
        immediately when it appears), while a jammed FM0 link walks to
        the Miller rung that clears the interferer — the dense-reader
        autoset behavior."""
        if not self.link_profiles:
            return
        eff = max(occupied, ok)
        if eff == 0:
            if not self.link_probe:
                return
            self._link_bad += 1
            self._link_clean = 0
        elif ok < 0.5 * eff:
            self._link_bad += 1
            self._link_clean = 0
        elif ok == eff:
            self._link_clean += 1
            self._link_bad = 0
        else:
            self._link_bad = 0
            self._link_clean = 0
        if (self._link_bad >= self.link_down_after
                and self._link_idx + 1 < len(self.link_profiles)):
            self._link_bad = 0
            self._link_clean = 0
            self._apply_link_profile(self._link_idx + 1)
        elif self._link_clean >= self.link_up_after and self._link_idx > 0:
            self._link_bad = 0
            self._link_clean = 0
            self._apply_link_profile(self._link_idx - 1)

    # ---- listen-before-talk ----

    def _listen_power(self, channel, bw_hz: float = 200e3) -> float:
        """One TX-off sensing window: mean ambient power INSIDE the
        200 kHz channel (FFT band power) — a neighbor's carrier two
        channels over must not read as local occupancy."""
        rx = np.asarray(channel.exchange(
            "listen", np.zeros(0, np.int64), np.zeros(0, np.float32),
            self.lbt_listen_us))
        if rx.size == 0:
            return 0.0
        spec = np.abs(np.fft.fft(rx)) ** 2
        f = np.fft.fftfreq(rx.size, 1.0 / self.cfg.adc_rate)
        band = np.abs(f) <= bw_hz / 2
        return float(spec[band].sum() / rx.size ** 2)

    def _lbt_note(self, f_mhz: float, power: float) -> None:
        """Record a sensing measurement into the per-channel history (the
        rolling floor estimate; bounded so a permanent ambient rise ages
        old lows out instead of pinning the floor forever)."""
        hist = self._lbt_hist.setdefault(f_mhz, [])
        hist.append(power)
        del hist[:-8]

    def _lbt_thresh(self) -> float:
        """Busy threshold: margin over the freshest floor estimate (min of
        recent sensing windows across the plan), never below the absolute
        minimum (`lbt_floor_min`)."""
        floor = min(min(h) for h in self._lbt_hist.values())
        return max(floor, self.lbt_floor_min) * 10.0 ** (
            self.lbt_margin_db / 10.0)

    def _lbt_check(self, channel) -> None:
        """Clear-channel assessment before a Query round: move off busy
        channels.  The first call surveys the whole plan for its noise
        floor; afterwards every sensing window feeds the rolling
        per-channel floor history so the threshold tracks ambient/gain
        changes instead of going stale."""
        if not self.lbt_mhz:
            return
        if not self._lbt_hist:
            for f in self.lbt_mhz:
                if hasattr(channel, "retune"):
                    channel.retune(f * 1e6)
                self._lbt_note(f, self._listen_power(channel))
            f0 = self.lbt_mhz[self._lbt_idx]
            self._carrier_hz = f0 * 1e6
            if hasattr(channel, "retune"):
                channel.retune(self._carrier_hz)
        for _ in range(len(self.lbt_mhz)):
            p = self._listen_power(channel)
            self._lbt_note(self.lbt_mhz[self._lbt_idx], p)
            if p <= self._lbt_thresh():
                return
            # Busy: defer to the next channel of the plan.
            self.stats.n_lbt_defers += 1
            self._lbt_idx = (self._lbt_idx + 1) % len(self.lbt_mhz)
            f = self.lbt_mhz[self._lbt_idx]
            self._carrier_hz = f * 1e6
            if hasattr(channel, "retune"):
                channel.retune(self._carrier_hz)
            self.stats.lbt_trace.append((self.stats.cur_round, f))
            _log.debug("LBT | busy, -> %.1f MHz", f)
        _log.debug("LBT | all channels busy; transmitting anyway")

    # ---- per-block decode (jitted; one stable shape per command kind) ----

    def _reset_ctx(self) -> None:
        """Zero (not empty) context keeps block shapes stable across
        power-down resets, so no recompiles occur mid-inventory."""
        self._ctx = np.zeros(self._ctx_len, np.complex64)

    @staticmethod
    def _bank_code(name: str):
        return {"reserved": gen2.MEMBANK_RESERVED, "epc": gen2.MEMBANK_EPC,
                "tid": gen2.MEMBANK_TID, "user": gen2.MEMBANK_USER}[name]

    def _req_rn(self, channel, rn: np.ndarray):
        """One Req_RN exchange; returns the CRC-verified 16-bit reply RN
        (a handle from an Acknowledged tag, or a Write cover-code from an
        Open tag) or None."""
        cfg = self.cfg
        pre = 1 + cfg.effective_preamble_bits      # dummy-1 + preamble
        rr = gen2.req_rn_bits(rn)
        cw = float(cfg.t1_us + cfg.t2_us + (32 + pre) * cfg.tag_bit_us)
        rx = channel.exchange("req_rn", rr, self.enc.command(rr), cw)
        out = self._decode_window(rx, "acc:32")
        if out is None:
            return None
        if not np.array_equal(gen2._crc16_any(out[:16]), out[16:]):
            return None
        return out[:16]

    @property
    def _wants_access(self) -> bool:
        return any(x is not None for x in (
            self.access_read, self.access_write, self.access_pwd,
            self.lock, self.block_write, self.block_erase,
            self.block_permalock, self.kill_pwd, self.authenticate,
            self.challenge_auth, self.untraceable, self.key_update,
            self.authenticate_read, self.secure_read, self.secure_write,
            self.auth_comm_write))

    def _delayed_ok(self, out, handle) -> bool:
        """Verify a delayed success reply (Write/BlockWrite/Lock/final
        Kill): header-0 + handle echo + CRC-16 over header+handle."""
        return (out is not None and out[0] == 0
                and np.array_equal(out[1:17], handle)
                and np.array_equal(gen2._crc16_any(out[:17]), out[17:33]))

    def _record_error(self, out, handle) -> bool:
        """Check a decoded window (>= 41 bits) for an Annex-I error reply
        addressed to ``handle``; record it in ``error_counts``."""
        if out is None or len(out) < gen2.ERROR_REPLY_BITS:
            return False
        name, h, ok = gen2.parse_error_reply(out)
        if not (ok and np.array_equal(h, handle)):
            return False
        st = self.stats
        st.error_counts[name] = st.error_counts.get(name, 0) + 1
        _log.debug("TAG ERROR | %s", name)
        return True

    def _delayed_exchange(self, channel, kind, bits, handle) -> bool:
        """Transmit a delayed-reply access command; decode success
        (header-0 + handle + CRC) or an Annex-I error reply (header-1 +
        code + handle + CRC, 41 bits - the window covers both)."""
        cfg = self.cfg
        pre = 1 + cfg.effective_preamble_bits
        nb = gen2.ERROR_REPLY_BITS              # 41 >= the 33-bit success
        cw = float(cfg.t1_us + cfg.t2_us + (nb + pre) * cfg.tag_bit_us)
        rx = channel.exchange(kind, bits, self.enc.command(bits), cw)
        out = self._decode_window(rx, f"acc:{nb}")
        if self._delayed_ok(out, handle):
            return True
        self._record_error(out, handle)
        return False

    def _tam1_session(self, channel, handle, key_id: int, key):
        """One TAM1 exchange establishing an AuthComm/SecureComm session.

        Returns (challenge96, trnd32) - the session secret both sides now
        hold (the tag stored its half in ``Tag.session``) - or None when
        the tag stayed silent or the crypto check failed."""
        from ..protocol import crypto

        cfg = self.cfg
        st = self.stats
        pre = 1 + cfg.effective_preamble_bits
        chal = self._auth_rng.integers(0, 2, 96).astype(np.int64)
        ab = gen2.authenticate_bits(
            handle, crypto.tam1_message(key_id, chal))
        nb = 1 + crypto.TAM1_RESPONSE_BITS + 32
        cw = float(cfg.t1_us + cfg.t2_us + (nb + pre) * cfg.tag_bit_us)
        rx = channel.exchange("authenticate", ab, self.enc.command(ab), cw)
        out = self._decode_window(rx, f"acc:{nb}")
        if (out is None or out[0] != 0
                or not np.array_equal(out[129:145], handle)
                or not np.array_equal(gen2._crc16_any(out[:145]),
                                      out[145:])):
            return None
        ok, trnd = crypto.tam1_verify(bytes(key), chal, out[1:129])
        if not ok:
            st.n_auth_fail += 1
            return None
        return chal, trnd

    def _pwd_step(self, channel, handle, half, kind: str):
        """One cover-coded password half (Access or Kill): Req_RN(handle)
        fetches the cover RN16, the half travels XOR'd with it.  Returns
        the decoded reply bits (None = tag silent)."""
        cfg = self.cfg
        cover = self._req_rn(channel, handle)
        if cover is None:
            return None
        cc = (np.asarray(half) + cover) % 2
        if kind == "access":
            bits = gen2.access_bits(handle, cc)
            nb = 32                                 # handle + CRC echo
        else:
            bits = gen2.kill_bits(handle, cc)
            nb = 32 if kind == "kill1" else 33      # final reply is delayed
        pre = 1 + cfg.effective_preamble_bits
        cw = float(cfg.t1_us + cfg.t2_us + (nb + pre) * cfg.tag_bit_us)
        rx = channel.exchange("access" if kind == "access" else "kill",
                              bits, self.enc.command(bits), cw)
        return self._decode_window(rx, f"acc:{nb}")

    def _access_sequence(self, channel, rn16, tid: int) -> None:
        """Req_RN -> handle, then the configured access commands
        (Gen2 6.3.2.12.3) in spec order: Access (-> Secured), Lock, Write,
        BlockWrite, Read, Kill.  Every reply is CRC-16-verified and must
        echo the handle; passwords and Write data travel cover-coded."""
        cfg = self.cfg
        st = self.stats
        pre = 1 + cfg.effective_preamble_bits      # dummy-1 + preamble

        handle = self._req_rn(channel, rn16)
        if handle is None:
            return
        st.n_req_rn_ok += 1
        _log.debug("REQ_RN OK | handle=%s", "".join(map(str, handle)))

        if self.access_pwd is not None:
            hi, lo = gen2.pwd_halves(self.access_pwd)
            ok = True
            for half in (hi, lo):
                out = self._pwd_step(channel, handle, half, "access")
                if (out is None or not np.array_equal(out[:16], handle)
                        or not np.array_equal(gen2._crc16_any(out[:16]),
                                              out[16:])):
                    ok = False
                    break
            if not ok:
                return
            st.n_access_ok += 1
            _log.debug("ACCESS OK | tag %#x secured", tid)

        if self.authenticate is not None:
            # Gen2 v2 TAM1 (6.3.2.12.3.11): fresh challenge per tag,
            # immediate response, decrypt-and-compare.  The crypto suite
            # follows the key length: ISO 29167-10 AES-128 (16 bytes,
            # 96-bit challenge / 128-bit response) or ISO 29167-11
            # PRESENT-80 (10 bytes, 48 / 64).
            from ..protocol import crypto

            key_id, key = self.authenticate
            cb, rb, _ = crypto.tam1_params(
                crypto.suite_for_key(bytes(key)))
            chal = self._auth_rng.integers(0, 2, cb).astype(np.int64)
            ab = gen2.authenticate_bits(
                handle, crypto.tam1_message(key_id, chal),
                csi=crypto.suite_for_key(bytes(key)))
            nb = 1 + rb + 32
            cw = float(cfg.t1_us + cfg.t2_us + (nb + pre) * cfg.tag_bit_us)
            rx = channel.exchange("authenticate", ab, self.enc.command(ab),
                                  cw)
            out = self._decode_window(rx, f"acc:{nb}")
            if (out is not None and out[0] == 0
                    and np.array_equal(out[1 + rb: 17 + rb], handle)
                    and np.array_equal(gen2._crc16_any(out[:17 + rb]),
                                       out[17 + rb:])):
                ok, _ = crypto.tam1_verify(bytes(key), chal,
                                           out[1: 1 + rb])
                if ok:
                    st.n_auth_ok += 1
                    _log.debug("AUTHENTICATE OK | tag %#x", tid)
                else:
                    st.n_auth_fail += 1
                    _log.debug("AUTHENTICATE CRYPTO FAIL | tag %#x", tid)

        if self.authenticate_read is not None:
            # TAM2 authenticated confidential read: one exchange proves
            # the key AND returns CBC-encrypted memory (never in clear).
            from ..protocol import crypto

            key_id, key, wordptr, n_blocks = self.authenticate_read[:4]
            bank = (self.authenticate_read[4]
                    if len(self.authenticate_read) > 4 else "user")
            chal = self._auth_rng.integers(0, 2, 96).astype(np.int64)
            ab = gen2.authenticate_bits(
                handle, crypto.tam2_message(key_id, chal,
                                            self._bank_code(bank),
                                            wordptr, n_blocks))
            resp_bits = 128 * (1 + n_blocks)
            nb = 1 + resp_bits + 32
            cw = float(cfg.t1_us + cfg.t2_us + (nb + pre) * cfg.tag_bit_us)
            rx = channel.exchange("authenticate", ab, self.enc.command(ab),
                                  cw)
            out = self._decode_window(rx, f"acc:{nb}")
            if (out is not None and out[0] == 0
                    and np.array_equal(out[1 + resp_bits: 17 + resp_bits],
                                       handle)
                    and np.array_equal(gen2._crc16_any(out[: nb - 16]),
                                       out[nb - 16:])):
                ok, data = crypto.tam2_verify(bytes(key), chal,
                                              out[1: 1 + resp_bits])
                if ok:
                    st.n_tam2_ok += 1
                    st.secure_read_words[tid] = data
                    _log.debug("TAM2 SECURE READ OK | tag %#x words=%d",
                               tid, 8 * n_blocks)
                else:
                    st.n_auth_fail += 1

        if (self.secure_read is not None or self.secure_write is not None
                or self.auth_comm_write is not None):
            # Gen2 v2 AuthComm/SecureComm encapsulation: establish the
            # TAM1 session once, then run the configured encapsulated
            # commands under it (protocol/crypto.py session construction).
            from ..protocol import crypto

            first = (self.secure_read or self.secure_write
                     or self.auth_comm_write)
            key_id, key = first[0], bytes(first[1])
            sess = self._tam1_session(channel, handle, key_id, key)
            if sess is not None:
                chal, trnd = sess
                ctr = 0
                if self.auth_comm_write is not None:
                    wordptr, data = self.auth_comm_write[2:4]
                    bank = (self.auth_comm_write[4]
                            if len(self.auth_comm_write) > 4 else "user")
                    wb = gen2.write_bits(handle, np.asarray(data),
                                         membank=self._bank_code(bank),
                                         wordptr=wordptr)
                    mac = crypto.session_mac(key, chal, trnd, wb, ctr=ctr,
                                             direction=0)
                    ac = gen2.auth_comm_bits(handle, wb, mac)
                    ctr += 1
                    if self._delayed_exchange(channel, "auth_comm", ac,
                                              handle):
                        st.n_auth_comm_ok += 1
                        _log.debug("AUTHCOMM WRITE OK | tag %#x word %d",
                                   tid, wordptr)
                if self.secure_write is not None:
                    wordptr, data = self.secure_write[2:4]
                    bank = (self.secure_write[4]
                            if len(self.secure_write) > 4 else "user")
                    wb = gen2.write_bits(handle, np.asarray(data),
                                         membank=self._bank_code(bank),
                                         wordptr=wordptr)
                    ks = crypto.session_keystream(key, chal, trnd, ctr,
                                                  wb.size, direction=0)
                    sc = gen2.secure_comm_bits(handle, (wb + ks) % 2)
                    ctr += 1
                    if self._delayed_exchange(channel, "secure_comm", sc,
                                              handle):
                        st.n_secure_write_ok += 1
                        _log.debug("SECURECOMM WRITE OK | tag %#x word %d",
                                   tid, wordptr)
                if self.secure_read is not None:
                    wordptr, wc = self.secure_read[2:4]
                    bank = (self.secure_read[4]
                            if len(self.secure_read) > 4 else "user")
                    rb = gen2.read_bits(handle,
                                        membank=self._bank_code(bank),
                                        wordptr=wordptr, wordcount=wc)
                    ks = crypto.session_keystream(key, chal, trnd, ctr,
                                                  rb.size, direction=0)
                    sc = gen2.secure_comm_bits(handle, (rb + ks) % 2)
                    nb = 1 + 16 * wc + 16 + 16
                    cw = float(cfg.t1_us + cfg.t2_us
                               + (nb + pre) * cfg.tag_bit_us)
                    rx = channel.exchange("secure_comm", sc,
                                          self.enc.command(sc), cw)
                    out = self._decode_window(rx, f"acc:{nb}")
                    if (out is not None and out[0] == 0
                            and np.array_equal(
                                out[1 + 16 * wc: 17 + 16 * wc], handle)
                            and np.array_equal(
                                gen2._crc16_any(out[: nb - 16]),
                                out[nb - 16:])):
                        ks2 = crypto.session_keystream(
                            key, chal, trnd, ctr, 16 * wc, direction=1)
                        st.secure_read_words[tid] = (
                            out[1: 1 + 16 * wc] + ks2) % 2
                        st.n_secure_read_ok += 1
                        _log.debug("SECURECOMM READ OK | tag %#x words=%d",
                                   tid, wc)
                    else:
                        # Rejected inner commands answer with a cleartext
                        # Annex-I error reply (the envelope protects data,
                        # not the failure class).
                        self._record_error(out, handle)
                    ctr += 1

        if self.challenge_auth is not None and self._challenge is not None:
            # Fetch the Challenge-precomputed response (6.3.2.12.3.12) and
            # verify it against the broadcast challenge.
            from ..protocol import crypto

            _, key = self.challenge_auth
            _, resp_b, _ = crypto.tam1_params(
                crypto.suite_for_key(bytes(key)))
            rb = gen2.readbuffer_bits(handle, bitcount=resp_b)
            nb = 1 + resp_b + 32
            cw = float(cfg.t1_us + cfg.t2_us + (nb + pre) * cfg.tag_bit_us)
            rx = channel.exchange("readbuffer", rb, self.enc.command(rb), cw)
            out = self._decode_window(rx, f"acc:{nb}")
            if (out is not None and out[0] == 0
                    and np.array_equal(out[1 + resp_b: 17 + resp_b], handle)
                    and np.array_equal(gen2._crc16_any(out[:17 + resp_b]),
                                       out[17 + resp_b:])):
                ok, _ = crypto.tam1_verify(bytes(key), self._challenge,
                                           out[1: 1 + resp_b])
                if ok:
                    st.n_buffer_auth_ok += 1
                    _log.debug("READBUFFER AUTH OK | tag %#x", tid)
                else:
                    st.n_auth_fail += 1

        if self.key_update is not None:
            # Over-the-air key provisioning: new key encrypted under the
            # current key (ISO 29167-10; nothing travels in clear).
            from ..protocol import crypto

            key_id, old_key, new_key = self.key_update
            enc = crypto.bytes_to_bits(
                crypto.aes128_encrypt_block(bytes(old_key), bytes(new_key)))
            kb = gen2.keyupdate_bits(handle, key_id, enc)
            if self._delayed_exchange(channel, "keyupdate", kb, handle):
                st.n_keyupdate_ok += 1
                _log.debug("KEYUPDATE OK | tag %#x key %d", tid, key_id)

        if self.untraceable is not None:
            ub = gen2.untraceable_bits(handle, **self.untraceable)
            if self._delayed_exchange(channel, "untraceable", ub, handle):
                st.n_untraceable_ok += 1
                _log.debug("UNTRACEABLE OK | tag %#x", tid)

        if self.lock is not None:
            lb = gen2.lock_bits(handle, self.lock)
            if self._delayed_exchange(channel, "lock", lb, handle):
                st.n_lock_ok += 1
                _log.debug("LOCK OK | tag %#x", tid)

        if self.access_write is not None:
            wordptr, data = self.access_write[:2]
            bank = self.access_write[2] if len(self.access_write) > 2 else "user"
            cover = self._req_rn(channel, handle)   # fresh RN16 cover-code
            if cover is not None:
                wb = gen2.write_bits(
                    handle, (np.asarray(data) + cover) % 2,
                    membank=self._bank_code(bank), wordptr=wordptr)
                if self._delayed_exchange(channel, "write", wb, handle):
                    st.n_write_ok += 1
                    _log.debug("WRITE OK | tag %#x word %d", tid, wordptr)

        if self.block_write is not None:
            wordptr, data = self.block_write[:2]
            bank = self.block_write[2] if len(self.block_write) > 2 else "user"
            bw = gen2.blockwrite_bits(handle, np.asarray(data),
                                      membank=self._bank_code(bank),
                                      wordptr=wordptr)
            if self._delayed_exchange(channel, "blockwrite", bw, handle):
                st.n_blockwrite_ok += 1
                _log.debug("BLOCKWRITE OK | tag %#x words=%d", tid,
                           len(data) // 16)

        if self.block_erase is not None:
            wordptr, wordcount = self.block_erase[:2]
            bank = self.block_erase[2] if len(self.block_erase) > 2 else "user"
            eb = gen2.blockerase_bits(handle, membank=self._bank_code(bank),
                                      wordptr=wordptr, wordcount=wordcount)
            if self._delayed_exchange(channel, "blockerase", eb, handle):
                st.n_blockerase_ok += 1
                _log.debug("BLOCKERASE OK | tag %#x words=%d", tid, wordcount)

        if self.block_permalock is not None:
            blockptr, mask = self.block_permalock[:2]
            if mask is None:
                # Read/Lock=0: fetch the permalock-status bits (one mask
                # word = 16 one-word blocks).
                nb = 1 + 16 + 32
                pb = gen2.blockpermalock_bits(handle, blockptr=blockptr)
                cw = float(cfg.t1_us + cfg.t2_us + (nb + pre) * cfg.tag_bit_us)
                rx = channel.exchange("blockpermalock", pb,
                                      self.enc.command(pb), cw)
                out = self._decode_window(rx, f"acc:{nb}")
                if (out is not None and out[0] == 0
                        and np.array_equal(out[17:33], handle)
                        and np.array_equal(gen2._crc16_any(out[:33]),
                                           out[33:])):
                    st.permalock_status[tid] = np.asarray(out[1:17])
                else:
                    self._record_error(out, handle)
            else:
                mask = np.asarray(mask, dtype=np.int64)
                pb = gen2.blockpermalock_bits(
                    handle, read_lock=1, blockptr=blockptr,
                    blockrange=mask.size // 16, mask=mask)
                if self._delayed_exchange(channel, "blockpermalock", pb,
                                          handle):
                    st.n_blockpermalock_ok += 1
                    _log.debug("BLOCKPERMALOCK OK | tag %#x", tid)

        if self.access_read is not None:
            wordptr, wordcount = self.access_read[:2]
            bank = self.access_read[2] if len(self.access_read) > 2 else "epc"
            nb = 1 + 16 * wordcount + 32           # header+data+handle+CRC
            rd = gen2.read_bits(handle, membank=self._bank_code(bank),
                                wordptr=wordptr, wordcount=wordcount)
            cw = float(cfg.t1_us + cfg.t2_us + (nb + pre) * cfg.tag_bit_us)
            rx = channel.exchange("read", rd, self.enc.command(rd), cw)
            out = self._decode_window(rx, f"acc:{nb}")
            if out is not None:
                data = out[1: 1 + 16 * wordcount]
                hecho = out[1 + 16 * wordcount: 17 + 16 * wordcount]
                crc = out[nb - 16:]
                if (out[0] == 0 and np.array_equal(hecho, handle)
                        and np.array_equal(
                            gen2._crc16_any(out[: nb - 16]), crc)):
                    st.n_read_ok += 1
                    st.read_words[tid] = np.asarray(data)
                    _log.debug("READ OK | tag %#x words=%d", tid, wordcount)
                else:
                    # Annex-I error reply (41 bits <= any Read window).
                    self._record_error(out, handle)

        if self.kill_pwd is not None:
            hi, lo = gen2.pwd_halves(self.kill_pwd)
            out = self._pwd_step(channel, handle, hi, "kill1")
            if (out is not None and np.array_equal(out[:16], handle)
                    and np.array_equal(gen2._crc16_any(out[:16]), out[16:])):
                out = self._pwd_step(channel, handle, lo, "kill2")
                if self._delayed_ok(out, handle):
                    st.n_kill_ok += 1
                    _log.debug("KILL OK | tag %#x dead", tid)

    def _send_select(self, channel) -> None:
        """Transmit the configured Select (no reply expected; tags apply
        the SL action, Gen2 6.3.2.12.1.1)."""
        if self.select_mask is None:
            return
        mask, pointer = self.select_mask
        target = (gen2.SELECT_TARGET_SL if self.select_target == "sl"
                  else gen2.SELECT_TARGET_S[int(self.select_target[1])])
        sb = gen2.select_bits(np.asarray(mask), pointer,
                              membank=self._bank_code(self.select_bank),
                              target=target, action=self.select_action,
                              truncate=int(self.select_truncate))
        channel.exchange("select", sb, self.enc.select(sb),
                         float(self.cfg.cw_us))
        _log.debug("SELECT | ptr=%#x len=%d tgt=%s act=%d", pointer,
                   len(mask), self.select_target, self.select_action)

    def _send_challenge(self, channel) -> None:
        """Broadcast the Gen2 v2 Challenge (6.3.2.12.3.10): tags holding
        the key precompute their TAM1 response for later ReadBuffer
        retrieval.  Re-sent after every power-down (the ResponseBuffer does
        not survive power loss)."""
        if self.challenge_auth is None:
            return
        from ..protocol import crypto

        key_id, key = self.challenge_auth
        n_chal = crypto.tam1_params(crypto.suite_for_key(bytes(key)))[0]
        self._challenge = self._auth_rng.integers(
            0, 2, n_chal).astype(np.int64)
        cb = gen2.challenge_bits(
            crypto.tam1_message(key_id, self._challenge),
            csi=crypto.suite_for_key(bytes(key)))
        channel.exchange("challenge", cb, self.enc.command(cb),
                         float(self.cfg.cw_us))
        _log.debug("CHALLENGE | key_id=%d", key_id)

    # ADC samples per live block-shape bucket: PIE command waveforms vary
    # with the bit values (data-1 is 2x data-0, reader_impl.cc:55-56), so
    # un-bucketed blocks get a fresh shape - and a fresh XLA compile -
    # almost every ACK.  Zero-padding up to the bucket keeps the handful of
    # shapes stable after warmup (trailing zeros sit after the reply window
    # and decode as silence).
    BLOCK_BUCKET = 512

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

    # ---- the closed loop ----

    def run_inventory(self, channel, n_rounds: int) -> LiveStats:
        """Run until ``n_rounds`` round-starting commands (Query or
        QueryAdjust) have been issued and their slots walked."""
        cfg = self.cfg
        st = self.stats
        empty = np.zeros(0, np.int64)

        self._t0_run = time.perf_counter()
        # START: power-up CW before the first Query (reader_impl.cc:219-224).
        channel.exchange("cw", empty, self.enc.cw_ack, 0.0)
        self._send_select(channel)
        self._send_challenge(channel)
        self._reset_ctx()

        rounds_issued = 0
        slots_left = 0
        slot_no = 0
        next_cmd = "query"
        while True:
            t0 = time.perf_counter()
            # Re-bind per iteration: link adaptation may have switched
            # self.cfg (and the TX encoder) at the last round boundary.
            cfg = self.cfg
            cw_q = float(cfg.t1_us + cfg.t2_us + cfg.rn16_us)
            cw_a = float(3 * cfg.t1_us + cfg.t2_us + cfg.epc_us)
            # ---- command opening this slot ----
            if next_cmd in ("query", "query_adjust"):
                if rounds_issued >= n_rounds:
                    break
                rounds_issued += 1
                if next_cmd == "query":
                    if (self.power_down_every
                            and rounds_issued > 1
                            and (rounds_issued - 1) % self.power_down_every == 0):
                        # POWER_DOWN (2 ms of zeros) then START CW
                        # (reader_impl.cc:226-230 -> 219-224).
                        channel.exchange("power_down", empty,
                                         np.zeros(cfg.n_p_down_tx, np.float32),
                                         0.0)
                        channel.exchange("cw", empty, self.enc.cw_ack, 0.0)
                        # SL / ResponseBuffer do not survive power loss:
                        # re-select, re-challenge.
                        self._send_select(channel)
                        self._send_challenge(channel)
                        self._reset_ctx()
                    # Clear-channel assessment before transmitting the
                    # round (no-op without lbt_mhz).
                    self._lbt_check(channel)
                    if (self.hop_mhz
                            and (rounds_issued - 1) % self.hop_every == 0):
                        # FCC dwell boundary: hop to the next carrier.
                        k = ((rounds_issued - 1) // self.hop_every) % len(
                            self.hop_mhz)
                        self._carrier_hz = self.hop_mhz[k] * 1e6
                        if hasattr(channel, "retune"):
                            channel.retune(self._carrier_hz)
                        _log.debug("HOP | %.2f MHz", self.hop_mhz[k])
                    kind, bits = "query", gen2.query_bits(
                        cfg, self.q, self.target, self._sel)
                    tx = self.enc.query(self.q, self.target, self._sel)
                else:
                    updn = (+1 if round(self.qfp) > self.q
                            else (-1 if round(self.qfp) < self.q else 0))
                    self.q = int(np.clip(round(self.qfp), 0, 15))
                    kind, bits = "query_adjust", gen2.query_adjust_bits(cfg, updn)
                    tx = self.enc.query_adjust(updn)
                    st.n_qadjust += 1
                slots_left = 2**self.q
                slot_no = 0
                self._round_k = 0.0
                self._round_slots = 0
                round_occupied = 0
                round_epc_ok = 0
                st.q_trace.append(self.q)
            else:
                kind, bits = "query_rep", gen2.query_rep_bits(cfg)
                tx = self.enc.query_rep()
                slot_no += 1
            _log.debug("%s | round %d slot %d q=%d", kind.upper(),
                       st.cur_round, st.cur_slot, self.q)
            rx = channel.exchange(kind, bits, tx, cw_q)
            st.n_queries += 1

            # ---- RN16 decode + slot classification ----
            rn = self._decode_window(rx, "sic" if self.sic else "rn16")
            from .inventory import SLOT_COLLISION, SLOT_EMPTY

            slot_state = self._classify(rn)
            if rn is None:
                st.n_no_rn16 += 1
                rn16 = np.zeros(16, np.int64)
            else:
                rn16 = rn.bits
            if slot_state != SLOT_EMPTY:
                round_occupied += 1
            if slot_state == SLOT_EMPTY:
                st.n_empty_slots += 1
            elif slot_state == SLOT_COLLISION:
                st.n_collision_slots += 1
                if self.sic and rn is not None and rn.bits2 is not None:
                    st.sic_rn16_pairs.append((rn.bits, rn.bits2))
            else:
                st.n_single_slots += 1

            # ---- ACK always follows (reference closed-loop behavior:
            # the RN16 branch always yields 16 bits). ----
            _log.debug("SEND ACK | rn16=%s", "".join(map(str, rn16)))
            ack = gen2.ack_bits(np.asarray(rn16))
            epc_ok = False
            out = None
            if self._trunc_nb:
                # Truncated reply (Select Truncate=1): header-0 +
                # EPC-after-mask + CRC-16, in a correspondingly shorter CW
                # (the feature's air-time win).
                nb = self._trunc_nb
                cw_t = float(3 * cfg.t1_us + cfg.t2_us
                             + (nb + 1 + cfg.effective_preamble_bits)
                             * cfg.tag_bit_us)
                rx2 = channel.exchange("ack", ack, self.enc.ack(rn16), cw_t)
                tout = self._decode_window(rx2, f"acc:{nb}")
                if (tout is not None and tout[0] == 0
                        and np.array_equal(gen2._crc16_any(tout[: nb - 16]),
                                           tout[nb - 16:])):
                    epc_ok = True
                    st.n_epc_correct += 1
                    st.n_truncated_reads += 1
                    # The ID byte (last EPC byte) always rides the
                    # remainder (asserted >= 8 bits at construction).
                    tid = int("".join(map(str, tout[nb - 24: nb - 16])), 2)
                    st.tag_reads[tid] += 1
                    _log.debug("EPC (truncated) DECODED | tag %#x", tid)
                    if self._wants_access:
                        self._access_sequence(channel, rn16, tid)
            else:
                rx2 = channel.exchange("ack", ack, self.enc.ack(rn16), cw_a)
                out = self._decode_window(
                    rx2, "epc_sic" if self.sic else "epc")
            if out is not None:
                h_read = None
                if self.sic:
                    epc_bits, epc_ok, epc_bits2, epc_ok2 = out
                else:
                    epc_bits, epc_ok, h_read = out
                    epc_bits2, epc_ok2 = None, False
                if epc_ok:
                    st.n_epc_correct += 1
                    # PC-length-aware id (== bits[104:112] for 96-bit EPCs).
                    tid = gen2.parse_epc_frame(epc_bits)[2]
                    if h_read is not None:
                        # Per-read phase/RSSI observable at the channel's
                        # signal clock (SimTagChannel.t_samples; wall clock
                        # for radio adapters without one).
                        tsmp = getattr(channel, "t_samples", None)
                        t_s = ((tsmp - len(rx2)) / cfg.adc_rate
                               if tsmp is not None
                               else time.perf_counter() - self._t0_run)
                        st.phase_reads.setdefault(tid, []).append(
                            (t_s, float(np.angle(h_read)),
                             float(10 * np.log10(max(abs(h_read) ** 2,
                                                     1e-30))),
                             self._carrier_hz))
                    st.tag_reads[tid] += 1
                    _log.debug("EPC CORRECTLY DECODED | tag %#x", tid)
                    if slot_state == SLOT_COLLISION and self.sic:
                        st.n_sic_recovered += 1
                    if self._wants_access:
                        self._access_sequence(channel, rn16, tid)
                # EPC-window SIC: two tags that drew the SAME RN16 both
                # match the ACK and answer superposed; the residual's frame
                # self-validates via CRC-16 (dsp/collision.py::epc_sic).
                if (epc_ok2 and epc_bits2 is not None
                        and (not epc_ok
                             or not np.array_equal(epc_bits2, epc_bits))):
                    st.n_epc_correct += 1
                    st.n_epc_sic_second += 1
                    tid2 = gen2.parse_epc_frame(epc_bits2)[2]
                    st.tag_reads[tid2] += 1
                    _log.debug("EPC (SIC residual) DECODED | tag %#x", tid2)
                    epc_ok = True
            if not epc_ok and self.nak_on_fail and slot_state != SLOT_EMPTY:
                # SEND_NAK_QR/Q: NAK + CW before the next Query/QueryRep
                # (reader_impl.cc:233-249).
                channel.exchange("nak", gen2.nak_bits(), self.enc.nak(),
                                 float(cfg.cw_us))
                st.n_nak += 1

            # ---- bookkeeping + Annex-D Q update ----
            round_epc_ok += int(epc_ok)
            st.cur_slot += 1
            if st.cur_slot > 2**self.q:
                st.cur_slot = 1
                st.cur_round += 1
            if self.adaptive:
                if self.q_mode == "backlog":
                    sic_multi = (self.sic and rn is not None
                                 and rn.cancel_ratio < self.SIC_MULTI_CANCEL)
                    if slot_state == SLOT_EMPTY:
                        k_hat = 0.0
                    elif slot_state == SLOT_COLLISION or sic_multi:
                        k_hat = (self.SCHOUTE_K
                                 if sic_multi or not self.sic else 1.5)
                    else:
                        k_hat = 1.0
                    self._round_k += k_hat
                    self._round_slots += 1
                    n_hat = (self._round_k / self._round_slots
                             * float(2 ** self.q))
                    if slots_left <= 1:
                        # Round boundary: full-round evidence, decide
                        # freely (50/50 blend with the carried estimate).
                        self._n_est = 0.5 * self._n_est + 0.5 * n_hat
                        self.qfp = float(np.clip(
                            np.log2(max(self._n_est, 1.0)), 0.0, 15.0))
                    else:
                        # Mid-round: abort only on decisive under-sizing.
                        qfp = float(np.clip(
                            np.log2(max(n_hat, 1.0)), 0.0, 15.0))
                        if qfp - self.q >= 1.5:
                            self._n_est = n_hat
                            self.qfp = qfp
                        else:
                            self.qfp = float(self.q)
                elif slot_state == SLOT_COLLISION:
                    self.qfp = min(self.qfp + self.q_c, 15.0)
                elif slot_state == SLOT_EMPTY:
                    self.qfp = max(self.qfp - self.q_c, 0.0)
            slots_left -= 1
            if self.adaptive and round(self.qfp) != self.q:
                next_cmd = "query_adjust"
            elif slots_left <= 0:
                # Round boundary: full-round decode evidence drives the
                # link-rate ladder (no-op without link_profiles).
                self._link_update(round_occupied, round_epc_ok)
                if self.target_ab and round_occupied == 0:
                    # A full Query round with zero occupied slots: this
                    # pass's population is exhausted (all inventoried into
                    # the other flag) - flip the target and read it back.
                    self.target ^= 1
                    st.n_target_flips += 1
                    _log.debug("TARGET FLIP -> %s", "AB"[self.target])
                next_cmd = "query"
            else:
                next_cmd = "query_rep"
            st.slot_latency_s.append(time.perf_counter() - t0)
        return st
