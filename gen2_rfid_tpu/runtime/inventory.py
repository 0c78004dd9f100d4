"""Batch inventory decode: full pipeline + explicit round-FSM replay.

This is the TPU-native replacement for the reference's closed-loop
coordination through the mutable global ``reader_state``
(``global_vars.cc:32-54``; FSM transitions written by the decoder at
``tag_decoder_impl.cc:256-394`` and read by the reader's ``general_work``
switch at ``reader_impl.cc:216-377``).  The design inverts the control flow:

1. every heavy stage (matched filter, gate detection, window extraction,
   sync, RN16/EPC detection, CRC) runs *batched over all events at once*;
2. a tiny `lax.scan` over the event table replays the Gen2 inventory-round
   state machine (slot/round bookkeeping, Query vs ACK alternation,
   termination limits) to assemble the same statistics the reference's
   closed loop accumulates.

Decode-window roles (RN16 vs EPC) are assigned per event from the command's
classified PIE pulse count (``command_roles``) - the same information source
as the reference, where the decoder branches on which command the reader
sent (``decoder_status``, tag_decoder_impl.cc:223,291).  Roles are therefore
local facts: a missed or spurious gate event perturbs only its own slot, and
per-shard / per-chunk tables specialize without global context.  (A
structural fact of the closed loop still holds and is exploited by the
simulators and windows: the reference's RN16 branch always produces 16 bits
whenever the window fills, so every Query/QueryRep is followed by an ACK.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ReaderConfig
from ..dsp import fm0, sync
from ..dsp.filters import boxcar_taps, matched_filter_decimate
from ..dsp.gate import GateEvents, gate_detect, gate_detect_scan
from ..protocol.crc import crc16_affine
from .frames import extract_windows
from .stats import N_TAG_BINS, InventoryStats


class DecodedEvents(NamedTuple):
    """Per-event decode results (fixed capacity, mask-validated).

    All leaves are real dtypes: complex64 is kept strictly *inside* jit
    (the TPU runtime here does not support complex at jit boundaries), so
    the channel estimate is stored as (re, im) float32 planes.
    """

    index: jnp.ndarray      # (E,) int32
    valid: jnp.ndarray      # (E,) bool
    rn16_fits: jnp.ndarray  # (E,) bool
    epc_fits: jnp.ndarray   # (E,) bool
    rn16_bits: jnp.ndarray  # (E, 16) int32
    epc_bits: jnp.ndarray   # (E, 128) int32
    epc_pass: jnp.ndarray   # (E,) bool CRC verdict
    tag_id: jnp.ndarray     # (E,) int32 EPC bits[104:112]
    t_half: jnp.ndarray     # (E,) float32 estimated half period
    h_est: jnp.ndarray      # (E, 2) float32 channel estimate (re, im)
    slot_state: jnp.ndarray  # (E,) int32: 0 empty / 1 single / 2 collision
    rn16_energy: jnp.ndarray  # (E,) f32 mean |window|^2 over the RN16 window
    rn16_margin: jnp.ndarray  # (E,) f32 FM0/Miller decision margin
    cmd_type: jnp.ndarray    # (E,) int32 classified command (CMD_*)


SLOT_EMPTY, SLOT_SINGLE, SLOT_COLLISION = 0, 1, 2
CMD_QUERY, CMD_QREP, CMD_ACK, CMD_QADJ, CMD_NAK, CMD_UNKNOWN = 0, 1, 2, 3, 4, 5


def expected_pulse_counts(cfg: ReaderConfig) -> np.ndarray:
    """PIE pulse count per command type (order: CMD_QUERY..CMD_NAK).

    Every PIE symbol ends low, so each bit contributes exactly one rising
    edge, plus 4 preamble rises for Query (delim/data0/RTcal/TRcal ends)
    and 3 frame-sync rises for the rest (reader_impl.cc:98-128).
    """
    return np.array(
        [4 + cfg.query_length,            # Query: preamble + 22 bits
         3 + 4,                            # QueryRep: frame-sync + 4 bits
         3 + 2 + 16,                       # ACK: frame-sync + 18 bits
         3 + 9,                            # QueryAdjust: frame-sync + 9 bits
         3 + 8],                           # NAK: frame-sync + 8 bits
        dtype=np.int32,
    )


def classify_commands(n_pulses: jnp.ndarray, cfg: ReaderConfig) -> jnp.ndarray:
    """Classify gate events by their command's pulse count.

    New capability: the reference never looks at its own TX in the capture
    (it knows what it sent); the batch decoder recovers the command schedule
    from the pulse trains themselves, enabling command-aware accounting and
    adaptive-Q trace decode.  Counts within +-1 of a unique expected value
    match (the stream's very first command can pick up one startup edge);
    ambiguous counts are CMD_UNKNOWN.
    """
    table = jnp.asarray(expected_pulse_counts(cfg))
    diff = jnp.abs(n_pulses[:, None] - table[None, :])
    best = jnp.argmin(diff, axis=1).astype(jnp.int32)
    dmin = jnp.min(diff, axis=1)
    second = jnp.sort(diff, axis=1)[:, 1]
    ok = (dmin <= 1) & (second > dmin)
    return jnp.where(ok, best, jnp.int32(CMD_UNKNOWN))


def command_roles(cmd_type: jnp.ndarray, valid: jnp.ndarray):
    """Per-event decode-window roles from the classified command type.

    Matches the reference's role source: the decoder branches on
    ``decoder_status`` - i.e. *which command the reader sent* - not on any
    positional parity (tag_decoder_impl.cc:223,291).  Query/QueryRep/
    QueryAdjust open an RN16 reply window; ACK opens an EPC window; NAK and
    unclassifiable events get no reply window (skipped by the replay).

    This is what makes the batch decode robust to event-table anomalies: a
    missed or spurious gate event changes only its own slot, instead of
    flipping the role of every subsequent event (the failure mode of
    rank-parity assignment).
    """
    qlike = (cmd_type == CMD_QUERY) | (cmd_type == CMD_QREP) | (
        cmd_type == CMD_QADJ)
    return valid & qlike, valid & (cmd_type == CMD_ACK)


def classify_slots(energy, margin, noise_var, h2,
                   energy_factor: float = 4.0, margin_thresh: float = 0.68,
                   excess_factor: float = 0.42):
    """Slot-state classifier on RN16 reply windows (new capability: the
    reference only ever learns a slot failed via the EPC CRC,
    tag_decoder_impl.cc:366-387).

    empty:     reply-window energy below ``energy_factor`` x the CW noise
               power the gate measured just before the reply;
    collision: energy present but either (a) the per-bit decision margin is
               crushed (coherently superposed replies with disagreeing
               bits), or (b) the energy/|h_est|^2 ratio exceeds a single
               tag's ~0.37-0.42 (misaligned replies decohere the preamble
               so |h_est|^2 collapses while energy stays high; two roughly
               coherent tags roughly double the energy);
    single:    otherwise.  Phase-aligned equal-amplitude colliders are
               physically near-indistinguishable from one tag and may pass
               as single.
    """
    occupied = energy >= energy_factor * noise_var
    collision = (margin < margin_thresh) | (
        energy > excess_factor * jnp.maximum(h2, 1e-12)
    )
    return jnp.where(
        occupied,
        jnp.where(collision, SLOT_COLLISION, SLOT_SINGLE),
        SLOT_EMPTY,
    ).astype(jnp.int32)


def check_epc_crc_batch(epc_bits: jnp.ndarray) -> jnp.ndarray:
    """Batched CRC-16 check as a GF(2) affine map (one int matmul).

    Replaces the per-frame serial LFSR (tag_decoder_impl.cc:401-445).
    epc_bits: (E, 128) -> (E,) bool.
    """
    n_data = epc_bits.shape[1] - 16
    m, c0 = crc16_affine(n_data)
    mj = jnp.asarray(m.astype(np.int32))
    c0j = jnp.asarray(c0.astype(np.int32))
    data = epc_bits[:, :n_data].astype(jnp.int32)
    crc = (data @ mj.T) % 2 ^ c0j[None, :]
    return jnp.all(crc == epc_bits[:, n_data:], axis=1)


@functools.lru_cache(maxsize=8)
def _pc_length_tables(n_bits: int):
    """Selection tables for PC-driven variable-length EPC validation.

    Gen2 6.3.2.1.2.2: the PC word's first 5 bits give the EPC length L in
    16-bit words, so the reply frame is PC16 + EPC(16L) + CRC16 - the
    reference pins L=6 (96-bit EPC) by hard-coding EPC_BITS=129
    (global_vars.h:107) and always checking the full 128 decoded bits.
    Here the decoder always slices ``n_bits`` (sized for the longest
    supported frame) and the *validation* is length-aware, TPU-style: CRCs
    for ALL candidate lengths are computed as one GF(2) affine matmul
    (column block L = the (16, 16+16L) CRC matrix), the received CRC and
    trailing EPC byte are extracted by 0/1 selection matmuls, and the
    per-frame parsed L picks its block - no data-dependent shapes.

    Returns (M, c0, R, ID, l_max): M,R (n_bits, (l_max+1)*16) int32,
    ID (n_bits, (l_max+1)*8), c0 ((l_max+1)*16,).
    """
    from ..protocol.crc import crc16_affine

    l_max = (n_bits - 32) // 16
    m_all = np.zeros((n_bits, (l_max + 1) * 16), dtype=np.int32)
    c0_all = np.zeros(((l_max + 1) * 16,), dtype=np.int32)
    r_all = np.zeros((n_bits, (l_max + 1) * 16), dtype=np.int32)
    id_all = np.zeros((n_bits, (l_max + 1) * 8), dtype=np.int32)
    for l in range(l_max + 1):
        dl = 16 + 16 * l
        m, c0 = crc16_affine(dl)
        m_all[:dl, 16 * l: 16 * l + 16] = m.T
        c0_all[16 * l: 16 * l + 16] = c0
        r_all[np.arange(dl, dl + 16), 16 * l + np.arange(16)] = 1
        id_all[np.arange(dl - 8, dl), 8 * l + np.arange(8)] = 1
    return m_all, c0_all, r_all, id_all, l_max


def check_epc_crc_pc(epc_bits: jnp.ndarray):
    """PC-length-aware batched EPC validation (new capability: the
    reference can only read 96-bit-EPC tags, tag_decoder_impl.cc:317-327).

    epc_bits: (E, n_bits) -> (pass (E,) bool, tag_id (E,) int32,
    epc_words (E,) int32).  The tag id generalizes the reference's
    bits[104:112] (tag_decoder_impl.cc:348-352): the last byte of the EPC
    field, at 16+16L-8 for the parsed length L.  Frames whose parsed L
    exceeds what ``n_bits`` can carry fail (their CRC is not decodable).
    """
    n_bits = epc_bits.shape[1]
    m_all, c0_all, r_all, id_all, l_max = _pc_length_tables(n_bits)
    b = epc_bits.astype(jnp.int32)
    crc_all = (b @ jnp.asarray(m_all)) % 2 ^ jnp.asarray(c0_all)[None, :]
    rec_all = b @ jnp.asarray(r_all)
    match = jnp.all(
        (crc_all == rec_all).reshape(-1, l_max + 1, 16), axis=2)
    ids = (b @ jnp.asarray(id_all)).reshape(-1, l_max + 1, 8)
    w5 = jnp.asarray(2 ** np.arange(4, -1, -1, dtype=np.int32))
    l_parsed = b[:, :5] @ w5
    lc = jnp.clip(l_parsed, 0, l_max)
    ok = jnp.take_along_axis(match, lc[:, None], axis=1)[:, 0] & (
        l_parsed <= l_max)
    w8 = jnp.asarray(2 ** np.arange(7, -1, -1, dtype=np.int32))
    tid = jnp.take_along_axis(
        ids, lc[:, None, None], axis=1)[:, 0, :] @ w8
    return ok, tid.astype(jnp.int32), l_parsed.astype(jnp.int32)


def _validate_epc(epc_bits: jnp.ndarray, cfg: ReaderConfig):
    """(pass, tag_id) for a batch of decoded EPC payloads: compat pins the
    reference's fixed-96-bit check + bits[104:112] id; native parses the
    PC length field (variable-length EPC support)."""
    if cfg.mode == "compat":
        return check_epc_crc_batch(epc_bits), _tag_ids(epc_bits)
    ok, tid, _ = check_epc_crc_pc(epc_bits)
    return ok, tid


def _validate_epc_soft(epc_bits, rel, cfg):
    """Mode-aware validation + optional CRC-guided recovery of failures.

    Returns (pass, tag_id, epc_bits) — recovered frames carry their
    repaired bits so downstream parsing (PC length, XPC, TDS URIs) sees
    the corrected payload.  Compat mode never recovers (the reference
    discards CRC failures, tag_decoder_impl.cc:330-344)."""
    ok, tid = _validate_epc(epc_bits, cfg)
    if not cfg.epc_softfix or rel is None or cfg.mode == "compat":
        return ok, tid, epc_bits
    from .softfix import recover_epc_batch

    fixed_bits, fixed = recover_epc_batch(
        epc_bits, rel, cfg, lambda b: _validate_epc(b, cfg))
    use = fixed & ~ok
    merged = jnp.where(use[:, None], fixed_bits, epc_bits)
    ok2, tid2 = _validate_epc(merged, cfg)
    return ok2, tid2, merged


def _decode_frames(frames, magn2, cfg):
    """Sync + RN16 + EPC decode of a batch of (W,) windows.

    The trailing ``rel`` is the per-decision reliability table feeding
    CRC-guided recovery (runtime/softfix.py), None when disabled."""
    if cfg.miller_m == 1:
        index, h_est = sync.tag_sync_batch(frames, cfg)
        rn16_bits, margin = fm0.rn16_detect_soft_batch(frames, index, h_est, cfg)
        if cfg.epc_softfix:
            epc_bits, t_half, rel = fm0.epc_detect_soft_batch(
                frames, magn2, index, h_est, cfg)
        else:
            epc_bits, t_half = fm0.epc_detect_batch(
                frames, magn2, index, h_est, cfg)
            rel = None
    else:
        from ..dsp import miller

        index, h_est, eps = miller.miller_sync_full_batch(frames, cfg)
        rn16_bits, margin = miller.miller_rn16_soft_eps_batch(
            frames, index, h_est, eps, cfg)
        if cfg.epc_softfix:
            epc_bits, t_half, rel = miller.miller_epc_soft_eps_batch(
                frames, index, h_est, eps, cfg)
        else:
            epc_bits, t_half = miller.miller_epc_eps_batch(
                frames, index, h_est, eps, cfg)
            rel = None
    return rn16_bits, epc_bits, t_half, h_est, margin, rel


def _decode_rn16_frames(frames, cfg):
    if cfg.miller_m == 1:
        index, h_est = sync.tag_sync_batch(frames, cfg)
        bits, margin = fm0.rn16_detect_soft_batch(frames, index, h_est, cfg)
    else:
        from ..dsp import miller

        index, h_est, eps = miller.miller_sync_full_batch(frames, cfg)
        bits, margin = miller.miller_rn16_soft_eps_batch(
            frames, index, h_est, eps, cfg)
    return bits, h_est, margin


def _decode_epc_frames(frames, magn2, cfg):
    if cfg.miller_m == 1:
        index, h_est = sync.tag_sync_batch(frames, cfg)
        if cfg.epc_softfix:
            bits, t_half, rel = fm0.epc_detect_soft_batch(
                frames, magn2, index, h_est, cfg)
        else:
            bits, t_half = fm0.epc_detect_batch(
                frames, magn2, index, h_est, cfg)
            rel = None
    else:
        from ..dsp import miller

        index, h_est, eps = miller.miller_sync_full_batch(frames, cfg)
        if cfg.epc_softfix:
            bits, t_half, rel = miller.miller_epc_soft_eps_batch(
                frames, index, h_est, eps, cfg)
        else:
            bits, t_half = miller.miller_epc_eps_batch(
                frames, index, h_est, eps, cfg)
            rel = None
    return bits, t_half, h_est, rel


def _tag_ids(epc_bits):
    """Reference tag id: EPC frame bits[104:112] as an integer
    (tag_decoder_impl.cc:348-352)."""
    weights = jnp.asarray(2 ** np.arange(7, -1, -1, dtype=np.int32))
    return jnp.sum(epc_bits[:, 104:112].astype(jnp.int32) * weights, axis=1)


ROLE_SLACK = 16  # extra per-role capacity absorbing event-table anomalies


def _decode_events_paranoid(
    y: jnp.ndarray, events: GateEvents, cmd: jnp.ndarray, cfg: ReaderConfig
) -> DecodedEvents:
    """Role-agnostic decode: every event as both an RN16 and an EPC window."""
    frames, magn2, rn16_fits, epc_fits = extract_windows(y, events, cfg)
    rn16_bits, epc_bits, t_half, h_est, margin, rel = _decode_frames(
        frames, magn2, cfg)
    epc_pass, tag_id, epc_bits = _validate_epc_soft(epc_bits, rel, cfg)
    energy = jnp.mean(magn2[:, : cfg.rn16_window], axis=1)
    h2_all = jnp.real(h_est) ** 2 + jnp.imag(h_est) ** 2
    return DecodedEvents(
        index=events.index,
        valid=events.valid,
        rn16_fits=rn16_fits,
        epc_fits=epc_fits,
        rn16_bits=rn16_bits,
        epc_bits=epc_bits,
        epc_pass=epc_pass,
        tag_id=tag_id,
        t_half=t_half,
        h_est=jnp.stack([jnp.real(h_est), jnp.imag(h_est)], axis=-1),
        slot_state=classify_slots(energy, margin, events.noise_var, h2_all),
        rn16_energy=energy,
        rn16_margin=margin,
        cmd_type=cmd,
    )


def decode_events(
    y: jnp.ndarray, events: GateEvents, cfg: ReaderConfig,
    specialize: bool = False, overflow_fallback: bool = True,
) -> DecodedEvents:
    """Batched per-event decode (sync + RN16 + EPC + CRC), fully on-device.

    Dispatches on the configured tag encoding: FM0 (reference path) or
    Miller-M subcarrier (new capability, dsp/miller.py).

    ``specialize=False`` (paranoid): every event is decoded as both an RN16
    and an EPC window - role-agnostic, used by compat mode (the reference
    decoder also runs both branches' arithmetic per window).

    ``specialize=True``: each event decodes only the reply window its
    *classified command* opens - Query/QueryRep/QueryAdjust events decode
    the RN16 window, ACK events the EPC window (the reference's role source:
    ``decoder_status`` = the command sent, tag_decoder_impl.cc:223,291).
    Roughly halves the decode gathers and FLOPs, is robust to missed or
    spurious gate events (roles are per-event, not positional), and needs no
    global context - per-shard / per-chunk tables specialize too.

    Per-role capacity is half the table plus ``ROLE_SLACK``; a pathological
    table exceeding it (e.g. a capture where most commands of one role were
    missed) routes to the paranoid decode via ``lax.cond`` when
    ``overflow_fallback`` is set.  Pass ``overflow_fallback=False`` inside
    vmapped bodies, where a batched cond would execute both branches.
    """
    cmd = classify_commands(events.n_pulses, cfg)
    if not specialize:
        return _decode_events_paranoid(y, events, cmd, cfg)

    cap = events.index.shape[0]
    cap_q = min(cap, cap // 2 + 1 + ROLE_SLACK)
    cap_a = cap_q
    role_q, role_a = command_roles(cmd, events.valid)

    def specialized(_):
        return _decode_events_specialized(
            y, events, cmd, role_q, role_a, cap_q, cap_a, cfg)

    if not overflow_fallback or cap_q == cap:
        return specialized(None)
    i32 = jnp.int32
    overflow = (jnp.sum(role_q.astype(i32)) > cap_q) | (
        jnp.sum(role_a.astype(i32)) > cap_a)
    return jax.lax.cond(
        overflow,
        lambda _: _decode_events_paranoid(y, events, cmd, cfg),
        specialized,
        None,
    )


def _decode_events_specialized(
    y: jnp.ndarray, events: GateEvents, cmd: jnp.ndarray,
    role_q: jnp.ndarray, role_a: jnp.ndarray,
    cap_q: int, cap_a: int, cfg: ReaderConfig,
) -> DecodedEvents:
    """Role-specialized decode over compacted per-role event lists."""
    n = y.shape[0]
    cap = events.index.shape[0]
    i32 = jnp.int32

    def compact(mask, sub_cap):
        pos = jnp.cumsum(mask.astype(i32)) - 1
        slot = jnp.where(mask, jnp.minimum(pos, sub_cap), i32(sub_cap))
        rows = jnp.full((sub_cap,), cap, i32).at[slot].set(
            jnp.arange(cap, dtype=i32), mode="drop")
        return rows  # row index into the full table; cap = invalid fill

    q_rows = compact(role_q, cap_q)
    a_rows = compact(role_a, cap_a)
    idx_pad = jnp.concatenate([events.index, jnp.full((1,), n, i32)])
    dc_pad = jnp.concatenate([events.dc, jnp.zeros((1,), events.dc.dtype)])

    from .frames import gather_aligned_windows

    def gather_windows(rows, width):
        start = jnp.minimum(idx_pad[rows], n - 1)
        fr = gather_aligned_windows(y, start, width) - dc_pad[rows][:, None]
        m2 = (jnp.real(fr) ** 2 + jnp.imag(fr) ** 2).astype(jnp.float32)
        return fr, m2

    q_frames, q_magn2 = gather_windows(q_rows, cfg.rn16_window)
    a_frames, a_magn2 = gather_windows(a_rows, cfg.epc_window)

    q_bits, q_h, q_margin = _decode_rn16_frames(q_frames, cfg)
    a_bits, a_thalf, a_h, a_rel = _decode_epc_frames(a_frames, a_magn2, cfg)
    a_pass, a_tid, a_bits = _validate_epc_soft(a_bits, a_rel, cfg)
    q_energy = jnp.mean(q_magn2, axis=1)
    nv_pad = jnp.concatenate([events.noise_var, jnp.ones((1,), jnp.float32)])
    q_h2 = jnp.real(q_h) ** 2 + jnp.imag(q_h) ** 2
    q_state = classify_slots(q_energy, q_margin, nv_pad[jnp.minimum(q_rows, cap)],
                             q_h2)

    # Scatter per-role results back to full-table layout.
    def scatter(rows, vals, init):
        return init.at[jnp.minimum(rows, cap)].set(vals, mode="drop")

    rn16_bits = scatter(q_rows, q_bits, jnp.zeros((cap + 1, 16), i32))[:cap]
    epc_bits = scatter(
        a_rows, a_bits, jnp.zeros((cap + 1, a_bits.shape[1]), i32))[:cap]
    epc_pass = scatter(a_rows, a_pass, jnp.zeros((cap + 1,), bool))[:cap]
    tag_id = scatter(a_rows, a_tid, jnp.zeros((cap + 1,), i32))[:cap]
    t_half = scatter(a_rows, a_thalf, jnp.zeros((cap + 1,), jnp.float32))[:cap]
    h_full = jnp.zeros((cap + 1,), q_h.dtype)
    h_full = h_full.at[jnp.minimum(q_rows, cap)].set(q_h, mode="drop")
    h_full = h_full.at[jnp.minimum(a_rows, cap)].set(a_h, mode="drop")
    h_full = h_full[:cap]

    slot_state = scatter(
        q_rows, q_state, jnp.full((cap + 1,), -1, i32))[:cap]
    rn16_energy = scatter(
        q_rows, q_energy, jnp.zeros((cap + 1,), jnp.float32))[:cap]
    rn16_margin = scatter(
        q_rows, q_margin, jnp.zeros((cap + 1,), jnp.float32))[:cap]

    rn16_fits = events.valid & (events.index + cfg.rn16_window <= n)
    epc_fits = events.valid & (events.index + cfg.epc_window <= n)
    return DecodedEvents(
        index=events.index,
        valid=events.valid,
        rn16_fits=rn16_fits,
        epc_fits=epc_fits,
        rn16_bits=rn16_bits,
        epc_bits=epc_bits,
        epc_pass=epc_pass,
        tag_id=tag_id,
        t_half=t_half,
        h_est=jnp.stack([jnp.real(h_full), jnp.imag(h_full)], axis=-1),
        slot_state=slot_state,
        rn16_energy=rn16_energy,
        rn16_margin=rn16_margin,
        cmd_type=cmd,
    )


def decode_events_multi(
    y_c: jnp.ndarray, events_c, cfg: ReaderConfig,
) -> DecodedEvents:
    """Role-specialized decode of C channels' event tables as ONE flat batch.

    Arithmetic-identical to ``jax.vmap(decode_events)(y_c, events_c)`` with
    ``specialize=True, overflow_fallback=False`` — same per-channel role
    compaction, same clamped per-channel window gathers, same scatter-back —
    but every window gather, selection matmul, and one-hot scatter runs at
    the flagship's flat (C*cap) batch shape.  Under a channel vmap the
    batched row gathers / scatters acquire a batch dimension in the operand
    lattice, which v5e lowers ~2x slower (docs/PERF.md round-5 wideband
    isolation); the channel index instead folds into the row arithmetic
    (gather_aligned_windows_multi) and the pad-slot layout (each channel
    owns a private drop slot at row c*(cap+1)+cap).

    Leaves come back shaped (C, cap, ...).  Used by the sharded decoder's
    per-device body (shard/decode_sharded.py); compat mode keeps the
    per-channel paranoid vmap (reference-parity path, not a perf path).
    """
    c, cap = events_c.index.shape
    n = y_c.shape[1]
    i32 = jnp.int32
    capp = cap + 1
    cap_q = min(cap, cap // 2 + 1 + ROLE_SLACK)
    cap_a = cap_q

    cmd = classify_commands(events_c.n_pulses.reshape(-1), cfg).reshape(c, cap)
    role_q, role_a = command_roles(cmd, events_c.valid)

    def compact(mask, sub_cap):
        pos = jnp.cumsum(mask.astype(i32), axis=1) - 1
        slot = jnp.where(mask, jnp.minimum(pos, sub_cap), i32(sub_cap))
        rows = jnp.full((c, sub_cap), cap, i32)
        rows = rows.at[jnp.arange(c, dtype=i32)[:, None], slot].set(
            jnp.broadcast_to(jnp.arange(cap, dtype=i32), (c, cap)),
            mode="drop")
        return rows  # (c, sub_cap) row index into each channel's table

    chan_base = jnp.arange(c, dtype=i32)[:, None] * capp
    fq = (chan_base + compact(role_q, cap_q)).reshape(-1)   # (c*cap_q,)
    fa = (chan_base + compact(role_a, cap_a)).reshape(-1)   # (c*cap_a,)
    idx_pad = jnp.concatenate(
        [events_c.index, jnp.full((c, 1), n, i32)], axis=1).reshape(-1)
    dc_pad = jnp.concatenate(
        [events_c.dc, jnp.zeros((c, 1), events_c.dc.dtype)], axis=1
    ).reshape(-1)

    from .frames import gather_aligned_windows_multi

    def gather_windows(rows, width):
        start = jnp.minimum(idx_pad[rows], n - 1)
        fr = gather_aligned_windows_multi(
            y_c, start, rows // capp, width) - dc_pad[rows][:, None]
        m2 = (jnp.real(fr) ** 2 + jnp.imag(fr) ** 2).astype(jnp.float32)
        return fr, m2

    q_frames, q_magn2 = gather_windows(fq, cfg.rn16_window)
    a_frames, a_magn2 = gather_windows(fa, cfg.epc_window)

    q_bits, q_h, q_margin = _decode_rn16_frames(q_frames, cfg)
    a_bits, a_thalf, a_h, a_rel = _decode_epc_frames(a_frames, a_magn2, cfg)
    a_pass, a_tid, a_bits = _validate_epc_soft(a_bits, a_rel, cfg)
    q_energy = jnp.mean(q_magn2, axis=1)
    nv_pad = jnp.concatenate(
        [events_c.noise_var, jnp.ones((c, 1), jnp.float32)], axis=1
    ).reshape(-1)
    q_h2 = jnp.real(q_h) ** 2 + jnp.imag(q_h) ** 2
    q_state = classify_slots(q_energy, q_margin, nv_pad[fq], q_h2)

    # Scatter per-role results back to the flat padded layout, then carve
    # off each channel's drop slot.
    def scatter(rows, vals, init):
        return init.at[rows].set(vals, mode="drop")

    def unpad(flat):
        return flat.reshape((c, capp) + flat.shape[1:])[:, :cap]

    rn16_bits = unpad(scatter(fq, q_bits, jnp.zeros((c * capp, 16), i32)))
    epc_bits = unpad(scatter(
        fa, a_bits, jnp.zeros((c * capp, a_bits.shape[1]), i32)))
    epc_pass = unpad(scatter(fa, a_pass, jnp.zeros((c * capp,), bool)))
    tag_id = unpad(scatter(fa, a_tid, jnp.zeros((c * capp,), i32)))
    t_half = unpad(scatter(fa, a_thalf, jnp.zeros((c * capp,), jnp.float32)))
    h_full = jnp.zeros((c * capp,), q_h.dtype)
    h_full = h_full.at[fq].set(q_h, mode="drop")
    h_full = unpad(h_full.at[fa].set(a_h, mode="drop"))

    slot_state = unpad(scatter(fq, q_state, jnp.full((c * capp,), -1, i32)))
    rn16_energy = unpad(scatter(
        fq, q_energy, jnp.zeros((c * capp,), jnp.float32)))
    rn16_margin = unpad(scatter(
        fq, q_margin, jnp.zeros((c * capp,), jnp.float32)))

    rn16_fits = events_c.valid & (events_c.index + cfg.rn16_window <= n)
    epc_fits = events_c.valid & (events_c.index + cfg.epc_window <= n)
    return DecodedEvents(
        index=events_c.index,
        valid=events_c.valid,
        rn16_fits=rn16_fits,
        epc_fits=epc_fits,
        rn16_bits=rn16_bits,
        epc_bits=epc_bits,
        epc_pass=epc_pass,
        tag_id=tag_id,
        t_half=t_half,
        h_est=jnp.stack([jnp.real(h_full), jnp.imag(h_full)], axis=-1),
        slot_state=slot_state,
        rn16_energy=rn16_energy,
        rn16_margin=rn16_margin,
        cmd_type=cmd,
    )


def replay_inventory_scan(dec: DecodedEvents, cfg: ReaderConfig) -> InventoryStats:
    """Event-level Gen2 round FSM replay -> InventoryStats (sequential).

    Mirrors the decoder's bookkeeping branches
    (tag_decoder_impl.cc:256-288 RN16 path, :291-394 EPC path) and the gate's
    termination limits (gate_impl.cc:101-109).  O(max_events) scan with a
    tiny carry - exact for arbitrary event tables; used directly for small
    tables and as the fallback branch of the vectorized replay.
    """
    e = dec.index.shape[0]
    max_slot = cfg.max_slot_number
    i32 = jnp.int32

    def step(carry, xs):
        (ptr, slot, rnd, n_q, n_ok, reads, n_uni, uni_hist,
         n_rounds, term, slot_counts, cmd_counts) = carry
        idx, valid, rn_fit, epc_fit, ok, tid, sstate, ctype = xs

        term = term | (n_q > cfg.max_num_queries) | (n_uni > cfg.max_unique_tags)
        # Role from the classified command, not position: NAK/UNKNOWN events
        # open no reply window and are skipped (no ptr advance), so one
        # spurious or missed gate event perturbs only its own slot.
        qlike = (ctype == CMD_QUERY) | (ctype == CMD_QREP) | (ctype == CMD_QADJ)
        is_ack = ctype == CMD_ACK
        live = valid & jnp.logical_not(term) & (idx >= ptr)
        fits = jnp.where(is_ack, epc_fit, rn_fit)
        proc = live & (qlike | is_ack) & fits

        is_q = proc & qlike                         # Query-like + RN16 window
        is_a = proc & is_ack                        # ACK + EPC window

        n_q = n_q + is_q.astype(i32)
        slot_counts = slot_counts.at[jnp.clip(sstate, 0, 2)].add(is_q.astype(i32))
        cmd_counts = cmd_counts.at[jnp.clip(ctype, 0, 5)].add(proc.astype(i32))

        # EPC branch: slot++, CRC verdict, then round bookkeeping.
        slot_a = slot + 1
        passed = is_a & ok
        newly = passed & (reads[tid] == 0)
        reads = reads.at[tid].add(passed.astype(i32))
        n_uni = n_uni + newly.astype(i32)
        wrap = is_a & (slot_a > max_slot)
        uni_hist = jnp.where(
            wrap, uni_hist.at[jnp.minimum(n_rounds, uni_hist.shape[0] - 1)].set(n_uni),
            uni_hist,
        )
        n_rounds = n_rounds + wrap.astype(i32)
        rnd = rnd + wrap.astype(i32)
        slot = jnp.where(wrap, i32(1), jnp.where(is_a, slot_a, slot))

        ptr = jnp.where(
            is_q, idx + cfg.rn16_window, jnp.where(is_a, idx + cfg.epc_window, ptr)
        )
        n_ok = n_ok + passed.astype(i32)
        carry = (ptr, slot, rnd, n_q, n_ok, reads, n_uni, uni_hist,
                 n_rounds, term, slot_counts, cmd_counts)
        return carry, None

    init = (
        i32(0),
        i32(1),             # cur_slot_number starts at 1 (global_vars.cc:43)
        i32(1),             # cur_inventory_round starts at 1 (:42)
        i32(0),
        i32(0),
        jnp.zeros((N_TAG_BINS,), i32),
        i32(0),
        jnp.zeros((e,), i32),
        i32(0),
        jnp.array(False),
        jnp.zeros((3,), i32),
        jnp.zeros((6,), i32),
    )
    xs = (dec.index, dec.valid, dec.rn16_fits, dec.epc_fits, dec.epc_pass,
          dec.tag_id, dec.slot_state, dec.cmd_type)
    carry, _ = jax.lax.scan(step, init, xs)
    (_, slot, rnd, n_q, n_ok, reads, _, uni_hist, n_rounds, term,
     slot_counts, cmd_counts) = carry
    return InventoryStats(
        n_queries=n_q,
        cur_inventory_round=rnd,
        cur_slot=slot,
        n_epc_correct=n_ok,
        tag_reads=reads,
        unique_tags_round=uni_hist,
        n_rounds_closed=n_rounds,
        n_events=jnp.sum(dec.valid.astype(i32)),
        terminated=term,
        n_slot_empty=slot_counts[0],
        n_slot_single=slot_counts[1],
        n_slot_collision=slot_counts[2],
        cmd_counts=cmd_counts,
    )


def _replay_fast_ok(dec: DecodedEvents, cfg: ReaderConfig) -> jnp.ndarray:
    """Vectorized precondition check for the closed-form replay (see
    replay_inventory): scalar bool, cheap O(E) reductions only."""
    i32 = jnp.int32
    valid = dec.valid
    role_q, role_epc = command_roles(dec.cmd_type, valid)
    all_known = jnp.all(jnp.logical_not(valid) | role_q | role_epc)
    fit_v = jnp.where(
        valid, jnp.where(role_epc, dec.epc_fits, dec.rn16_fits), True
    )
    unfit_seen = jnp.cumsum(jnp.logical_not(fit_v).astype(i32)) > 0
    proc = valid & fit_v & jnp.logical_not(unfit_seen)
    refit_after_unfit = jnp.any(valid & fit_v & unfit_seen)
    window = jnp.where(role_epc, i32(cfg.epc_window), i32(cfg.rn16_window))
    nxt = jnp.concatenate(
        [dec.index[1:], jnp.full((1,), jnp.iinfo(jnp.int32).max // 2, i32)])
    gap_ok = jnp.logical_not(proc) | (nxt >= dec.index + window)
    n_q = jnp.sum((proc & role_q).astype(i32))
    passed = proc & role_epc & dec.epc_pass
    reads = jnp.zeros((N_TAG_BINS,), i32).at[
        jnp.where(passed, dec.tag_id, N_TAG_BINS)
    ].add(1, mode="drop")
    n_uni = jnp.sum((reads > 0).astype(i32))
    return (
        all_known
        & jnp.logical_not(refit_after_unfit)
        & jnp.all(gap_ok)
        & (n_q <= cfg.max_num_queries)
        & (n_uni <= cfg.max_unique_tags)
    )


def replay_inventory_batch(dec_c: DecodedEvents, cfg: ReaderConfig
                           ) -> InventoryStats:
    """Per-channel replay with the fast/scan cond hoisted ABOVE the vmap.

    ``jax.vmap(replay_inventory)`` turns the internal ``lax.cond`` into a
    batched select that executes BOTH branches - so the O(E) sequential
    scan fallback would run on every call even for well-formed tables
    (E = n_time * cap steps: the replicated-serial term that binds pod
    scaling, tools/scaling_model.py).  Here the precondition is evaluated
    per channel and one scalar cond picks vmap(fast) for the whole batch;
    the scan runs only when some channel actually has a malformed table.
    Bit-identical results to vmap(replay_inventory) either way.
    """
    ok = jax.vmap(lambda d: _replay_fast_ok(d, cfg))(dec_c)
    return jax.lax.cond(
        jnp.all(ok),
        lambda _: jax.vmap(lambda d: _replay_fast_stats(d, cfg))(dec_c),
        lambda _: jax.vmap(lambda d: replay_inventory(d, cfg))(dec_c),
        None,
    )


def replay_inventory(dec: DecodedEvents, cfg: ReaderConfig) -> InventoryStats:
    """Round FSM replay: vectorized fast path + exact-scan fallback.

    The sequential scan costs O(max_events) tiny TPU steps, which dominates
    wall time on long captures.  For well-formed event tables - the common
    case - the replay is computable in closed form:

    * events sorted, every valid event's command classified (no NAK/UNKNOWN,
      whose skip semantics need the sequential ptr walk); roles come from
      the classified command (command_roles), so dropped/extra events do not
      shift later roles;
    * every processed event's window fits, with at most a trailing run of
      unfit events (trace truncation), and consecutive events are separated
      by at least the earlier event's window (no ptr-skips);
    * termination limits not reached.

    Those preconditions are checked vectorially; if any fails, lax.cond
    falls back to the exact sequential scan.  (Batched callers use
    replay_inventory_batch, which hoists the cond above the vmap.)
    """
    return jax.lax.cond(
        _replay_fast_ok(dec, cfg),
        lambda _: _replay_fast_stats(dec, cfg),
        lambda _: replay_inventory_scan(dec, cfg),
        None,
    )


def _replay_fast_stats(dec: DecodedEvents, cfg: ReaderConfig) -> InventoryStats:
    """Closed-form replay for well-formed tables (preconditions checked by
    _replay_fast_ok): O(E) parallel reductions, no sequential scan."""
    e = dec.index.shape[0]
    i32 = jnp.int32
    max_slot = cfg.max_slot_number

    valid = dec.valid
    role_q, role_epc = command_roles(dec.cmd_type, valid)
    fit_v = jnp.where(
        valid, jnp.where(role_epc, dec.epc_fits, dec.rn16_fits), True
    )
    # processed = valid events in the largest all-fit prefix (unfit events
    # form a trailing run under the fast-path preconditions).
    unfit_seen = jnp.cumsum(jnp.logical_not(fit_v).astype(i32)) > 0
    proc = valid & fit_v & jnp.logical_not(unfit_seen)

    n_q = jnp.sum((proc & role_q).astype(i32))
    passed = proc & role_epc & dec.epc_pass
    reads = jnp.zeros((N_TAG_BINS,), i32).at[
        jnp.where(passed, dec.tag_id, N_TAG_BINS)
    ].add(1, mode="drop")
    a = jnp.sum((proc & role_epc).astype(i32))        # EPC events processed

    n_rounds = a // max_slot
    slot = 1 + (a % max_slot)
    rnd = 1 + n_rounds
    n_ok = jnp.sum(passed.astype(i32))
    # Per-round unique history: unique count after each M-th EPC event.
    new_flag = passed & (
        jnp.cumsum(
            jax.nn.one_hot(
                jnp.where(passed, dec.tag_id, N_TAG_BINS),
                N_TAG_BINS + 1, dtype=i32,
            ), axis=0,
        )[jnp.arange(e), jnp.minimum(dec.tag_id, N_TAG_BINS)] == 1
    )
    uni_run = jnp.cumsum(new_flag.astype(i32))
    epc_rank = jnp.cumsum((proc & role_epc).astype(i32))  # 1-based
    wrap = (proc & role_epc) & (epc_rank % max_slot == 0)
    round_idx = epc_rank // max_slot - 1
    uni_hist = jnp.zeros((e,), i32).at[
        jnp.where(wrap, round_idx, e)
    ].add(uni_run, mode="drop")
    qs = proc & role_q
    cmd_counts = jnp.zeros((6,), i32).at[
        jnp.where(proc, jnp.clip(dec.cmd_type, 0, 5), 6)
    ].add(1, mode="drop")
    return InventoryStats(
        n_queries=n_q,
        cur_inventory_round=rnd,
        cur_slot=slot,
        n_epc_correct=n_ok,
        tag_reads=reads,
        unique_tags_round=uni_hist,
        n_rounds_closed=n_rounds,
        n_events=jnp.sum(valid.astype(i32)),
        terminated=jnp.array(False),
        n_slot_empty=jnp.sum((qs & (dec.slot_state == 0)).astype(i32)),
        n_slot_single=jnp.sum((qs & (dec.slot_state == 1)).astype(i32)),
        n_slot_collision=jnp.sum((qs & (dec.slot_state == 2)).astype(i32)),
        cmd_counts=cmd_counts,
    )


def decode_block(
    y: jnp.ndarray, cfg: ReaderConfig, exact_gate: bool = False,
    amp: jnp.ndarray = None, avg: jnp.ndarray = None,
) -> Tuple[InventoryStats, DecodedEvents]:
    """Decode one post-decimation complex I/Q block (trace inside jit).

    ``amp``/``avg`` optionally carry the fused front-end's precomputed
    amplitude / moving average (kernels/gate_front.py)."""
    if exact_gate:
        events = gate_detect_scan(y, cfg)
    else:
        events = gate_detect(y, cfg, amp=amp, avg=avg)
    # Native mode: command-classified role-specialized decode; compat mode
    # stays paranoid (decodes both roles per event like the reference
    # decoder runs both branches' arithmetic).
    dec = decode_events(y, events, cfg, specialize=cfg.mode != "compat")
    return replay_inventory(dec, cfg), dec


def matched_taps(cfg: ReaderConfig):
    """Boxcar matched to half an FM0 symbol (or one Miller half-cycle) at
    ADC rate: 25 taps at the defaults (apps/reader.py:63-65)."""
    return boxcar_taps(int(cfg.tag_bit_us / 2 * cfg.adc_rate / 1e6 / cfg.miller_m))


@functools.partial(jax.jit, static_argnames=("cfg", "exact_gate"))
def decode_capture_planar(
    iq2: jnp.ndarray, cfg: ReaderConfig, exact_gate: bool = False
) -> Tuple[InventoryStats, DecodedEvents]:
    """Full pipeline from a planar (2, N) float32 ADC-rate capture.

    Device-facing entry point: complex64 never crosses the jit boundary
    (unsupported by the TPU runtime here); (re, im) planes are combined with
    lax.complex as the first traced op.
    """
    if cfg.cancel_cw:
        # Capture-level CW interferer cancellation (dsp/interference.py):
        # guard-gated global tone subtraction ahead of the front end.
        from ..dsp.interference import cancel_cw_planar

        iq2 = cancel_cw_planar(iq2, cfg.cancel_cw)
    if cfg.pallas_front and not exact_gate:
        # Fused Pallas front-end: FIR + |.| + both moving sums in one HBM
        # pass (kernels/gate_front.py; exact f32 - unlike XLA's conv, which
        # lowers f32 to bf16 multiplies on the MXU at default precision).
        from ..kernels.gate_front import gate_front_for_cfg

        interpret = jax.default_backend() == "cpu"
        y2, amp, avgsum, _ = gate_front_for_cfg(iq2, cfg, interpret=interpret)
        y = jax.lax.complex(y2[0], y2[1])
        avg = avgsum / jnp.float32(cfg.win_length)
        return decode_block(y, cfg, amp=amp, avg=avg)
    iq = jax.lax.complex(iq2[0], iq2[1])
    y = matched_filter_decimate(iq, matched_taps(cfg), cfg.decim)
    return decode_block(y, cfg, exact_gate)


def to_planar(iq) -> jnp.ndarray:
    """Host-side complex capture -> (2, N) float32 (jit-boundary layout)."""
    import numpy as np

    iq = np.asarray(iq)
    return jnp.asarray(
        np.stack([iq.real.astype(np.float32), iq.imag.astype(np.float32)])
    )


def decode_capture(
    iq, cfg: ReaderConfig, exact_gate: bool = False
) -> Tuple[InventoryStats, DecodedEvents]:
    """Full pipeline from a raw complex ADC-rate capture (host array)."""
    return decode_capture_planar(to_planar(iq), cfg, exact_gate)
