"""Reader-command gate: block-parallel edge detection + DC estimation.

TPU-native re-design of the reference gate block (``gate_impl.cc:85-200``),
which is a per-sample streaming FSM: a 100-sample amplitude moving average, a
0.75*avg threshold, a NEG/POS edge state machine counting PIE pulses, a
">5 pulses then T1-quiet" command-over trigger, and a 48-sample DC estimate
subtracted from the forwarded window.

Here every per-sample quantity is a vectorized array op and the FSM semantics
are recovered algebraically - no `lax.scan` over samples:

* threshold state   = sign of the last decisive sample (cummax propagation),
* edges             = state transitions,
* run lengths       = distance to previous edge (cummax of edge indices),
* pulse counts      = #rises since the last reset rise (cumsum difference),
* trigger           = rise with pulses > NUM_PULSES_COMMAND whose following
                      edge-free run exceeds n_samples_T1 -> event at
                      rise + n_samples_T1 + 1 (the sample where the
                      reference's n_samples counter first exceeds T1),
* DC estimate       = 48-sample causal moving mean gathered at the trigger.

Deviation from the reference (documented, tested): the reference freezes the
edge FSM while the gate is open and zeroes the pulse counter on trigger; we
detect everywhere and emulate the pulse reset with a fixed-point refinement
(2 vectorized passes).  For in-spec signals - backscatter modulation depth
< (1 - THRESH_FRACTION) so tag replies never cross the threshold - the event
sets are identical; `gate_detect_scan` is the exact sequential oracle used in
tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ReaderConfig
from .filters import moving_sum


class GateEvents(NamedTuple):
    """Fixed-capacity command-event table (static shapes for jit)."""

    index: jnp.ndarray    # (max_events,) int32 sample index of window start
    dc: jnp.ndarray       # (max_events,) complex64 DC estimate at the event
    valid: jnp.ndarray    # (max_events,) bool
    n_events: jnp.ndarray  # () int32
    noise_var: jnp.ndarray  # (max_events,) f32 CW noise power at the event
    n_pulses: jnp.ndarray  # (max_events,) i32 PIE pulses of the command


def _event_window_stats(y: jnp.ndarray, ev_c: jnp.ndarray, w: int):
    """(dc mean, noise variance) over the w samples ending at each event.

    Computed per event from gathered windows rather than via running sums:
    the naive var = mean|y|^2 - |mean y|^2 over a long-cumsum pipeline
    cancels catastrophically in f32 (the CW power is ~6 orders above the
    noise power), while the centered per-event form is exact.  Matches the
    reference's circular-buffer DC mean (gate_impl.cc:141-143) which is the
    plain mean of the last w closed samples.

    TPU shape: a (cap, w) per-element gather is ~3 ms/iter on v5e (scalar
    gathers serialize); instead gather granule-aligned *rows* of a reshaped
    view (one index per GRANULE samples, like frames.gather_aligned_windows)
    and select the exact w-window with an elementwise mask.
    """
    i32 = jnp.int32
    from ..runtime.frames import gather_aligned_windows

    start = jnp.maximum(ev_c - (w - 1), 0)
    win = gather_aligned_windows(y, start, w)         # (cap, w + g)
    g = win.shape[1] - w
    off = start - (start // g) * g                    # in-row start offset
    col = jnp.arange(w + g, dtype=i32)[None, :]
    mask = (col >= off[:, None]) & (col < (off + w)[:, None])
    mw = jnp.float32(1.0) * mask
    dc = jnp.sum(win * mw, axis=1) / jnp.float32(w)
    cen = (win - dc[:, None]) * mw
    nv = jnp.maximum(
        jnp.sum(jnp.real(cen) ** 2 + jnp.imag(cen) ** 2, axis=1)
        / jnp.float32(w),
        1e-12,
    )
    return dc, nv


def _last_le(mask: jnp.ndarray, values: jnp.ndarray, fill) -> jnp.ndarray:
    """out[i] = values[j] for the largest j <= i with mask[j], else fill."""
    n = mask.shape[0]
    idx = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), jnp.int32(-1))
    m = jax.lax.cummax(idx)
    return jnp.where(m >= 0, values[jnp.maximum(m, 0)], fill)


def gate_signal_state(amp: jnp.ndarray, thresh: jnp.ndarray) -> jnp.ndarray:
    """Per-sample POS(+1)/NEG(-1) edge state (gate_impl.cc:148-162).

    A sample strictly above threshold drives the state to POS, strictly below
    to NEG, equality leaves it unchanged; initial state is NEG
    (gate_impl.cc:45).
    """
    dec = jnp.where(amp > thresh, jnp.int32(1),
                    jnp.where(amp < thresh, jnp.int32(-1), jnp.int32(0)))
    return _last_le(dec != 0, dec, jnp.int32(-1))


def _rises_since_reset(rise: jnp.ndarray, reset: jnp.ndarray,
                       max_span: int) -> jnp.ndarray:
    """out[i] = #{j : j > p*(i), j <= i, rise[j]} where p*(i) is the last
    position <= i with reset[p*] (0 if none within ``max_span``).

    Segmented inclusive scan by doubling: carry pairs (s, r) with
    s = rise-count over the window truncated at the newest reset and
    r = "window contains a reset";
    (s, r)_{j+1}[i] = (s_j[i] + (r_j[i] ? 0 : s_j[i - 2^j]),
                       r_j[i] | r_j[i - 2^j]).
    ceil(log2 max_span) flat shifted steps - replaces the former
    overlap-blocked cumsum + cummax formulation (full-array log-N scan
    passes dominated the gate's TPU time).  A reset position itself
    reports 0 (matching rc - cummax(where(reset, rc, 0))).  Positions with
    no reset in window count from stream start, exact for the protocol
    (every command is preceded by a CW marker within max_span).
    """
    s = jnp.where(reset, 0.0, rise.astype(jnp.float32))
    r = reset

    def shifted(a, k, fill):
        pad = jnp.full((k,), fill, a.dtype)
        return jnp.concatenate([pad, a[:-k]])

    k = 1
    while k < max_span:
        s = s + jnp.where(r, 0.0, shifted(s, k, jnp.float32(0)))
        r = r | shifted(r, k, False)
        k *= 2
    return s


def gate_detect(
    y: jnp.ndarray,
    cfg: ReaderConfig,
    amp: jnp.ndarray = None,
    avg: jnp.ndarray = None,
) -> GateEvents:
    """Detect reader-command-over events in a post-decimation I/Q block.

    y: (N,) complex64 at cfg.sample_rate.  Returns fixed-capacity events.
    ``amp``/``avg`` optionally supply the precomputed |y| and its
    win_length moving average (e.g. from the fused Pallas front-end,
    kernels/gate_front.py); by default both derive from y here.

    Native mode breaks amp==thresh ties as "below" so the POS/NEG state is
    simply the per-sample comparison, turning edge/run detection into
    shifts and two small windowed reductions (bounded lookback):

    * a rise qualifies as a pulse iff run > pw/2, i.e. the pw/2+1 samples
      before it are all below (contiguity of the low segment);
    * the trigger's T1-quiet requirement is "the nt1+1 samples after the
      rise are all above".

    Compat mode keeps the tie-preserving last-decisive-state propagation
    (cummax + gathers), matching the reference FSM on exact-equality
    samples too.
    """
    n = y.shape[0]
    i32 = jnp.int32
    arange = jnp.arange(n, dtype=i32)

    if amp is None:
        amp = jnp.abs(y).astype(jnp.float32)
    if avg is None:
        # Moving average including the current sample (gate_impl.cc:131-133).
        # Compat pins the reference's blocked-cumsum summation order; native
        # uses the dyadic windowed sum (fewer passes, different f32 order -
        # decode-count-verified on hardware, tools/tpu_prec_avg_experiment).
        if cfg.mode == "compat":
            msum = moving_sum(amp, cfg.win_length)
        else:
            from .filters import run_sum

            msum = run_sum(amp, cfg.win_length)
        avg = msum / jnp.float32(cfg.win_length)
    thresh = avg * jnp.float32(cfg.thresh_fraction)

    pw_half = cfg.n_samples_pw // 2
    nt1 = cfg.n_samples_t1
    npc = cfg.num_pulses_command

    if cfg.mode == "compat":
        state = gate_signal_state(amp, thresh)
        prev_state = jnp.concatenate([jnp.full((1,), -1, i32), state[:-1]])
        rise = (state == 1) & (prev_state == -1)
        fall = (state == -1) & (prev_state == 1)
        edge = rise | fall

        # Distance since previous edge == the reference's n_samples counter
        # (gate_impl.cc:145-161: incremented, then reset at edges).
        prev_edge_incl = _last_le(edge, arange, i32(-1))
        prev_edge_excl = jnp.concatenate(
            [jnp.full((1,), -1, i32), prev_edge_incl[:-1]]
        )
        run_at = arange - prev_edge_excl
        qualify = rise & (run_at > pw_half)

        # Next edge strictly after i (T1-quiet trigger condition).
        nidx = jnp.where(edge, arange, i32(n))
        next_edge_incl = jnp.flip(jax.lax.cummin(jnp.flip(nidx)))
        next_edge_excl = jnp.concatenate(
            [next_edge_incl[1:], jnp.full((1,), n, i32)]
        )
        quiet_after = next_edge_excl > arange + nt1 + 1
    else:
        from .filters import run_sum

        above = amp > thresh
        prev_above = jnp.concatenate([jnp.zeros((1,), bool), above[:-1]])
        rise = above & jnp.logical_not(prev_above)
        # Low-run > pw/2: the pw/2+1 samples before the rise are all below
        # (first-rise-in-stream counts as a long run, like the reference's
        # n_samples counting from startup).  run_sum: exact dyadic windowed
        # count, cheaper than the blocked-cumsum moving_sum for 0/1 inputs.
        below_run = run_sum(jnp.logical_not(prev_above), pw_half + 1)
        # Startup corner: before any edge the reference's run counter spans
        # the whole stream, so a rise at i qualifies iff i >= pw/2 and all
        # preceding samples are below.
        need = jnp.minimum(jnp.float32(pw_half + 1), arange.astype(jnp.float32))
        qualify = rise & (below_run >= need) & (arange >= pw_half)
        # T1-quiet: the nt1+1 samples after the rise are all above.
        above_run = run_sum(above, nt1 + 1)
        shifted = jnp.concatenate(
            [above_run[nt1 + 1:], jnp.zeros((nt1 + 1,), jnp.float32)]
        )
        quiet_after = shifted >= jnp.float32(nt1 + 1)

    disq = rise & jnp.logical_not(qualify)

    if cfg.mode == "compat":
        # Reference-faithful accumulation: pulses reset only at short rises
        # and at triggers (gate_impl.cc:157-177), emulated with a two-pass
        # fixed point over full-array scans.
        rise_count = jnp.cumsum(rise.astype(i32))

        def triggers_from(reset_vals: jnp.ndarray) -> jnp.ndarray:
            last_reset = jax.lax.cummax(reset_vals)
            pulses = rise_count - last_reset
            return (rise & (pulses > npc) & quiet_after
                    & (arange + nt1 + 1 < n))

        reset0 = jnp.where(disq, rise_count, i32(0))
        trig = triggers_from(reset0)
        t_shift = jnp.concatenate([jnp.zeros((1,), i32),
                                   jnp.where(trig, rise_count, i32(0))[:-1]])
        reset2 = jnp.maximum(reset0, t_shift)
        trig = triggers_from(reset2)
        pulses_at = rise_count - jax.lax.cummax(reset2)
    else:
        # Native: pulses reset at every CW boundary (a T1-long all-above run
        # always precedes a command, and every trigger is followed by one),
        # which bounds the pulse-count lookback to one command span.  The
        # count-since-last-reset is then a *segmented* windowed scan,
        # computed by log2(span) paired doubling steps over flat arrays -
        # no data-expanding overlap blocks, no full cumsum/cummax passes.
        # This also makes n_pulses the exact per-command count (better for
        # command classification than the reference's cross-command
        # accumulator).
        cmd_us = (
            cfg.delim_us + 2 * cfg.pw_us + 8 * cfg.pw_us + cfg.trcal_us
            + cfg.query_length * 4 * cfg.pw_us + cfg.t1_us
        )
        span = -(-int(cmd_us * cfg.sample_rate / 1e6 + 128) // 128) * 128

        # marker[i]: sample i ends an nt1+1-long all-above run (CW inside).
        marker = above_run >= jnp.float32(nt1 + 1)
        reset = disq | marker
        pulses_at = _rises_since_reset(rise, reset, span).astype(i32)
        trig = (rise & (pulses_at > npc) & quiet_after
                & (arange + nt1 + 1 < n))

    trig_sample = jnp.where(trig, arange + nt1 + 1, i32(n))

    # Compact to fixed capacity, block-first.  The T1-quiet trigger
    # condition makes two triggers within nt1 samples impossible (a second
    # rise needs an intervening fall - an edge inside the first trigger's
    # quiet span), so any block of <= nt1+1 samples holds at most one
    # trigger: one min-reduction per block, then cumsum + scatter over the
    # n/B block slots.  The flat formulation's N-index scatter measured
    # ~12 ms/iter on v5e (scalar scatters serialize, like gathers); this is
    # ~B x fewer indices.  Exact: block order = index order, <= 1 per block.
    cap = cfg.max_events
    bsz = 1 << max(min(nt1 + 1, 512).bit_length() - 1, 0)
    if bsz >= 8:
        nb = -(-n // bsz)
        s2 = jnp.pad(trig_sample, (0, nb * bsz - n),
                     constant_values=n).reshape(nb, bsz)
        bsamp = jnp.min(s2, axis=1)            # (nb,) block's trigger sample
        bhas = bsamp < n
        pos = jnp.cumsum(bhas.astype(i32)) - 1
        slot = jnp.where(bhas, jnp.minimum(pos, cap), i32(cap))
        ev = jnp.full((cap,), n, i32).at[slot].set(bsamp, mode="drop")
    else:
        pos = jnp.cumsum(trig.astype(i32)) - 1
        slot = jnp.where(trig, jnp.minimum(pos, cap), i32(cap))
        ev = jnp.full((cap,), n, i32).at[slot].set(trig_sample, mode="drop")
    valid = ev < n
    ev_c = jnp.minimum(ev, n - 1)
    # DC mean + CW noise power over the dc window ending at each event
    # (gate_impl.cc:141-143; the window precedes any tag reply).
    dc, nv = _event_window_stats(y, ev_c, cfg.dc_length)
    # The trigger sample sits nt1+1 after the command's final rise, where
    # pulses_at still holds that command's pulse count.
    rise_of_ev = jnp.maximum(ev_c - (nt1 + 1), 0)
    return GateEvents(
        index=ev.astype(i32),   # invalid slots keep index n (sorts last)
        dc=dc,
        valid=valid,
        n_events=jnp.sum(trig.astype(i32)),
        noise_var=nv,
        n_pulses=pulses_at[rise_of_ev].astype(i32),
    )


def gate_detect_scan(y: jnp.ndarray, cfg: ReaderConfig) -> GateEvents:
    """Exact sequential oracle: per-sample `lax.scan` FSM clone of
    gate_impl.cc:127-195 (compat mode / CPU tests).  Freezes detection while
    the gate is open like the reference.  Window lengths alternate
    RN16/EPC/RN16/... exactly as the closed loop produces them: the decoder's
    RN16 branch always emits 16 bits when the window fills (the sync index
    never exceeds the window, tag_decoder_impl.cc:237-253), so every
    Query/QueryRep is followed by an ACK and the gate seeks RN16 and EPC
    windows in strict alternation."""
    n = y.shape[0]
    amp = jnp.abs(y).astype(jnp.float32)
    avg = moving_sum(amp, cfg.win_length) / jnp.float32(cfg.win_length)
    thresh = avg * jnp.float32(cfg.thresh_fraction)

    pw_half = cfg.n_samples_pw // 2
    nt1 = cfg.n_samples_t1
    npc = cfg.num_pulses_command

    def step(carry, xs):
        state, n_samp, pulses, open_rem, next_epc = carry
        a, th, i = xs
        closed = open_rem == 0
        n_samp = jnp.where(closed, n_samp + 1, n_samp)
        to_neg = closed & (a < th) & (state == 1)
        to_pos = closed & (a > th) & (state == -1)
        pulses = jnp.where(
            to_pos, jnp.where(n_samp > pw_half, pulses + 1, 0), pulses
        )
        n_samp = jnp.where(to_neg | to_pos, 0, n_samp)
        state = jnp.where(to_neg, -1, jnp.where(to_pos, 1, state))
        trig = closed & (n_samp > nt1) & (state == 1) & (pulses > npc)
        pulses_out = pulses
        pulses = jnp.where(trig, 0, pulses)
        n_samp = jnp.where(trig, 0, n_samp)  # reference re-zeroes on next seek
        window = jnp.where(next_epc, cfg.epc_window, cfg.rn16_window)
        open_rem = jnp.where(
            trig, window - 1, jnp.maximum(open_rem - 1, 0)
        )
        next_epc = jnp.where(trig, jnp.logical_not(next_epc), next_epc)
        return (state, n_samp, pulses, open_rem, next_epc), (trig, pulses_out)

    init = (jnp.int32(-1), jnp.int32(0), jnp.int32(0), jnp.int32(0),
            jnp.array(False))
    _, (trig, pulses_out) = jax.lax.scan(
        step, init, (amp, thresh, jnp.arange(n, dtype=jnp.int32))
    )
    trig_sample = jnp.where(trig, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    ev = jnp.sort(trig_sample)[: cfg.max_events]
    valid = ev < n
    ev_c = jnp.minimum(ev, n - 1)
    dc, nv = _event_window_stats(y, ev_c, cfg.dc_length)
    return GateEvents(
        index=ev_c.astype(jnp.int32),
        dc=dc,
        valid=valid,
        n_events=jnp.sum(trig.astype(jnp.int32)),
        noise_var=nv,
        n_pulses=pulses_out[ev_c].astype(jnp.int32),
    )
