"""Sharded capture decode: overlap-save time blocks + channel parallelism.

New capability over the reference (which streams one capture through one
thread, SURVEY.md section 2.5).  Design:

* the raw ADC-rate capture is sharded contiguously over the ``time`` mesh
  axis; each shard exchanges left/right halos with its neighbors via
  ``lax.ppermute`` (ICI), sized so that any command event whose trigger lands
  in the owned region can be detected with correct gate state (left halo:
  command span + T1 + averaging window) and its decode window extracted
  (right halo: EPC window);
* the matched filter, gate detection and batched per-event decode all run
  inside ``shard_map`` - per-shard, no cross-device traffic beyond the halo;
* each shard emits a fixed-capacity event table with *global* indices
  (ownership rule: an event belongs to the shard containing its trigger
  sample, so boundary-spanning frames decode on exactly one shard);
* the small tables are gathered (all-gather of events, not samples),
  merge-sorted by index, and the O(events) inventory-round FSM replay runs
  on the global table, one independent replay per frequency channel.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import ReaderConfig
from ..dsp.filters import boxcar_taps
from ..dsp.gate import gate_detect
from ..runtime.inventory import (DecodedEvents, decode_events,
                                 decode_events_multi, replay_inventory,
                                 replay_inventory_batch)
from ..runtime.stats import InventoryStats
from .mesh import CHAN_AXIS, TIME_AXIS


def halo_sizes(cfg: ReaderConfig) -> Tuple[int, int]:
    """(left, right) halo in post-decimation samples.

    Left: longest command (Query: preamble + 22 max-length PIE bits) + T1
    quiet + moving-average window + margin - enough context to reconstruct
    the gate FSM state at the shard boundary.  Right: a trigger on the last
    owned sample still needs its full EPC decode window.
    """
    cmd_us = (
        cfg.delim_us + 2 * cfg.pw_us + 8 * cfg.pw_us + cfg.trcal_us
        + cfg.query_length * 4 * cfg.pw_us
    )
    left = int(cmd_us * cfg.sample_rate / 1e6) + cfg.n_samples_t1 + cfg.win_length + 64
    right = cfg.epc_window + 64
    return left, right


def _fir_valid(x: jnp.ndarray, taps: jnp.ndarray, decim: int) -> jnp.ndarray:
    """y[k] = sum_j taps[j] * x[k*decim + j] (no implicit history padding).

    The global zero-history convention of ``matched_filter_decimate`` is
    reproduced across shards by the first shard's all-zero left halo.
    """
    xs = jnp.stack([jnp.real(x), jnp.imag(x)]).astype(jnp.float32)
    out = jax.lax.conv_general_dilated(
        xs[:, None, :],
        taps[None, None, ::-1].astype(jnp.float32),
        window_strides=(decim,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :]
    return jax.lax.complex(out[0], out[1])


@functools.lru_cache(maxsize=32)
def _with_cap(cfg: ReaderConfig, cap: int) -> ReaderConfig:
    return dataclasses.replace(cfg, max_events=cap)


def _shard_body(
    x_block: jnp.ndarray,
    *,
    cfg: ReaderConfig,
    taps: jnp.ndarray,
    events_cap: int,
) -> DecodedEvents:
    """Per-device body under shard_map.

    x_block: (C_loc, 2, N_loc) float32 planar I/Q - complex64 stays inside
    jit (the TPU runtime here rejects complex at jit boundaries, and planar
    halos keep the ppermute payload real).
    """
    axis = TIME_AXIS
    n_shards = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    hl_y, hr_y = halo_sizes(cfg)
    t = taps.shape[0]
    hl_x = hl_y * cfg.decim + (t - 1)
    hr_x = hr_y * cfg.decim
    cap_cfg = _with_cap(cfg, events_cap)

    n_y = x_block.shape[2] // cfg.decim

    def front(x2: jnp.ndarray):
        # Halo exchange over ICI.  Missing links deliver zeros, which at the
        # capture edges matches the global zero-history convention.
        left = jax.lax.ppermute(
            x2[:, -hl_x:], axis, [(i, i + 1) for i in range(n_shards - 1)]
        )
        right = jax.lax.ppermute(
            x2[:, :hr_x], axis, [(i, i - 1) for i in range(1, n_shards)]
        )
        x2_ext = jnp.concatenate([left, x2, right], axis=1)
        x_ext = jax.lax.complex(x2_ext[0], x2_ext[1])
        y_ext = _fir_valid(x_ext, taps, cfg.decim)
        # y_ext[k] is global post-decim index me * n_y - hl_y + k.
        events = gate_detect(y_ext, cap_cfg)
        owned = events.valid & (events.index >= hl_y) & (events.index < hl_y + n_y)
        return y_ext, events._replace(valid=owned)

    y_c, events_c = jax.vmap(front)(x_block)
    # Command-classified roles are local facts, so shards specialize
    # without knowing global parity (command_roles); no cond fallback
    # here (a batched cond would execute both branches).  The specialized
    # decode flattens the channel axis into the event batch
    # (decode_events_multi): a channel-vmapped decode measured ~2x slower
    # on v5e from batched gathers/scatters.  Compat mode keeps the
    # per-channel paranoid vmap (reference-parity path).
    if cfg.mode != "compat":
        dec = decode_events_multi(y_c, events_c, cfg)
    else:
        dec = jax.vmap(
            lambda y, ev: decode_events(
                y, ev, cfg, specialize=False, overflow_fallback=False)
        )(y_c, events_c)
    g0 = me.astype(jnp.int32) * n_y - hl_y
    return dec._replace(
        index=jnp.where(events_c.valid, dec.index + g0, jnp.int32(1 << 30)),
        valid=events_c.valid,
    )


def _event_out_specs() -> DecodedEvents:
    r2 = P(CHAN_AXIS, TIME_AXIS)        # (C, n_time*cap)
    r3 = P(CHAN_AXIS, TIME_AXIS, None)  # (C, n_time*cap, k)
    return DecodedEvents(
        index=r2, valid=r2, rn16_fits=r2, epc_fits=r2,
        rn16_bits=r3, epc_bits=r3, epc_pass=r2, tag_id=r2, t_half=r2, h_est=r3,
        slot_state=r2, rn16_energy=r2, rn16_margin=r2, cmd_type=r2,
    )


def _sort_events(dec_c: DecodedEvents, cfg: ReaderConfig) -> DecodedEvents:
    """One channel's concatenated shard tables, index-sorted + capped."""
    order = jnp.argsort(dec_c.index)
    flat = jax.tree.map(lambda a: a[order], dec_c)
    return jax.tree.map(lambda a: a[: cfg.max_events], flat)


def _sort_and_replay(dec_c: DecodedEvents, cfg: ReaderConfig) -> InventoryStats:
    """One channel's concatenated shard tables -> global replay."""
    return replay_inventory(_sort_events(dec_c, cfg), cfg)


def decode_capture_sharded(
    iq,
    cfg: ReaderConfig,
    mesh: Mesh,
    events_per_shard: int = 256,
) -> Tuple[InventoryStats, DecodedEvents]:
    """Decode a (C, N) multi-channel ADC-rate capture on a (time, chan) mesh.

    ``iq`` is a host complex array; it crosses the jit boundary as planar
    (C, 2, N) float32.  Returns per-channel InventoryStats (leaves stacked
    on a leading channel axis) and the merged event tables.  N must divide
    by n_time * decim.
    """
    import numpy as np

    n_time = mesh.shape[TIME_AXIS]
    iq = np.asarray(iq)
    c, n = iq.shape
    assert n % (n_time * cfg.decim) == 0, (n, n_time, cfg.decim)
    assert c % mesh.shape[CHAN_AXIS] == 0, (c, mesh.shape[CHAN_AXIS])
    iq2 = jnp.asarray(
        np.stack([iq.real, iq.imag], axis=1).astype(np.float32)
    )  # (C, 2, N)
    return _run_sharded_planar(iq2, cfg, mesh, events_per_shard)


def make_sharded_decoder(
    cfg: ReaderConfig, mesh: Mesh, events_per_shard: int = 256
):
    """Unjitted (C, 2, N) planar decode fn bound to a mesh.

    Returned fn maps a planar global array to (per-channel InventoryStats,
    merged DecodedEvents); callers jit it directly or embed it in a larger
    jitted program (bench_scaling.py wraps it in an in-jit repeat loop for
    async-safe timing).
    """
    n_taps = int(cfg.tag_bit_us / 2 * cfg.adc_rate / 1e6 / cfg.miller_m)
    taps = jnp.asarray(boxcar_taps(n_taps))
    body = functools.partial(
        _shard_body, cfg=cfg, taps=taps, events_cap=events_per_shard
    )
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=P(CHAN_AXIS, None, TIME_AXIS),
        out_specs=_event_out_specs(),
    )

    def run(iq_in):
        dec = sharded(iq_in)  # leaves (C, n_time*cap, ...)
        # Sort per channel, then replay with the fast/scan cond hoisted
        # above the channel vmap (replay_inventory_batch): a vmapped cond
        # executes both branches, which would put the O(n_time*cap)
        # sequential scan on every iteration's critical path - the
        # replicated-serial term of the pod-scaling model
        # (tools/scaling_model.py).
        flat = jax.vmap(lambda d: _sort_events(d, cfg))(dec)
        stats = replay_inventory_batch(flat, cfg)
        return stats, dec

    return run


def _run_sharded_planar(
    iq2, cfg: ReaderConfig, mesh: Mesh, events_per_shard: int
) -> Tuple[InventoryStats, DecodedEvents]:
    """Jitted sharded decode of a (C, 2, N) planar global array."""
    return jax.jit(make_sharded_decoder(cfg, mesh, events_per_shard))(iq2)
