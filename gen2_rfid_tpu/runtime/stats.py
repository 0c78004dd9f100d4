"""Inventory statistics pytree + exact-format results report.

Functional replacement for the reference's global ``READER_STATS`` struct
(``global_vars.h:36-53``) and ``reader::print_results``
(``reader_impl.cc:173-192``).  The stats are a pytree of arrays so they can be
produced inside jit, psum-reduced across hosts, and compared in tests; the
printer clones the reference's output format for golden comparison.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

N_TAG_BINS = 256  # tag id = EPC frame bits[104:112], an 8-bit field


class InventoryStats(NamedTuple):
    n_queries: jnp.ndarray          # () int32: Query/QueryRep commands processed
    cur_inventory_round: jnp.ndarray  # () int32
    cur_slot: jnp.ndarray           # () int32
    n_epc_correct: jnp.ndarray      # () int32
    tag_reads: jnp.ndarray          # (256,) int32 reads per tag id
    unique_tags_round: jnp.ndarray  # (R,) int32 unique count at each round close
    n_rounds_closed: jnp.ndarray    # () int32
    n_events: jnp.ndarray           # () int32 gate events seen
    terminated: jnp.ndarray         # () bool
    # Slot-state accounting over Query/QueryRep reply windows (new
    # capability; see runtime.inventory.classify_slots).
    n_slot_empty: jnp.ndarray = np.int32(0)      # () int32
    n_slot_single: jnp.ndarray = np.int32(0)     # () int32
    n_slot_collision: jnp.ndarray = np.int32(0)  # () int32
    # Processed events by classified command type (CMD_QUERY..CMD_UNKNOWN).
    cmd_counts: jnp.ndarray = np.zeros(6, np.int32)  # (6,) int32


def unique_tags(stats: InventoryStats) -> int:
    return int(np.sum(np.asarray(stats.tag_reads) > 0))


def merge_stats(a: InventoryStats, b: InventoryStats) -> InventoryStats:
    """Combine stats from consecutive capture segments (host-side reduce)."""
    return InventoryStats(
        n_queries=a.n_queries + b.n_queries,
        cur_inventory_round=a.cur_inventory_round + b.cur_inventory_round - 1,
        cur_slot=b.cur_slot,
        n_epc_correct=a.n_epc_correct + b.n_epc_correct,
        tag_reads=a.tag_reads + b.tag_reads,
        unique_tags_round=jnp.concatenate(
            [a.unique_tags_round, b.unique_tags_round]
        ),
        n_rounds_closed=a.n_rounds_closed + b.n_rounds_closed,
        n_events=a.n_events + b.n_events,
        terminated=jnp.logical_or(a.terminated, b.terminated),
        n_slot_empty=a.n_slot_empty + b.n_slot_empty,
        n_slot_single=a.n_slot_single + b.n_slot_single,
        n_slot_collision=a.n_slot_collision + b.n_slot_collision,
        cmd_counts=a.cmd_counts + b.cmd_counts,
    )


def format_results(stats: InventoryStats) -> str:
    """Byte-format clone of reader::print_results (reader_impl.cc:173-192).

    The reference prints ``n_queries_sent - 1`` because its live FSM has
    always pre-queued one more command than the capture answers; the batch
    decoder counts commands actually present in the capture, which equals
    that printed value on an offline trace.
    """
    reads = np.asarray(stats.tag_reads)
    lines = [
        "\n --------------------------",
        f"| Number of queries/queryreps sent : {int(stats.n_queries)}",
        f"| Current Inventory round : {int(stats.cur_inventory_round)}",
        " --------------------------",
        f"| Correctly decoded EPC : {int(stats.n_epc_correct)}",
        f"| Number of unique tags : {int(np.sum(reads > 0))}",
    ]
    for tid in np.nonzero(reads > 0)[0]:
        lines.append(f"| Tag ID : {tid:x}  Num of reads : {int(reads[tid])}")
    lines.append(" --------------------------")
    return "\n".join(lines)


def print_results(stats: InventoryStats) -> None:
    print(format_results(stats))


def tag_signal_report(dec) -> dict:
    """Per-tag RSSI / phase from the per-read channel estimates.

    New capability (commercial readers report per-read RSSI and phase for
    ranging/localization; the reference computes ``h_est`` per frame,
    tag_decoder_impl.cc:103, but never surfaces it).  For each tag id with
    CRC-passing EPC reads, reports

    * ``rssi_dbfs``: 10*log10(mean |h|^2) of the post-matched-filter
      channel estimate (dB full-scale: with a unit-amplitude backscatter
      chip and T boxcar taps, |h| = T);
    * ``phase_rad``: circular mean of angle(h) - the backscatter phase;
    * ``phase_spread_rad``: circular std (1 - |mean unit vector|, mapped
      through sqrt(-2 ln R)) - small for a static tag, grows with motion;
    * ``n_reads``.
    """
    valid = np.asarray(dec.valid) & np.asarray(dec.epc_pass)
    h = np.asarray(dec.h_est)[valid]
    tid = np.asarray(dec.tag_id)[valid]
    out = {}
    for t in np.unique(tid):
        hs = h[tid == t]
        z = hs[:, 0] + 1j * hs[:, 1]
        power = float(np.mean(np.abs(z) ** 2))
        unit = z / np.maximum(np.abs(z), 1e-20)
        r = np.abs(unit.mean())
        out[int(t)] = {
            "rssi_dbfs": 10.0 * float(np.log10(max(power, 1e-30))),
            "phase_rad": float(np.angle(unit.mean())),
            "phase_spread_rad": float(np.sqrt(max(-2.0 * np.log(max(r, 1e-12)), 0.0))),
            "n_reads": int(hs.shape[0]),
        }
    return out


def tag_report_records(dec, cfg, freq_hz: float = None) -> list:
    """Per-read tag report records (the LLRP RO_ACCESS_REPORT analogue
    commercial readers stream; the reference only prints an end-of-run
    summary, reader_impl.cc:173-192).

    One dict per CRC-passed EPC read: time (s, capture clock), the full
    EPC (hex, PC-length-aware), its GS1 TDS identity URI when the EPC
    carries a known TDS header (``epc_uri``, protocol/tds.py), tag id,
    RSSI (dBfs), backscatter phase (rad), and the carrier (MHz) when
    given.  Serializes to JSON lines (CLI decode --report).
    """
    from ..protocol import tds
    from ..protocol.gen2 import parse_epc_frame_full

    valid = np.asarray(dec.valid) & np.asarray(dec.epc_pass)
    idx = np.asarray(dec.index)[valid]
    bits = np.asarray(dec.epc_bits)[valid]
    tid = np.asarray(dec.tag_id)[valid]
    h = np.asarray(dec.h_est)[valid]
    hc = h[:, 0] + 1j * h[:, 1]
    out = []
    for k in range(idx.size):
        fr = parse_epc_frame_full(bits[k])
        epc = fr["epc"]                   # XPC word (if any) excluded
        epc_hex = "".join(
            f"{int(''.join(map(str, epc[j: j + 4])), 2):x}"
            for j in range(0, epc.size, 4)) if fr["ok"] else ""
        rec = {
            "time_s": round(float(idx[k] / cfg.sample_rate), 6),
            "epc": epc_hex,
            "epc_words": epc.size // 16,
            "tag_id": int(tid[k]),
            "rssi_dbfs": round(float(
                10 * np.log10(max(abs(hc[k]) ** 2, 1e-30))), 2),
            "phase_rad": round(float(np.angle(hc[k])), 4),
        }
        if fr["ok"] and epc.size:
            ident = tds.decode_epc(epc)
            if "uri" in ident:
                rec["epc_uri"] = ident["uri"]
        if fr["xi"]:
            # Gen2 v2 XPC word present: surface the untraceable flag.
            rec["u_flag"] = fr["u"]
        if freq_hz:
            rec["channel_mhz"] = round(freq_hz / 1e6, 3)
        out.append(rec)
    return out
