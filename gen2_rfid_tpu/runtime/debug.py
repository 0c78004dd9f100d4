"""Per-stage debug taps (reference: file sinks on every block +
plot_signal.m, ``apps/reader.py:68-72,98-118``, ``misc/code/plot_signal.m``).

``decode_capture_debug`` runs the pipeline stage by stage and returns every
intermediate array; ``save_taps`` dumps them as .npy (the numpy analogue of
the reference's raw-I/Q file sinks, loadable without this package).
"""

from __future__ import annotations

import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..config import ReaderConfig
from ..dsp.filters import matched_filter_decimate, moving_sum
from ..dsp.gate import gate_detect
from ..runtime.inventory import decode_events, matched_taps, replay_inventory


def decode_capture_debug(iq, cfg: ReaderConfig) -> Dict[str, np.ndarray]:
    """Decode with per-stage taps: source, matched filter, gate, decoder.

    Mirrors the reference's tap points: ``file_sink_source`` (raw),
    ``file_sink_matched_filter`` (post-FIR), ``file_sink_gate`` (DC-corrected
    windows), ``file_sink_decoder`` (per-frame decode inputs).
    """
    iq = jnp.asarray(np.asarray(iq, np.complex64))
    y = matched_filter_decimate(iq, matched_taps(cfg), cfg.decim)
    amp = jnp.abs(y)
    avg = moving_sum(amp, cfg.win_length) / cfg.win_length
    events = gate_detect(y, cfg)
    dec = decode_events(y, events, cfg)
    stats = replay_inventory(dec, cfg)
    valid = np.asarray(events.valid)
    return {
        "source": np.asarray(iq),
        "matched_filter": np.asarray(y),
        "amplitude": np.asarray(amp),
        "moving_avg": np.asarray(avg),
        "threshold": np.asarray(avg) * cfg.thresh_fraction,
        "gate_events": np.asarray(events.index)[valid],
        "gate_dc": np.asarray(events.dc)[valid],
        "gate_noise_var": np.asarray(events.noise_var)[valid],
        "rn16_bits": np.asarray(dec.rn16_bits)[np.asarray(dec.valid)],
        "epc_bits": np.asarray(dec.epc_bits)[np.asarray(dec.valid)],
        "epc_pass": np.asarray(dec.epc_pass)[np.asarray(dec.valid)],
        "slot_state": np.asarray(dec.slot_state)[np.asarray(dec.valid)],
        "stats_n_queries": np.asarray(stats.n_queries),
        "stats_n_epc_correct": np.asarray(stats.n_epc_correct),
        "stats_tag_reads": np.asarray(stats.tag_reads),
    }


def save_taps(taps: Dict[str, np.ndarray], out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name, arr in taps.items():
        np.save(os.path.join(out_dir, f"{name}.npy"), arr)
