"""Closed-loop live reader: TX synthesis driven by decoded replies.

The real-time counterpart of the reference application (its non-DEBUG mode,
``apps/reader.py:82-96``): the reader transmits Query/QueryRep, decodes the
RN16 from the returning samples, transmits an ACK *containing the decoded
bits*, and decodes the EPC - one slot at a time, with decode results feeding
back into what gets transmitted.  The batch decoder can never demonstrate
this loop (pre-recorded traces already contain the answers); here a wrong
RN16 decode silences the tag (see sim/channel.py), so every EPC read proves
the loop.

Per-slot decoding reuses the batch primitives on small blocks: inline FIR,
the block-parallel gate with a carried RX context tail (the moving-average
and DC state needs ~T1+window of history, exactly like the streaming
chunker), and the per-frame sync/FM0/CRC stack.

Radio I/O is abstracted behind a ``channel.exchange(kind, bits, tx_env,
cw_us)`` callable; `sim.channel.SimTagChannel` provides the simulated air
interface, and a UHD-style adapter can provide a real one.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from ..config import ReaderConfig
from ..protocol import gen2
from ..tx.pie import PieEncoder
from ..runtime.stats import InventoryStats, N_TAG_BINS


@dataclasses.dataclass
class LiveStats:
    n_queries: int = 0
    n_epc_correct: int = 0
    cur_round: int = 1
    cur_slot: int = 1
    n_no_rn16: int = 0          # slots where no command event / reply decoded
    tag_reads: Optional[np.ndarray] = None

    def __post_init__(self):
        if self.tag_reads is None:
            self.tag_reads = np.zeros(N_TAG_BINS, np.int64)


class LiveReader:
    """Drives inventory rounds over an interactive channel."""

    def __init__(self, cfg: ReaderConfig):
        self.cfg = cfg
        self.enc = PieEncoder(cfg)
        self.stats = LiveStats()
        # RX context carried between exchanges so the gate's moving average
        # and DC state are warm when each reply window arrives.
        self._ctx = np.zeros(0, np.complex64)
        n_taps = int(cfg.tag_bit_us / 2 * cfg.adc_rate / 1e6 / cfg.miller_m)
        self._ctx_len = (cfg.win_length + cfg.n_samples_t1 + 64) * cfg.decim + n_taps

    # ---- per-block decode (numpy/jnp on small arrays) ----

    def _decode_window(self, rx: np.ndarray, want_epc: bool):
        import jax.numpy as jnp

        from ..dsp import fm0, miller, sync
        from ..dsp.filters import matched_filter_decimate
        from ..dsp.gate import gate_detect
        from .inventory import check_epc_crc_batch, matched_taps

        cfg = self.cfg
        block = np.concatenate([self._ctx, rx])
        self._ctx = block[-self._ctx_len:]
        y = matched_filter_decimate(jnp.asarray(block), matched_taps(cfg),
                                    cfg.decim)
        ev = gate_detect(y, dataclasses.replace(cfg, max_events=8))
        valid = np.asarray(ev.valid)
        if not valid.any():
            return None
        idx = int(np.asarray(ev.index)[valid][-1])   # the newest command
        w = cfg.epc_window if want_epc else cfg.rn16_window
        if idx + w > int(y.shape[0]):
            return None
        frame = y[idx : idx + w] - np.asarray(ev.dc)[valid][-1]
        if cfg.miller_m == 1:
            di, h = sync.tag_sync(frame, cfg)
            if want_epc:
                m2 = jnp.abs(frame) ** 2
                bits, _ = fm0.epc_detect(frame, m2.astype(jnp.float32), di, h, cfg)
            else:
                bits = fm0.rn16_detect(frame, di, h, cfg)
        else:
            di, h = miller.miller_sync(frame, cfg)
            if want_epc:
                bits, _ = miller.miller_epc(frame, di, h, cfg)
            else:
                bits = miller.miller_rn16(frame, di, h, cfg)
        bits = np.asarray(bits)
        if want_epc:
            ok = bool(np.asarray(check_epc_crc_batch(jnp.asarray(bits[None]))[0]))
            return bits, ok
        return bits

    # ---- the closed loop ----

    def run_inventory(self, channel, n_rounds: int) -> LiveStats:
        cfg = self.cfg
        cw_q = float(cfg.t1_us + cfg.t2_us + cfg.rn16_us)
        cw_a = float(3 * cfg.t1_us + cfg.t2_us + cfg.epc_us)
        for _ in range(n_rounds):
            for s in range(cfg.max_slot_number):
                if s == 0:
                    kind, bits = "query", gen2.query_bits(cfg)
                    tx = self.enc.query()
                else:
                    kind, bits = "query_rep", gen2.query_rep_bits(cfg)
                    tx = self.enc.query_rep()
                rx = channel.exchange(kind, bits, tx, cw_q)
                self.stats.n_queries += 1
                rn16 = self._decode_window(rx, want_epc=False)
                if rn16 is None:
                    self.stats.n_no_rn16 += 1
                    rn16 = np.zeros(16, np.int64)
                # ACK always follows (reference closed-loop behavior:
                # the RN16 branch always yields 16 bits).
                ack = gen2.ack_bits(np.asarray(rn16))
                rx2 = channel.exchange("ack", ack, self.enc.ack(rn16), cw_a)
                out = self._decode_window(rx2, want_epc=True)
                if out is not None:
                    epc_bits, ok = out
                    if ok:
                        self.stats.n_epc_correct += 1
                        tid = int("".join(map(str, epc_bits[104:112])), 2)
                        self.stats.tag_reads[tid] += 1
                self.stats.cur_slot += 1
                if self.stats.cur_slot > cfg.max_slot_number:
                    self.stats.cur_slot = 1
                    self.stats.cur_round += 1
        return self.stats
