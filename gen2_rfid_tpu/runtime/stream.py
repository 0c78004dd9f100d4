"""Chunked decode of long captures with exact cross-chunk event ownership.

The reference streams a capture through the GNU Radio scheduler in small
buffers (``gate_impl.cc:86-200`` handles arbitrary work sizes); the batch
decoder processes whole blocks on-device.  For captures longer than device
memory this driver splits the ADC-rate stream into fixed-size chunks with a
carried context tail (overlap-save), so that:

* every command event is *owned* by exactly one chunk (the chunk whose
  owned interval [C0 - hr, C1 - hr) contains the trigger), with enough left
  context to reconstruct gate state and enough right room to extract the
  full EPC window;
* one trailing all-zero chunk closes the tail so events near the capture
  end are still owned by some chunk;
* window-fit flags are re-checked against the *real* capture length, so a
  window that would run past the end is dropped exactly like the
  reference's "wait until n_samples_to_ungate buffered" precondition
  (tag_decoder_impl.cc:223,291);
* the tiny per-chunk event tables are concatenated on the host and the
  round FSM replays once over the global sequence, making slot/round
  bookkeeping exact across chunk boundaries.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ReaderConfig
from ..dsp.filters import boxcar_taps
from ..dsp.gate import gate_detect
from ..runtime.inventory import DecodedEvents, decode_events, replay_inventory
from ..runtime.stats import InventoryStats
from ..shard.decode_sharded import _fir_valid, halo_sizes


@dataclasses.dataclass
class StreamDecoder:
    """Stateful host-side driver around a jitted per-chunk decode."""

    cfg: ReaderConfig
    chunk_adc: int = 2_000_000       # ADC samples per chunk (1 s at 2 Msps)
    events_per_chunk: int = 512

    def __post_init__(self):
        cfg = self.cfg
        assert self.chunk_adc % cfg.decim == 0
        self.hl_y, self.hr_y = halo_sizes(cfg)
        self.chunk_y = self.chunk_adc // cfg.decim
        n_taps = int(cfg.tag_bit_us / 2 * cfg.adc_rate / 1e6 / cfg.miller_m)
        self.n_taps = n_taps
        self.ctx_adc = (self.hl_y + self.hr_y) * cfg.decim + n_taps - 1
        self._decode = jax.jit(self._chunk_fn)

    def _chunk_fn(self, x2: jnp.ndarray) -> DecodedEvents:
        """x2: planar (2, ctx_adc + chunk_adc) float32.  Owned local indices:
        [hl_y, hl_y + chunk_y)."""
        cfg = self.cfg
        x_ext = jax.lax.complex(x2[0], x2[1])
        taps = jnp.asarray(boxcar_taps(self.n_taps))
        y = _fir_valid(x_ext, taps, cfg.decim)
        cap_cfg = dataclasses.replace(cfg, max_events=self.events_per_chunk)
        events = gate_detect(y, cap_cfg)
        owned = (
            events.valid
            & (events.index >= self.hl_y)
            & (events.index < self.hl_y + self.chunk_y)
        )
        events = events._replace(valid=owned)
        # Chunk tables specialize too: decode-window roles come from the
        # classified command (command_roles), not global event parity.
        dec = decode_events(y, events, cfg, specialize=cfg.mode != "compat")
        return dec._replace(valid=owned)

    # ------------------------------------------------------------------
    # Incremental API with checkpoint/resume.  The resumable unit is
    # (context tail, chunk counter, per-chunk event tables) - a few KB of
    # context plus tiny tables, vs. re-decoding the whole capture (the
    # reference has no checkpointing at all, SURVEY.md section 5).
    # ------------------------------------------------------------------

    def reset(self) -> None:
        self._tables = []
        self._ctx = np.zeros(self.ctx_adc, np.complex64)  # zero history
        self._buf = np.zeros(0, np.complex64)
        self._total_adc = 0
        self._chunk_no = 0

    def _flush(self, block: np.ndarray) -> None:
        x_ext = np.concatenate([self._ctx, block])
        x2 = jnp.asarray(np.stack([x_ext.real, x_ext.imag]).astype(np.float32))
        dec = jax.tree.map(np.asarray, self._decode(x2))
        # local owned index hl_y maps to global C0 - hr_y.
        g0 = self._chunk_no * self.chunk_y - self.hl_y - self.hr_y
        g_idx = dec.index + g0
        self._tables.append(
            dec._replace(index=np.where(dec.valid, g_idx, 1 << 30))
        )
        self._ctx = x_ext[-self.ctx_adc:]
        self._chunk_no += 1

    def feed(self, chunk: np.ndarray) -> None:
        """Feed ADC-rate complex64 samples (any length)."""
        if not hasattr(self, "_tables"):
            self.reset()
        chunk = np.asarray(chunk, np.complex64)
        self._total_adc += len(chunk)
        self._buf = np.concatenate([self._buf, chunk])
        while len(self._buf) >= self.chunk_adc:
            self._flush(self._buf[: self.chunk_adc])
            self._buf = self._buf[self.chunk_adc:]

    def save_checkpoint(self, path: str) -> None:
        """Persist decode state; a new StreamDecoder can resume from it."""
        table_arrays = {}
        for i, t in enumerate(self._tables):
            for name, arr in t._asdict().items():
                table_arrays[f"t{i}_{name}"] = arr
        np.savez_compressed(
            path, ctx=self._ctx, buf=self._buf,
            total_adc=self._total_adc, chunk_no=self._chunk_no,
            n_tables=len(self._tables), **table_arrays,
        )

    def load_checkpoint(self, path: str) -> None:
        z = np.load(path)
        self._ctx = z["ctx"]
        self._buf = z["buf"]
        self._total_adc = int(z["total_adc"])
        self._chunk_no = int(z["chunk_no"])
        fields = DecodedEvents._fields
        self._tables = [
            DecodedEvents(**{f: z[f"t{i}_{f}"] for f in fields})
            for i in range(int(z["n_tables"]))
        ]

    def finish(self) -> Tuple[InventoryStats, int]:
        """Close the stream (pad + zero chunk) and replay the global FSM."""
        cfg = self.cfg
        self._flush(np.pad(self._buf, (0, self.chunk_adc - len(self._buf))))
        self._buf = np.zeros(0, np.complex64)
        self._flush(np.zeros(self.chunk_adc, np.complex64))
        total_adc = self._total_adc
        tables = self._tables

        dec = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *tables)
        order = np.argsort(dec.index, kind="stable")
        dec = jax.tree.map(lambda a: a[order], dec)
        # Drop events past the real capture end; re-check window fit against
        # the real length (reference semantics: a window that cannot fill is
        # never decoded).
        total_y = total_adc // cfg.decim
        dec = dec._replace(
            valid=dec.valid & (dec.index < total_y),
            rn16_fits=dec.rn16_fits & (dec.index + cfg.rn16_window <= total_y),
            epc_fits=dec.epc_fits & (dec.index + cfg.epc_window <= total_y),
        )
        keep = min(len(dec.index), max(cfg.max_events, 1))
        dec = jax.tree.map(lambda a: jnp.asarray(a[:keep]), dec)
        stats = replay_inventory(dec, cfg)
        return jax.tree.map(np.asarray, stats), total_adc

    def decode(self, chunks: Iterable[np.ndarray]) -> Tuple[InventoryStats, int]:
        """Decode an iterable of ADC-rate complex64 chunks -> (stats, total)."""
        self.reset()
        for chunk in chunks:
            self.feed(chunk)
        return self.finish()
