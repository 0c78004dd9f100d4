"""Batch-pipeline EPC-window SIC: recover second tags from offline captures.

The batch decoder (``runtime/inventory.py``) capture-decodes each EPC
window coherently - when two tags that drew the same RN16 both answered
the ACK, the dominant frame passes CRC and the weaker tag is silently
lost (the reference loses the whole slot, ``tag_decoder_impl.cc:366-387``).
This post-pass re-runs every valid EPC window through
``dsp/collision.py::epc_sic``; the residual pass's frame self-validates
via CRC-16 (false-positive probability 2^-16), so extra EPCs surface only
where a second frame really exists.

Host-side glue around one jitted batched kernel: windows are gathered on
the host (a recovery pass over tens of frames, not the per-sample hot
path) and bucket-padded so repeated calls reuse the compiled program.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ReaderConfig
from ..dsp.filters import matched_filter_decimate
from .inventory import DecodedEvents, matched_taps

_BUCKET = 8


def _sic_batch(cfg: ReaderConfig):
    from ..dsp.collision import epc_sic_batch

    @jax.jit
    def run(w2):
        return epc_sic_batch(jax.lax.complex(w2[:, 0], w2[:, 1]), cfg)

    return run


def recover_epc_collisions(
    iq: np.ndarray, dec: DecodedEvents, cfg: ReaderConfig
) -> List[Tuple[int, int, np.ndarray]]:
    """Run EPC-window SIC over every valid EPC window of a batch decode.

    iq: the original complex ADC-rate capture (host array).
    Returns [(event index, tag id, 128 frame bits), ...] for each
    CRC-valid residual frame that differs from the window's primary
    decode - i.e. the second tags of same-RN16 collisions.
    """
    y = np.asarray(matched_filter_decimate(
        jnp.asarray(np.asarray(iq)), matched_taps(cfg), cfg.decim))
    valid = np.asarray(dec.valid) & np.asarray(dec.epc_fits)
    idxs = np.nonzero(valid)[0]
    if idxs.size == 0:
        return []
    w = cfg.epc_window
    dcw = cfg.dc_length
    wins = []
    for e in idxs:
        s = int(np.asarray(dec.index)[e])
        if s + w > y.size:
            wins.append(np.zeros(w, np.complex64))
            continue
        dc = y[max(s - dcw + 1, 0): s + 1].mean()
        wins.append(y[s: s + w] - dc)
    pad = -len(wins) % _BUCKET
    wins += [np.zeros(w, np.complex64)] * pad
    stack = np.asarray(wins, dtype=np.complex64)
    w2 = np.stack([stack.real, stack.imag], axis=1).astype(np.float32)
    r = _sic_batch(cfg)(jnp.asarray(w2))
    bits = np.asarray(r.bits)
    ok = np.asarray(r.crc_ok)

    primary = np.asarray(dec.epc_bits)
    out = []
    for k, e in enumerate(idxs):
        if not ok[k, 1]:
            continue
        second = bits[k, 1]
        if np.array_equal(second, primary[e]) or np.array_equal(
                second, bits[k, 0]):
            continue
        tid = int("".join(map(str, second[104:112])), 2)
        out.append((int(e), tid, second))
    return out


def extra_tag_reads(recovered) -> Dict[int, int]:
    """Aggregate recovered frames into a tag-id -> extra-reads map."""
    reads: Dict[int, int] = {}
    for _, tid, _ in recovered:
        reads[tid] = reads.get(tid, 0) + 1
    return reads
