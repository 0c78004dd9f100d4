"""ctypes bindings + on-demand build for the native streaming engine.

The reference's runtime is C++ (three GNU Radio blocks + scheduler); this is
the framework's native counterpart: `gen2_stream.cc` compiled to a shared
library on first use (g++ -O3), exposed through a plain-C ABI.  pybind11 is
not available in this image, so the binding is ctypes (zero-copy via numpy
pointers).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from ..config import ReaderConfig
from ..runtime.stats import InventoryStats

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "gen2_stream.cc")
_SO = os.path.join(_HERE, "libgen2_stream.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


class _Params(ctypes.Structure):
    _fields_ = [
        ("decim", ctypes.c_int32),
        ("n_taps", ctypes.c_int32),
        ("win_length", ctypes.c_int32),
        ("dc_length", ctypes.c_int32),
        ("n_samples_t1", ctypes.c_int32),
        ("pw_half", ctypes.c_int32),
        ("num_pulses_command", ctypes.c_int32),
        ("thresh_fraction", ctypes.c_float),
        ("n_samples_tag_bit", ctypes.c_float),
        ("rn16_window", ctypes.c_int32),
        ("epc_window", ctypes.c_int32),
        ("rn16_half_bits", ctypes.c_int32),
        ("epc_data_bits", ctypes.c_int32),
        ("tag_preamble_bits", ctypes.c_int32),
        ("max_slot", ctypes.c_int32),
        ("max_queries", ctypes.c_int32),
        ("max_unique", ctypes.c_int32),
        ("pc_length", ctypes.c_int32),
        ("miller_m", ctypes.c_int32),
        ("trext", ctypes.c_int32),
    ]


class _Stats(ctypes.Structure):
    _fields_ = [
        ("n_queries", ctypes.c_int32),
        ("cur_round", ctypes.c_int32),
        ("cur_slot", ctypes.c_int32),
        ("n_epc_correct", ctypes.c_int32),
        ("n_events", ctypes.c_int32),
        ("terminated", ctypes.c_int32),
        ("tag_reads", ctypes.c_int32 * 256),
    ]


def _build() -> str:
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _SO],
            check=True, capture_output=True,
        )
    return _SO


def _lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build())
            lib.gen2_engine_new.restype = ctypes.c_void_p
            lib.gen2_engine_new.argtypes = [ctypes.POINTER(_Params)]
            lib.gen2_engine_free.argtypes = [ctypes.c_void_p]
            lib.gen2_engine_feed.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
            lib.gen2_engine_stats.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(_Stats)]
            lib.gen2_engine_events.restype = ctypes.c_int64
            lib.gen2_engine_events.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
            _LIB = lib
    return _LIB


def native_available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


def _params(cfg: ReaderConfig) -> _Params:
    return _Params(
        decim=cfg.decim,
        n_taps=int(cfg.tag_bit_us / 2 * cfg.adc_rate / 1e6 / cfg.miller_m),
        win_length=cfg.win_length,
        dc_length=cfg.dc_length,
        n_samples_t1=cfg.n_samples_t1,
        pw_half=cfg.n_samples_pw // 2,
        num_pulses_command=cfg.num_pulses_command,
        thresh_fraction=cfg.thresh_fraction,
        n_samples_tag_bit=cfg.n_samples_tag_bit,
        rn16_window=cfg.rn16_window,
        epc_window=cfg.epc_window,
        rn16_half_bits=cfg.rn16_half_bits,
        epc_data_bits=cfg.epc_data_bits,
        tag_preamble_bits=cfg.tag_preamble_bits,
        max_slot=cfg.max_slot_number,
        max_queries=cfg.max_num_queries,
        max_unique=cfg.max_unique_tags,
        # Native mode parses the PC length field (variable-length EPC);
        # compat pins the reference's fixed-length check.
        pc_length=0 if cfg.mode == "compat" else 1,
        miller_m=cfg.miller_m,
        trext=cfg.trext,
    )


class NativeEngine:
    """Streaming closed-loop decoder: feed ADC-rate chunks, read stats."""

    def __init__(self, cfg: ReaderConfig):
        self.cfg = cfg
        self._lib = _lib()
        self._h = self._lib.gen2_engine_new(ctypes.byref(_params(cfg)))

    def feed(self, iq: np.ndarray) -> None:
        iq = np.ascontiguousarray(iq, dtype=np.complex64)
        ptr = iq.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        self._lib.gen2_engine_feed(self._h, ptr, iq.size)

    def events(self, cap: int = 65536) -> np.ndarray:
        out = np.empty(cap, np.int32)
        n = self._lib.gen2_engine_events(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
        return out[:n]

    def stats(self) -> InventoryStats:
        s = _Stats()
        self._lib.gen2_engine_stats(self._h, ctypes.byref(s))
        reads = np.ctypeslib.as_array(s.tag_reads).copy()
        return InventoryStats(
            n_queries=np.int32(s.n_queries),
            cur_inventory_round=np.int32(s.cur_round),
            cur_slot=np.int32(s.cur_slot),
            n_epc_correct=np.int32(s.n_epc_correct),
            tag_reads=reads,
            unique_tags_round=np.zeros(0, np.int32),
            n_rounds_closed=np.int32(s.cur_round - 1),
            n_events=np.int32(s.n_events),
            terminated=np.bool_(s.terminated),
        )

    def close(self) -> None:
        if self._h:
            self._lib.gen2_engine_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
