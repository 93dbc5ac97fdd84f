"""ctypes bindings for the native runtime library (libgasr.so).

Native equivalents of the reference's C++ runtime pieces, rebuilt for a
TPU deployment's host side: CycleTimer (cycleTimer.h), an audio feature
frontend (absent in the reference), and a multithreaded CPU CTC beam
decoder standing in for ctcdecode (baseline/main.py:28).

The library auto-builds on first import (one small TU, ~2 s). All entry
points degrade gracefully: importing this package raises only when a
symbol is actually used without the library.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgasr.so")


class _Lib:
    """Lazy loader/builder for libgasr.so."""

    def __init__(self) -> None:
        self._lib: Optional[ctypes.CDLL] = None

    def _build(self) -> None:
        subprocess.run(["make", "-s", "-C", _DIR], check=True,
                       capture_output=True)

    def get(self) -> ctypes.CDLL:
        if self._lib is None:
            if not os.path.exists(_SO) or (
                    os.path.getmtime(_SO) <
                    os.path.getmtime(os.path.join(_DIR, "gasr_native.cpp"))):
                self._build()
            lib = ctypes.CDLL(_SO)
            lib.gasr_current_seconds.restype = ctypes.c_double
            lib.gasr_logmel.restype = ctypes.c_int
            lib.gasr_logmel.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
                ctypes.c_float, ctypes.POINTER(ctypes.c_float)]
            lib.gasr_beam_decode_batch.restype = None
            lib.gasr_beam_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float)]
            self._lib = lib
        return self._lib


lib_loader = _Lib()


class lib:
    """Namespace mirroring the C API with numpy marshalling."""

    @staticmethod
    def current_seconds() -> float:
        return lib_loader.get().gasr_current_seconds()


def current_seconds() -> float:
    return lib_loader.get().gasr_current_seconds()


def logmel(audio: np.ndarray, sample_rate: int = 16000, n_fft: int = 512,
           hop: int = 160, n_mels: int = 80, fmin: float = 0.0,
           fmax: float = 0.0) -> np.ndarray:
    """audio [n] float32 -> log-mel features [n_frames, n_mels]."""
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    n = audio.shape[0]
    max_frames = 0 if n < n_fft else 1 + (n - n_fft) // hop
    out = np.empty((max_frames, n_mels), dtype=np.float32)
    got = lib_loader.get().gasr_logmel(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        sample_rate, n_fft, hop, n_mels, fmin, fmax,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if got < 0:
        raise ValueError("gasr_logmel failed (n_fft must be a power of 2)")
    return out[:got]


def cpu_beam_decode_batch(
    log_probs: np.ndarray, beam_width: int, blank_id: int = 0,
    max_len: int = 256, num_threads: int = 4,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """log_probs [T, B, V] -> (tokens [B, max_len], lens [B], scores [B]).

    Multithreaded CPU prefix beam search (ctcdecode-equivalent).
    """
    log_probs = np.ascontiguousarray(log_probs, dtype=np.float32)
    T, B, V = log_probs.shape
    tokens = np.full((B, max_len), -1, dtype=np.int32)
    lens = np.zeros((B,), dtype=np.int32)
    scores = np.zeros((B,), dtype=np.float32)
    lib_loader.get().gasr_beam_decode_batch(
        log_probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        T, B, V, beam_width, blank_id, max_len, num_threads,
        tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return tokens, lens, scores
