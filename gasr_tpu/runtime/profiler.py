"""Profiling: trace capture + throughput metrics.

The reference's observability is CycleTimer wall-clock brackets
(main.cpp:13,78) and the baseline's perf_counter splits
(baseline/main.py:38-56). Ours adds:
  - `trace(dir)`: jax.profiler device trace (view in TensorBoard /
    xprof) around any code region;
  - `Speedometer`: accumulates (audio seconds, wall seconds, frames)
    and reports RTF, audio-seconds/s/chip — the BASELINE.json metric;
  - `profile_fn`: per-call device-synced timing table for a pipeline's
    stages.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax

from gasr_tpu.runtime.timer import Timer

FRAME_SHIFT_S = 0.01


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace context (TensorBoard-viewable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Speedometer:
    """Accumulate decode/forward work and report serving metrics."""

    def __init__(self, frame_shift_s: float = FRAME_SHIFT_S,
                 n_chips: int = 1):
        self.frame_shift_s = frame_shift_s
        self.n_chips = max(n_chips, 1)
        self.audio_s = 0.0
        self.wall_s = 0.0
        self.utterances = 0

    def record(self, batch_size: int, n_frames: int, wall_s: float) -> None:
        self.audio_s += batch_size * n_frames * self.frame_shift_s
        self.wall_s += wall_s
        self.utterances += batch_size

    def report(self) -> Dict[str, float]:
        wall = max(self.wall_s, 1e-9)
        return {
            "audio_s": self.audio_s,
            "wall_s": self.wall_s,
            "utterances": float(self.utterances),
            "rtf": self.audio_s / wall,                      # >1 = faster
            "audio_s_per_s_per_chip": self.audio_s / wall / self.n_chips,
        }


def profile_fn(fn: Callable, *args, iters: int = 5, warmup: int = 1,
               **kwargs) -> Dict[str, float]:
    """Steady-state timing of a jitted callable with hard device sync."""
    for _ in range(warmup):
        Timer.sync(fn(*args, **kwargs))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args, **kwargs)
    Timer.sync(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "iters": iters}
