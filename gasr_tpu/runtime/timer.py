"""Wall-clock timing harness.

Equivalent of the reference's CycleTimer (cycleTimer.h:37-175 — rdtsc +
/proc/cpuinfo frequency scan) and the baseline's perf_counter splits
(baseline/main.py:38-56). On TPU, correct timing requires
jax.block_until_ready() around the region; `Timer` handles that.
A true native rdtsc path is provided by gasr_tpu/native (ctypes), with a
perf_counter fallback.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import jax


class CycleTimer:
    """API twin of CycleTimer::currentSeconds (cycleTimer.h:71-73)."""

    _native = None
    _native_checked = False

    @classmethod
    def current_seconds(cls) -> float:
        if not cls._native_checked:
            cls._native_checked = True
            try:
                from gasr_tpu.native import lib as _nl
                cls._native = _nl
            except Exception:
                cls._native = None
        if cls._native is not None:
            return cls._native.current_seconds()
        return time.perf_counter()


class Timer:
    """Accumulating split timer with device synchronization.

    Mirrors the baseline harness's forward/decode/overall split
    (baseline/main.py:38-56) but blocks on device results so TPU async
    dispatch cannot hide work.
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @staticmethod
    def sync(out) -> None:
        """Hard device fence. block_until_ready is not sufficient under
        remote-TPU tunnels (returns before execution completes); a D2H
        fetch of one output element is."""
        import numpy as np
        jax.block_until_ready(out)
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
                np.asarray(jax.device_get(leaf.ravel()[0]))
                break

    def time(self, name: str, fn: Callable, *args, **kwargs):
        t0 = CycleTimer.current_seconds()
        out = fn(*args, **kwargs)
        self.sync(out)
        dt = CycleTimer.current_seconds() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return out, dt

    def mean(self, name: str) -> float:
        return self.totals[name] / max(self.counts.get(name, 0), 1)

    def report(self) -> Dict[str, float]:
        return {k: self.mean(k) for k in self.totals}
