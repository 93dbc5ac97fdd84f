"""MemoryMonitor — device/host memory accounting.

TPU-native equivalent of the reference's MemoryMonitor singleton
(MemoryMonitor.h:9-28, .cpp:9-52), which wraps every cudaHostAlloc/
cudaMalloc in pointer->bytes maps with running totals. Under XLA we do not
own allocations, so the equivalent is: device memory_stats (bytes_in_use,
peak_bytes_in_use) + live-array accounting via jax.live_arrays().
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax


class MemoryMonitor:
    """Singleton matching the reference's instance() pattern
    (MemoryMonitor.h:12)."""

    _instance: Optional["MemoryMonitor"] = None

    @classmethod
    def instance(cls) -> "MemoryMonitor":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    # ---- device side (gpuMalloc/printGpuMemory equivalents) ----

    def device_stats(self, device=None) -> Dict[str, int]:
        dev = device or jax.local_devices()[0]
        stats = dev.memory_stats() or {}
        return {
            "bytes_in_use": int(stats.get("bytes_in_use", 0)),
            "peak_bytes_in_use": int(stats.get("peak_bytes_in_use", 0)),
            "bytes_limit": int(stats.get("bytes_limit", 0)),
        }

    def live_device_bytes(self) -> int:
        """Sum of bytes of live jax arrays (this process)."""
        total = 0
        for a in jax.live_arrays():
            try:
                total += a.nbytes
            except Exception:
                pass
        return total

    def live_array_table(self, top: int = 20) -> List[Dict]:
        rows = []
        for a in jax.live_arrays():
            try:
                rows.append({"shape": tuple(a.shape), "dtype": str(a.dtype),
                             "nbytes": a.nbytes})
            except Exception:
                pass
        rows.sort(key=lambda r: -r["nbytes"])
        return rows[:top]

    # ---- reporters (printCpuMemory/printGpuMemory equivalents,
    #      MemoryMonitor.h:19-20) ----

    def print_device_memory(self) -> None:
        s = self.device_stats()
        live = self.live_device_bytes()
        print(f"[MemoryMonitor] device bytes_in_use={s['bytes_in_use']:,} "
              f"peak={s['peak_bytes_in_use']:,} limit={s['bytes_limit']:,} "
              f"live_arrays={live:,}")

    def print_host_memory(self) -> None:
        import resource
        peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        print(f"[MemoryMonitor] host peak_rss={peak_kb * 1024:,} bytes")

    def report(self) -> Dict:
        return {"device": self.device_stats(),
                "live_device_bytes": self.live_device_bytes()}
