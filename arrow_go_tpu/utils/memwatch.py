"""Device-memory leak watcher — the HBM analog of the reference's
CheckedAllocator.AssertSize leak detector (arrow/memory/
checked_allocator.go:33-154).

On TPU, buffer lifetime is jax-managed, so the reference's per-allocation
call-site ledger inverts into *watermark accounting*: snapshot the
device's live-bytes counter, run a workload, force a GC + fence, and
assert the counter returned to its baseline. Catches Python-side
reference cycles that pin device buffers and accidental cache growth
(the TPU equivalents of Retain-without-Release).
"""
from __future__ import annotations

import gc
from typing import Optional


def device_live_bytes(device=None) -> Optional[int]:
    """Live HBM bytes on `device` (default: first device), or None when the
    backend does not expose memory stats (CPU test meshes)."""
    import jax
    d = device or jax.local_devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if not stats:
        return None
    return stats.get("bytes_in_use")


class DeviceMemoryWatcher:
    """Context manager asserting a workload leaks no device memory.

    ``tolerance`` allows persistent growth for legitimately cached state
    (compiled executables' scratch, donated-buffer slack)::

        with DeviceMemoryWatcher(tolerance=1 << 20):
            run_query(...)
    """

    def __init__(self, device=None, tolerance: int = 1 << 20):
        self.device = device
        self.tolerance = tolerance
        self.start: Optional[int] = None
        self.end: Optional[int] = None

    def _settle(self) -> Optional[int]:
        import jax
        gc.collect()
        # fence: drain any in-flight executions before sampling the counter
        try:
            jax.effects_barrier()
        except Exception:
            pass
        return device_live_bytes(self.device)

    def __enter__(self):
        self.start = self._settle()
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is not None:
            return False
        self.end = self._settle()
        if self.start is None or self.end is None:
            return False  # backend without stats: nothing to assert
        growth = self.end - self.start
        if growth > self.tolerance:
            raise AssertionError(
                f"device memory leak: {growth} bytes still live after "
                f"workload (start={self.start}, end={self.end}, "
                f"tolerance={self.tolerance})")
        return False

    @property
    def growth(self) -> Optional[int]:
        if self.start is None or self.end is None:
            return None
        return self.end - self.start
