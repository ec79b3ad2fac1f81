"""Capacity-drop telemetry: visible counters for every silent truncation.

The TPU build pads everything to STATIC capacities; inputs that exceed a cap
are subsampled, folded or dropped (collate / voxelize / gridpack builders).
Statistically harmless when caps are sized right — silently corrupting when
they aren't (VERDICT r3 weak #7: "a mis-sized config would corrupt training
with zero log output"). Every truncation site increments a named counter
here; the train loop logs a WARN summary whenever an interval saw drops.

Thread-safe (loader workers increment concurrently). Counters:

  points_dropped       collate: scene points beyond cfg.max_points subsampled
  gts_dropped          collate: GT boxes beyond cfg.max_gts truncated
  superpoints_folded   collate: points whose superpoint id >= max_superpoints
                       folded into slot S-1
  instances_dropped    collate: instance-mask points whose id >= max_gts
  voxels_dropped       gridpack: valid points whose level-0 voxel overflowed
                       voxel_capacity
  coarse_voxels_dropped gridpack: level>=1 voxels whose parent overflowed the
                       next level's capacity
"""
from __future__ import annotations

import threading
from collections import defaultdict


class DropCounters:
    def __init__(self):
        self._lock = threading.Lock()
        self._counts: dict = defaultdict(int)

    def add(self, name: str, n: int) -> None:
        if n <= 0:
            return
        with self._lock:
            self._counts[name] += int(n)

    def snapshot(self, reset: bool = False) -> dict:
        """Current nonzero counters; optionally reset (per-log-interval)."""
        with self._lock:
            out = {k: v for k, v in self._counts.items() if v}
            if reset:
                self._counts.clear()
        return out

    def reset(self) -> None:
        with self._lock:
            self._counts.clear()

    def format(self, counts: dict | None = None) -> str:
        c = self.snapshot() if counts is None else counts
        return " ".join(f"{k}={v}" for k, v in sorted(c.items()))


# Process-global instance: loader worker threads and the train loop share it.
DROPS = DropCounters()
