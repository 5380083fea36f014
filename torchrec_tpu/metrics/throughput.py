"""ThroughputMetric: examples/sec from wall time.

Capability parity with torchrec/metrics/throughput.py:35 (warmup offset +
sliding window). Host-side (wall clock can't live in jit).
"""

from __future__ import annotations

import collections
import time
from typing import Deque, Dict, Optional, Tuple

__all__ = ["ThroughputMetric"]


class ThroughputMetric:
    """Examples/sec from host wall time with warmup offset (reference metrics/throughput.py:35)."""

    def __init__(
        self,
        batch_size: int,
        world_size: int = 1,
        warmup_steps: int = 10,
        window_seconds: float = 60.0,
    ):
        self._batch_size = batch_size
        self._world_size = world_size
        self._warmup_steps = warmup_steps
        self._window_seconds = window_seconds
        self._steps = 0
        self._warmup_time: Optional[float] = None
        self._window: Deque[Tuple[float, int]] = collections.deque()

    def update(self) -> None:
        now = time.monotonic()
        self._steps += 1
        if self._steps == self._warmup_steps:
            self._warmup_time = now
            self._steps_at_warmup = self._steps
        self._window.append((now, self._batch_size * self._world_size))
        cutoff = now - self._window_seconds
        while self._window and self._window[0][0] < cutoff:
            self._window.popleft()

    def compute(self) -> Dict[str, float]:
        out: Dict[str, float] = {"throughput|total_examples": float(
            self._steps * self._batch_size * self._world_size
        )}
        if self._warmup_time is not None and self._steps > self._warmup_steps:
            elapsed = time.monotonic() - self._warmup_time
            examples = (
                (self._steps - self._warmup_steps)
                * self._batch_size
                * self._world_size
            )
            out["throughput|lifetime_examples_per_sec"] = examples / max(
                elapsed, 1e-9
            )
        if len(self._window) >= 2:
            span = self._window[-1][0] - self._window[0][0]
            examples = sum(n for _, n in list(self._window)[1:])
            out["throughput|window_examples_per_sec"] = examples / max(
                span, 1e-9
            )
        return out
