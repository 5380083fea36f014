"""Streaming percentile tracking for host-side latencies/counters.

Capability parity with the reference's utils/percentile_logger.py (rolling
latency percentiles logged every N observations). Implemented with the P²
algorithm (Jain & Chlamtac '85): O(1) memory per tracked quantile, no
sample buffer — right for long-running trainers and serving loops.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Sequence

logger = logging.getLogger(__name__)

__all__ = ["P2Quantile", "PercentileLogger"]


class P2Quantile:
    """Single-quantile P² estimator (5 markers, O(1) updates)."""

    def __init__(self, q: float):
        if not 0.0 < q < 1.0:
            raise ValueError(f"quantile must be in (0, 1), got {q}")
        self.q = q
        self._n = 0
        self._heights: List[float] = []
        self._pos = [1, 2, 3, 4, 5]
        self._want = [1.0, 1 + 2 * q, 1 + 4 * q, 3 + 2 * q, 5.0]
        self._dwant = [0.0, q / 2, q, (1 + q) / 2, 1.0]

    def update(self, x: float) -> None:
        self._n += 1
        if len(self._heights) < 5:
            self._heights.append(float(x))
            self._heights.sort()
            return
        h, pos = self._heights, self._pos
        if x < h[0]:
            h[0] = float(x)
            k = 0
        elif x >= h[4]:
            h[4] = float(x)
            k = 3
        else:
            k = next(i for i in range(4) if h[i] <= x < h[i + 1])
        for i in range(k + 1, 5):
            pos[i] += 1
        for i in range(5):
            self._want[i] += self._dwant[i]
        # adjust the three middle markers with the parabolic formula
        for i in (1, 2, 3):
            d = self._want[i] - pos[i]
            if (d >= 1 and pos[i + 1] - pos[i] > 1) or (
                d <= -1 and pos[i - 1] - pos[i] < -1
            ):
                s = 1 if d >= 0 else -1
                hp = h[i] + s / (pos[i + 1] - pos[i - 1]) * (
                    (pos[i] - pos[i - 1] + s)
                    * (h[i + 1] - h[i]) / (pos[i + 1] - pos[i])
                    + (pos[i + 1] - pos[i] - s)
                    * (h[i] - h[i - 1]) / (pos[i] - pos[i - 1])
                )
                if not h[i - 1] < hp < h[i + 1]:  # fall back to linear
                    hp = h[i] + s * (h[i + s] - h[i]) / (pos[i + s] - pos[i])
                h[i] = hp
                pos[i] += s

    @property
    def value(self) -> float:
        if not self._heights:
            return float("nan")
        if len(self._heights) < 5 or self._n < 5:
            k = max(0, min(len(self._heights) - 1,
                           int(self.q * len(self._heights))))
            return sorted(self._heights)[k]
        return self._heights[2]

    @property
    def count(self) -> int:
        return self._n


class PercentileLogger:
    """Track several quantiles of a named series; log every ``log_every``."""

    def __init__(
        self,
        name: str,
        quantiles: Sequence[float] = (0.5, 0.9, 0.99),
        log_every: int = 1000,
    ):
        self.name = name
        self._qs = {q: P2Quantile(q) for q in quantiles}
        self._every = log_every
        self._n = 0

    def add(self, x: float) -> None:
        self._n += 1
        for est in self._qs.values():
            est.update(x)
        if self._every and self._n % self._every == 0:
            logger.info("%s: %s", self.name, self.snapshot())

    def snapshot(self) -> Dict[str, float]:
        return {f"p{int(q * 100)}": est.value for q, est in self._qs.items()}
