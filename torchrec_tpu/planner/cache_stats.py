"""Cache statistics for offloaded/virtual tables: LRU miss-ratio curves.

Reference parity: CacheStatistics / EmbeddingOffloadStats
(torchrec/distributed/planner/types.py CacheParams.stats,
shard_estimators.py:964) — the reference consumes an externally measured
miss-ratio-curve (MRC) histogram; the planner prices host-offload kernels
with ``expected_miss_rate(clf)`` instead of assuming hit-rate == resident
fraction (uniform traffic), which badly over-prices skewed (zipf)
production traffic where a small cache absorbs most lookups.

This module additionally provides :meth:`EmbeddingOffloadStats.from_id_trace`
— an exact LRU stack-distance pass (Mattson et al.; Fenwick-tree counting,
O(N log N)) that builds the MRC histogram directly from a sample id trace,
so TPU users can derive stats from a few training batches instead of a
production telemetry pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

__all__ = ["EmbeddingOffloadStats", "lru_stack_distances"]


def lru_stack_distances(ids: np.ndarray) -> np.ndarray:
    """Exact LRU stack distance per access: the number of DISTINCT ids
    touched since this id's previous access (np.inf for cold misses).
    An LRU cache of capacity >= distance + 1 serves the access as a hit."""
    ids = np.asarray(ids).reshape(-1)
    n = len(ids)
    out = np.full(n, np.inf)
    bit = np.zeros(n + 1, np.int64)  # Fenwick over positions: 1 = live last-access

    def add(i: int, v: int) -> None:
        i += 1
        while i <= n:
            bit[i] += v
            i += i & (-i)

    def prefix(i: int) -> int:  # sum of [0, i] inclusive
        i += 1
        s = 0
        while i > 0:
            s += bit[i]
            i -= i & (-i)
        return s

    last = {}
    for pos in range(n):
        x = ids[pos].item() if hasattr(ids[pos], "item") else ids[pos]
        lp = last.get(x)
        if lp is not None:
            # distinct ids between the two accesses = live markers in (lp, pos)
            out[pos] = prefix(pos - 1) - prefix(lp)
            add(lp, -1)
        add(pos, 1)
        last[x] = pos
    return out


@dataclasses.dataclass
class EmbeddingOffloadStats:
    """MRC-histogram cache statistics (reference shard_estimators.py:964).

    ``mrc_hist_counts[k]``: number of re-reference accesses whose LRU stack
    distance falls in bin k of ``linspace(0, height, n_bins + 1)`` — i.e.
    accesses served without a miss once the cache holds at least that many
    rows. Cold (first-touch) misses are excluded, matching the reference.

    ``cacheability`` here is 1 - AUC(miss-ratio curve): 1.0 = tiny cache
    captures everything, 0.0 = uniform traffic (hit-rate == clf). (The
    reference stores the raw AUC; the complement is the intuitive
    orientation and is what the scaleup proposer sorts by.)
    """

    cacheability: float
    expected_lookups: float  # expected UNIQUE ids per global batch
    mrc_hist_counts: np.ndarray
    height: int

    def __post_init__(self):
        h = np.asarray(self.mrc_hist_counts, np.float64).reshape(-1)
        if h.size == 0:
            raise ValueError("expected non-empty mrc histogram")
        self.mrc_hist_counts = h
        self.bins = np.linspace(0, self.height, len(h) + 1)

    @staticmethod
    def estimate_cache_miss_rate(
        cache_sizes: np.ndarray, hist: np.ndarray, bins: np.ndarray
    ) -> np.ndarray:
        """Miss ratio of re-reference traffic at each cache size (rows)."""
        cache_sizes = np.asarray(cache_sizes, np.float64)
        hist = np.asarray(hist, np.float64)
        ys = np.cumsum(hist)
        if ys[-1] == 0:
            return np.zeros_like(cache_sizes, np.float32)
        ys = 1.0 - ys / ys[-1]  # miss ratio above each bin's cache size
        # a cache of k rows hits all stack distances <= k - 1
        idx = np.searchsorted(bins, cache_sizes - 1, side="right")
        ys = np.concatenate([ys, [0.0, 1.0]])  # right/left sentinels
        return ys[idx - 1].astype(np.float32)

    def expected_miss_rate(self, clf: float) -> float:
        """Miss ratio of the re-reference traffic with a cache of
        ``clf * height`` rows."""
        return float(
            self.estimate_cache_miss_rate(
                np.asarray([clf * self.height]), self.mrc_hist_counts,
                self.bins,
            )[0]
        )

    @classmethod
    def from_id_trace(
        cls,
        ids: Sequence[int],
        height: int,
        num_bins: int = 25,
        batches: int = 1,
    ) -> "EmbeddingOffloadStats":
        """Build stats from a sampled id trace (a few training batches
        concatenated). ``batches``: how many global batches the trace
        spans, for the expected-unique-lookups-per-batch estimate."""
        ids = np.asarray(ids).reshape(-1)
        dist = lru_stack_distances(ids)
        warm = dist[np.isfinite(dist)]
        hist, _ = np.histogram(
            np.minimum(warm + 1, height), bins=np.linspace(0, height, num_bins + 1)
        )
        # AUC of the miss-ratio curve over clf in [0, 1]
        grid = np.linspace(0, height, 101)
        bins = np.linspace(0, height, num_bins + 1)
        auc = float(
            np.mean(cls.estimate_cache_miss_rate(grid, hist, bins))
        )
        return cls(
            cacheability=1.0 - auc,
            expected_lookups=float(len(np.unique(ids))) / max(batches, 1),
            mrc_hist_counts=hist,
            height=height,
        )


def miss_fraction(
    stats: Optional[EmbeddingOffloadStats], clf: float
) -> float:
    """The planner's miss model: MRC-driven when stats are available,
    uniform-traffic (1 - clf) otherwise."""
    if stats is not None:
        return stats.expected_miss_rate(clf)
    return 1.0 - clf
