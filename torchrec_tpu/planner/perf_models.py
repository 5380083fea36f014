"""Plan rating models (reference torchrec/distributed/planner/perf_models.py:
NoopPerfModel:21 — rate = max per-rank perf; NoopStorageModel:40 — rate =
max per-rank HBM)."""

from __future__ import annotations

from typing import List, Sequence

from torchrec_tpu.planner.partitioners import _per_rank
from torchrec_tpu.planner.types import ShardingOption, Topology

__all__ = ["NoopPerfModel", "NoopStorageModel"]


class NoopPerfModel:
    """Plan rating = max per-device perf (reference planner/perf_models.py:21)."""

    def __init__(self, topology: Topology):
        self._t = topology

    def rate(self, plan: Sequence[ShardingOption]) -> float:
        perf, _ = _per_rank(plan, self._t)
        return max(perf) if perf else float("inf")


class NoopStorageModel:
    """Plan rating = max per-device HBM (reference planner/perf_models.py:40)."""

    def __init__(self, topology: Topology):
        self._t = topology

    def rate(self, plan: Sequence[ShardingOption]) -> float:
        _, hbm = _per_rank(plan, self._t)
        return float(max(hbm)) if hbm else float("inf")
