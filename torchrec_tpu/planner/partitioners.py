"""Partitioners: assign candidate shards to device ranks.

Capability parity with torchrec/distributed/planner/partitioners.py
(GreedyPerfPartitioner:176 — device bin-packing by perf with host-level
grouping for TWRW/GRID; MemoryBalancedPartitioner:694 — binary-search the
perf slack to trade perf for balanced HBM).
"""

from __future__ import annotations

import copy
import dataclasses
import heapq
from typing import Dict, List, Optional, Sequence

from torchrec_tpu.planner.types import (
    Perf,
    PlannerError,
    ShardingOption,
    Storage,
    Topology,
)
from torchrec_tpu.types import ShardingType

__all__ = ["GreedyPerfPartitioner", "MemoryBalancedPartitioner"]


@dataclasses.dataclass
class _Device:
    rank: int
    perf: float = 0.0
    hbm_used: int = 0
    ddr_used: int = 0

    def fits(self, storage: Storage, hbm_cap: int, ddr_cap: int) -> bool:
        return (
            self.hbm_used + storage.hbm <= hbm_cap
            and self.ddr_used + storage.ddr <= ddr_cap
        )


class GreedyPerfPartitioner:
    """Place the heaviest single-device shards on the least-loaded device
    that fits; fixed-fanout shardings (RW/CW multi-shard) place in order."""

    def partition(
        self,
        options: Sequence[ShardingOption],
        topology: Topology,
        hbm_reserve: float = 0.0,
    ) -> List[ShardingOption]:
        w = topology.world_size
        local = topology.local_world_size
        hbm_cap = int(topology.hbm_cap * (1.0 - hbm_reserve))
        devices = [_Device(r) for r in range(w)]
        out = [o.clone() for o in options]

        # multi-shard options first (their placement is forced), then
        # single-shard options by descending perf (classic LPT bin packing)
        fixed, free = [], []
        for o in out:
            st = o.sharding_type
            if st in (
                ShardingType.ROW_WISE,
                ShardingType.TABLE_ROW_WISE,
                ShardingType.GRID_SHARD,
                ShardingType.DATA_PARALLEL,
            ):
                fixed.append(o)
            else:
                free.append(o)

        for o in fixed:
            st = o.sharding_type
            if st == ShardingType.DATA_PARALLEL:
                for s in o.shards:
                    s.rank = -1
                    for d in devices:  # replicated cost on every device
                        self._charge(d, s, hbm_cap, topology)
                continue
            if st == ShardingType.ROW_WISE:
                ranks = list(range(w))
            else:  # TWRW/GRID: pick the least-loaded host per row group
                n_hosts = topology.num_hosts
                host_loads = [
                    sum(d.perf for d in devices[h * local : (h + 1) * local])
                    for h in range(n_hosts)
                ]
                # row groups of up to `local` shards each (the enumerator
                # drops empty tail shards, so the LAST group may be partial
                # — a host whose first ranks take the shards)
                n_groups = -(-len(o.shards) // local)
                order = sorted(range(n_hosts), key=lambda h: host_loads[h])
                ranks = []
                for g in range(n_groups):
                    h = order[g % n_hosts]
                    ranks.extend(range(h * local, (h + 1) * local))
            if len(ranks) < len(o.shards):
                raise PlannerError(
                    f"{o.name}: {len(o.shards)} shards > {len(ranks)} ranks"
                )
            for s, r in zip(o.shards, ranks):
                s.rank = r
                self._charge(devices[r], s, hbm_cap, topology)

        free.sort(key=lambda o: o.total_perf, reverse=True)
        for o in free:
            for s in sorted(
                o.shards, key=lambda s: s.perf.total if s.perf else 0.0,
                reverse=True,
            ):
                candidates = sorted(devices, key=lambda d: (d.perf, d.rank))
                placed = False
                for d in candidates:
                    if s.storage is None or d.fits(
                        s.storage, hbm_cap, topology.ddr_cap
                    ):
                        s.rank = d.rank
                        self._charge(d, s, hbm_cap, topology)
                        placed = True
                        break
                if not placed:
                    raise PlannerError(
                        f"could not place shard of {o.name}: out of memory "
                        f"(hbm_cap={hbm_cap / 2**30:.2f} GiB)"
                    )
        return out

    @staticmethod
    def _charge(d: _Device, s, hbm_cap: int, topology: Topology) -> None:
        if s.storage is not None:
            if d.hbm_used + s.storage.hbm > hbm_cap:
                raise PlannerError(
                    f"rank {d.rank} over HBM budget "
                    f"({(d.hbm_used + s.storage.hbm) / 2**30:.2f} GiB > "
                    f"{hbm_cap / 2**30:.2f} GiB)"
                )
            d.hbm_used += s.storage.hbm
            d.ddr_used += s.storage.ddr
        if s.perf is not None:
            d.perf += s.perf.total


class MemoryBalancedPartitioner:
    """Binary-search a perf-slack multiplier: accept plans whose max-rank
    perf is within (1+slack) of greedy's, minimizing max-rank HBM
    (reference MemoryBalancedPartitioner:694)."""

    def __init__(self, max_search_iters: int = 8, tolerance: float = 0.02):
        self._iters = max_search_iters
        self._tol = tolerance
        self._greedy = GreedyPerfPartitioner()

    def partition(
        self,
        options: Sequence[ShardingOption],
        topology: Topology,
        hbm_reserve: float = 0.0,
    ) -> List[ShardingOption]:
        base = self._greedy.partition(options, topology, hbm_reserve)
        best = base
        best_hbm = _max_rank_hbm(base, topology)
        base_perf = _max_rank_perf(base, topology)
        lo_cap, hi_cap = 0, best_hbm
        for _ in range(self._iters):
            cap = (lo_cap + hi_cap) // 2
            if cap <= 0:
                break
            try:
                trial = self._greedy_with_cap(options, topology, cap, hbm_reserve)
            except PlannerError:
                lo_cap = cap + 1
                continue
            perf = _max_rank_perf(trial, topology)
            if perf <= base_perf * (1 + self._tol):
                best, best_hbm = trial, _max_rank_hbm(trial, topology)
                hi_cap = cap - 1
            else:
                lo_cap = cap + 1
        return best

    def _greedy_with_cap(self, options, topology, hbm_cap, hbm_reserve):
        t = copy.copy(topology)
        t.hbm_cap = int(hbm_cap / max(1.0 - hbm_reserve, 1e-6))
        return self._greedy.partition(options, t, hbm_reserve)


def _per_rank(options: Sequence[ShardingOption], topology: Topology):
    perf = [0.0] * topology.world_size
    hbm = [0] * topology.world_size
    for o in options:
        for s in o.shards:
            ranks = (
                range(topology.world_size) if s.rank == -1 else [s.rank]
            )
            for r in ranks:
                if s.perf:
                    perf[r] += s.perf.total
                if s.storage:
                    hbm[r] += s.storage.hbm
    return perf, hbm


def _max_rank_perf(options, topology) -> float:
    perf, _ = _per_rank(options, topology)
    return max(perf)


def _max_rank_hbm(options, topology) -> int:
    _, hbm = _per_rank(options, topology)
    return max(hbm)
