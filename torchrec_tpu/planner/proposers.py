"""Proposers: generate candidate plans (one ShardingOption per table).

Capability parity with torchrec/distributed/planner/proposers.py
(GreedyProposer:34, UniformProposer:137, GridSearchProposer:207,
DynamicProgrammingProposer:287).
"""

from __future__ import annotations

import itertools
from typing import Dict, Iterator, List, Optional, Sequence

from torchrec_tpu.planner.types import ShardingOption, Topology

__all__ = [
    "GreedyProposer",
    "UniformProposer",
    "GridSearchProposer",
    "DynamicProgrammingProposer",
]


def _group(options: Sequence[ShardingOption]) -> Dict[str, List[ShardingOption]]:
    by_table: Dict[str, List[ShardingOption]] = {}
    for o in options:
        by_table.setdefault(o.name, []).append(o)
    return by_table


class GreedyProposer:
    """First proposal: per-table best (lowest perf) option; then iteratively
    flip the currently-worst table to its next-best alternative
    (reference GreedyProposer:34)."""

    def __init__(self, max_proposals: int = 50):
        self._max = max_proposals

    def propose(
        self, options: Sequence[ShardingOption]
    ) -> Iterator[List[ShardingOption]]:
        # order by CRITICAL-PATH (max per-shard) perf: shards run on
        # different ranks in parallel (see ShardingOption.critical_perf)
        by_table = {
            name: sorted(opts, key=lambda o: o.critical_perf)
            for name, opts in _group(options).items()
        }
        idx = {name: 0 for name in by_table}
        for _ in range(self._max):
            proposal = [by_table[n][idx[n]] for n in by_table]
            yield proposal
            # advance the table whose current choice has the worst perf and
            # still has alternatives
            candidates = [
                n for n in by_table if idx[n] + 1 < len(by_table[n])
            ]
            if not candidates:
                return
            worst = max(
                candidates, key=lambda n: by_table[n][idx[n]].critical_perf
            )
            idx[worst] += 1


class UniformProposer:
    """All tables use the same sharding type (reference UniformProposer:137)."""

    def propose(
        self, options: Sequence[ShardingOption]
    ) -> Iterator[List[ShardingOption]]:
        by_table = _group(options)
        types = sorted(
            {o.sharding_type for o in options}, key=lambda t: t.value
        )
        for st in types:
            proposal = []
            ok = True
            for name, opts in by_table.items():
                match = [o for o in opts if o.sharding_type == st]
                if not match:
                    ok = False
                    break
                proposal.append(
                    min(match, key=lambda o: o.critical_perf)
                )
            if ok:
                yield proposal


class GridSearchProposer:
    """Full cross product, capped (reference GridSearchProposer:207)."""

    def __init__(self, max_proposals: int = 10000):
        self._max = max_proposals

    def propose(
        self, options: Sequence[ShardingOption]
    ) -> Iterator[List[ShardingOption]]:
        by_table = _group(options)
        names = list(by_table)
        count = 0
        for combo in itertools.product(*(by_table[n] for n in names)):
            yield list(combo)
            count += 1
            if count >= self._max:
                return


class DynamicProgrammingProposer:
    """HBM-budgeted DP over (table, hbm-bucket) -> min total perf
    (reference DynamicProgrammingProposer:287). Buckets global HBM into
    ``num_buckets`` levels and picks, per budget level, the perf-optimal
    per-table choices; yields proposals from tightest feasible budget up."""

    def __init__(self, topology: Topology, num_buckets: int = 20):
        self._budget = topology.hbm_cap * topology.world_size
        self._buckets = num_buckets

    def propose(
        self, options: Sequence[ShardingOption]
    ) -> Iterator[List[ShardingOption]]:
        by_table = _group(options)
        names = list(by_table)
        unit = max(self._budget // self._buckets, 1)
        nb = self._buckets
        # dp[b] = (perf, choices): best total perf using <= b budget units
        dp = [(0.0, []) if i == 0 else (float("inf"), None) for i in range(nb + 1)]
        for name in names:
            ndp = [(float("inf"), None)] * (nb + 1)
            for o in by_table[name]:
                cost = min((o.total_storage.hbm + unit - 1) // unit, nb)
                # additive proxy for the plan's critical path: per-table
                # parallel cost (see ShardingOption.critical_perf)
                perf = o.critical_perf
                for b in range(nb + 1 - cost):
                    if dp[b][1] is None:
                        continue
                    tb = b + cost
                    cand = dp[b][0] + perf
                    if cand < ndp[tb][0]:
                        ndp[tb] = (cand, dp[b][1] + [o])
            # prefix-min so a bigger budget is never worse
            best = (float("inf"), None)
            for b in range(nb + 1):
                if ndp[b][0] < best[0]:
                    best = ndp[b]
                ndp[b] = best
            dp = ndp
        seen = set()
        for b in range(nb + 1):
            perf, choices = dp[b]
            if choices is None or len(choices) != len(names):
                continue
            key = tuple(id(o) for o in choices)
            if key in seen:
                continue
            seen.add(key)
            yield list(choices)


class EmbeddingOffloadScaleupProposer:
    """Scale host-offloaded tables' HBM caches into leftover device memory
    (reference proposers.py:471 EmbeddingOffloadScaleupProposer, driven by
    EmbeddingOffloadStats cacheability).

    Takes the greedy base proposal; for every option with the
    FUSED_HOST_OFFLOAD kernel, yields variants with progressively larger
    cache load factors — the partitioner rejects the ones that no longer
    fit and the perf model picks the best survivor (bigger caches = fewer
    host fetches = better perf estimate)."""

    def __init__(self, scales=(None, 0.4, 0.6, 0.8)):
        self._scales = scales
        self._base = GreedyProposer(max_proposals=1)

    @staticmethod
    def _allocate(offloaded, scale: float) -> list:
        """Per-table clf for a given average budget ``scale``.

        Without MRC stats every table gets ``scale`` (the uniform-traffic
        model has constant marginal gain, so equal split is optimal). With
        stats, the shared row budget is assigned greedily to the table with
        the best marginal miss-reduction per cached byte (the reference's
        cacheability-driven Banner allocation, proposers.py:471) — zipf
        tables saturate early and surrender budget to flatter tables.
        """
        import numpy as np

        stats = [o.cache_stats for o in offloaded]
        if any(s is None for s in stats):
            return [scale] * len(offloaded)
        rows = [o.table.num_embeddings for o in offloaded]
        dims = [o.table.embedding_dim for o in offloaded]
        budget = scale * sum(r * d for r, d in zip(rows, dims))  # weighted
        # allocation increment per table = ONE MRC histogram bin: the miss
        # curve is a step function over its bins, so finer increments see
        # zero marginal gain between edges and the greedy degenerates to
        # index order
        inc = [1.0 / len(s.mrc_hist_counts) for s in stats]
        alloc = [0.0] * len(offloaded)  # clf per table
        spent = 0.0
        heap = []
        import heapq

        def marginal(i, clf):
            lo = stats[i].expected_miss_rate(clf)
            hi = stats[i].expected_miss_rate(min(clf + inc[i], 1.0))
            gained = (lo - hi) * stats[i].expected_lookups
            bytes_added = rows[i] * dims[i] * inc[i]
            return gained / max(bytes_added, 1.0)

        for i in range(len(offloaded)):
            heapq.heappush(heap, (-marginal(i, 0.0), i))
        while heap and spent < budget:
            neg, i = heapq.heappop(heap)
            if neg >= 0.0 or alloc[i] >= 1.0:
                break  # no table has any remaining marginal gain
            alloc[i] = min(alloc[i] + inc[i], 1.0)
            spent += rows[i] * dims[i] * inc[i]
            if alloc[i] < 1.0:
                heapq.heappush(heap, (-marginal(i, alloc[i]), i))
        # floor: never propose a zero cache for an offloaded table
        return [max(alloc[i], inc[i]) for i in range(len(offloaded))]

    def propose(self, options: Sequence[ShardingOption]):
        for base in self._base.propose(options):
            offloaded = [
                i for i, o in enumerate(base)
                if o.compute_kernel.value == "fused_host_offload"
            ]
            if not offloaded:
                yield base
                return
            for scale in self._scales:
                prop = [o.clone() for o in base]
                if scale is not None:
                    clfs = self._allocate(
                        [base[i] for i in offloaded], scale
                    )
                    for i, clf in zip(offloaded, clfs):
                        prop[i].cache_load_factor = clf
                        for sh in prop[i].shards:
                            # mark dirty: the planner re-estimates options
                            # whose shards lost their cost annotations
                            sh.perf = None
                            sh.storage = None
                yield prop
