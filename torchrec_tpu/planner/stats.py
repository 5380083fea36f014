"""Planner statistics reporting — the per-rank HBM/perf table.

Capability parity with torchrec/distributed/planner/stats.py
(EmbeddingStats:150, the '--- Planner Statistics ---' table).
"""

from __future__ import annotations

from typing import List, Sequence

from torchrec_tpu.planner.partitioners import _per_rank
from torchrec_tpu.planner.types import ShardingOption, Topology

__all__ = ["EmbeddingStats"]

_ABBR = {
    "data_parallel": "DP",
    "table_wise": "TW",
    "row_wise": "RW",
    "column_wise": "CW",
    "table_row_wise": "TWRW",
    "table_column_wise": "TWCW",
    "grid_shard": "GRID",
}


class EmbeddingStats:
    """The per-device HBM/perf table + per-table placement log (reference planner/stats.py:150)."""

    def render(
        self, plan: Sequence[ShardingOption], topology: Topology
    ) -> str:
        perf, hbm = _per_rank(plan, topology)
        lines = ["--- Planner Statistics ---"]
        lines.append(
            f"world_size={topology.world_size} "
            f"generation={topology.generation} "
            f"hbm_cap={topology.hbm_cap / 2**30:.1f}GiB"
        )
        lines.append(f"{'rank':>4} {'HBM (GiB)':>10} {'perf (ms)':>10}")
        for r in range(topology.world_size):
            lines.append(
                f"{r:>4} {hbm[r] / 2**30:>10.3f} {perf[r] * 1e3:>10.3f}"
            )
        lines.append(
            f"max rank perf: {max(perf) * 1e3:.3f} ms   "
            f"max rank HBM: {max(hbm) / 2**30:.3f} GiB"
        )
        lines.append(f"{'table':<20} {'type':>5} {'kernel':>18} {'ranks'}")
        for o in sorted(plan, key=lambda o: o.name):
            ranks = sorted({s.rank for s in o.shards})
            rank_str = (
                "all"
                if ranks == [-1] or len(ranks) == topology.world_size
                else ",".join(map(str, ranks))
            )
            lines.append(
                f"{o.name:<20} {_ABBR[o.sharding_type.value]:>5} "
                f"{o.compute_kernel.value:>18} {rank_str}"
            )
        return "\n".join(lines)

    def log(self, plan, topology) -> None:
        print(self.render(plan, topology))
