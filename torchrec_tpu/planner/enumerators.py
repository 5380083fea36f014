"""EmbeddingEnumerator: table x sharding-type x kernel candidate generation.

Capability parity with torchrec/distributed/planner/enumerators.py:80 —
produces every feasible ShardingOption for each table, honoring
ParameterConstraints, with shard row/col geometry computed up front.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from torchrec_tpu.distributed.sharding_plan import row_shard_bounds
from torchrec_tpu.modules.embedding_configs import BaseEmbeddingConfig
from torchrec_tpu.planner import constants
from torchrec_tpu.planner.types import (
    ParameterConstraints,
    PlannerShard,
    ShardingOption,
    Topology,
)
from torchrec_tpu.types import ComputeKernel, ShardingType

__all__ = ["EmbeddingEnumerator"]

_DEFAULT_TYPES = [
    ShardingType.DATA_PARALLEL,
    ShardingType.TABLE_WISE,
    ShardingType.ROW_WISE,
    ShardingType.COLUMN_WISE,
    ShardingType.TABLE_ROW_WISE,
    ShardingType.GRID_SHARD,
]
_DEFAULT_KERNELS = [ComputeKernel.FUSED]


class EmbeddingEnumerator:
    """Cross-product of sharding types x kernels per table honoring constraints (reference planner/enumerators.py:80)."""

    def __init__(
        self,
        topology: Topology,
        constraints: Optional[Dict[str, ParameterConstraints]] = None,
        sharding_types: Optional[List[ShardingType]] = None,
        compute_kernels: Optional[List[ComputeKernel]] = None,
    ):
        self._topology = topology
        self._constraints = constraints or {}
        self._sharding_types = sharding_types or _DEFAULT_TYPES
        self._kernels = compute_kernels or _DEFAULT_KERNELS

    def enumerate(
        self, tables: Sequence[BaseEmbeddingConfig]
    ) -> List[ShardingOption]:
        options: List[ShardingOption] = []
        for t in tables:
            c = self._constraints.get(t.name, ParameterConstraints())
            types = c.sharding_types or self._sharding_types
            kernels = c.compute_kernels or self._kernels
            for st in types:
                shards = self._shards_for(t, st, c)
                if shards is None:
                    continue
                # DP forces the DENSE kernel — emit it ONCE, not one
                # identical clone per entry in the kernel list (clones
                # burn proposer flip/grid budget for zero new plans)
                if st == ShardingType.DATA_PARALLEL:
                    kernels_st = [ComputeKernel.DENSE]
                else:
                    kernels_st = kernels
                for k in kernels_st:
                    options.append(
                        ShardingOption(
                            table=t,
                            sharding_type=st,
                            compute_kernel=k,
                            shards=[
                                PlannerShard(*geom) for geom in shards
                            ],
                            pooling_factor=c.pooling_factor(),
                            is_weighted=c.is_weighted,
                            cache_load_factor=(
                                c.cache_load_factor if k.uses_cache() else None
                            ),
                            cache_stats=(
                                c.cache_stats if k.uses_cache() else None
                            ),
                        )
                    )
        if not options:
            raise ValueError("no feasible sharding options")
        return options

    def _shards_for(self, t, st, c):
        """Shard geometries [(row_start, rows, col_start, cols)] or None."""
        w = self._topology.world_size
        local = self._topology.local_world_size
        rows, dim = t.num_embeddings, t.embedding_dim
        if st in (ShardingType.DATA_PARALLEL, ShardingType.TABLE_WISE):
            return [(0, rows, 0, dim)]
        if st == ShardingType.ROW_WISE:
            if rows < w:
                return None
            b = row_shard_bounds(rows, w)
            return [
                (b[i], b[i + 1] - b[i], 0, dim)
                for i in range(w)
                if b[i + 1] > b[i]
            ]
        if st == ShardingType.TABLE_ROW_WISE:
            if self._topology.num_hosts < 2 or rows < local:
                return None
            b = row_shard_bounds(rows, local)
            return [
                (b[i], b[i + 1] - b[i], 0, dim)
                for i in range(local)
                if b[i + 1] > b[i]
            ]
        if st in (ShardingType.COLUMN_WISE, ShardingType.TABLE_COLUMN_WISE):
            min_dim = c.min_partition or constants.MIN_CW_DIM
            n_blocks = min(dim // min_dim, w)
            if n_blocks < 2 or dim % n_blocks:
                return None
            width = dim // n_blocks
            return [(0, rows, b * width, width) for b in range(n_blocks)]
        if st == ShardingType.GRID_SHARD:
            n_hosts = self._topology.num_hosts
            if n_hosts < 2:
                return None
            min_dim = c.min_partition or constants.MIN_CW_DIM
            n_blocks = min(dim // min_dim, n_hosts)
            if n_blocks < 2 or dim % n_blocks or rows < local:
                return None
            width = dim // n_blocks
            b = row_shard_bounds(rows, local)
            return [
                (b[i], b[i + 1] - b[i], blk * width, width)
                for blk in range(n_blocks)
                for i in range(local)
                if b[i + 1] > b[i]
            ]
        return None
