"""Manual sharding-plan construction helpers.

Capability parity with torchrec/distributed/sharding_plan.py
(table_wise/row_wise/column_wise/grid_shard/data_parallel generators at
:460-917 and calculate_shard_sizes_and_offsets:92).
"""

from __future__ import annotations

import math

import numpy as np
from typing import Dict, List, Optional, Sequence

from torchrec_tpu.distributed.types import (
    EmbeddingModuleShardingPlan,
    ParameterSharding,
    Shard,
    ShardingEnv,
)
from torchrec_tpu.modules.embedding_configs import BaseEmbeddingConfig
from torchrec_tpu.types import ComputeKernel, ShardingType

__all__ = [
    "table_wise",
    "row_wise",
    "column_wise",
    "table_row_wise",
    "grid_shard",
    "data_parallel",
    "construct_module_sharding_plan",
    "row_shard_bounds",
    "MIN_CW_DIM",
]

# minimum column-wise block width; 128 = one lane tile on TPU and the
# reference's planner constant (planner/constants.py:19 MIN_CW_DIM)
MIN_CW_DIM = 128


def row_shard_bounds(num_rows: int, num_shards: int) -> List[int]:
    """Even row split bounds [b_0=0, ..., b_n=num_rows] (block sizes round
    up like the reference's block_size computation so early shards are
    full)."""
    block = math.ceil(num_rows / num_shards)
    bounds = [min(i * block, num_rows) for i in range(num_shards + 1)]
    return bounds


def table_wise(rank: int) -> ParameterSharding:
    """Whole table on one rank (reference sharding_plan.py:table_wise)."""
    return ParameterSharding(
        sharding_type=ShardingType.TABLE_WISE, ranks=[rank]
    )


def row_wise(ranks: Optional[List[int]] = None) -> ParameterSharding:
    """Rows range-split over all (or given) ranks."""
    return ParameterSharding(sharding_type=ShardingType.ROW_WISE, ranks=ranks)


def column_wise(
    ranks: Optional[List[int]] = None, num_blocks: Optional[int] = None
) -> ParameterSharding:
    """Columns split into blocks placed table-wise on ``ranks``.

    ``num_blocks`` defaults to len(ranks)."""
    ps = ParameterSharding(sharding_type=ShardingType.COLUMN_WISE, ranks=ranks)
    if num_blocks is not None:
        ps.num_blocks = num_blocks  # type: ignore[attr-defined]
    return ps


def table_row_wise(host: int = 0) -> ParameterSharding:
    """Rows split within one host's ranks (reference twrw)."""
    ps = ParameterSharding(sharding_type=ShardingType.TABLE_ROW_WISE)
    ps.host = host  # type: ignore[attr-defined]
    return ps


def grid_shard(hosts: Optional[List[int]] = None) -> ParameterSharding:
    """CW x TWRW grid: column blocks across hosts, rows within each host."""
    ps = ParameterSharding(sharding_type=ShardingType.GRID_SHARD)
    ps.hosts = hosts  # type: ignore[attr-defined]
    return ps


def data_parallel() -> ParameterSharding:
    return ParameterSharding(
        sharding_type=ShardingType.DATA_PARALLEL,
        compute_kernel=ComputeKernel.DENSE,
    )


def _materialize_shards(
    table: BaseEmbeddingConfig, ps: ParameterSharding, env: ShardingEnv
) -> None:
    """Fill ps.shards from the sharding type + env (the reference's
    calculate_shard_sizes_and_offsets:92 equivalent)."""
    w = env.world_size
    rows, dim = table.num_embeddings, table.embedding_dim
    st = ps.sharding_type
    if st == ShardingType.DATA_PARALLEL:
        ps.shards = [Shard(0, rows, 0, dim, rank=-1)]
        return
    if st == ShardingType.TABLE_WISE:
        rank = (ps.ranks or [0])[0]
        ps.shards = [Shard(0, rows, 0, dim, rank=rank)]
        return
    if st == ShardingType.ROW_WISE:
        ranks = ps.ranks if ps.ranks else list(range(w))
        bounds = row_shard_bounds(rows, len(ranks))
        ps.shards = [
            Shard(bounds[i], bounds[i + 1] - bounds[i], 0, dim, rank=r)
            for i, r in enumerate(ranks)
            if bounds[i + 1] > bounds[i]
        ]
        return
    if st in (ShardingType.COLUMN_WISE, ShardingType.TABLE_COLUMN_WISE):
        ranks = ps.ranks if ps.ranks else list(range(w))
        n_blocks = getattr(ps, "num_blocks", None) or len(ranks)
        n_blocks = min(n_blocks, max(dim // MIN_CW_DIM, 1))
        if dim % n_blocks:
            raise ValueError(f"dim {dim} not divisible into {n_blocks} CW blocks")
        width = dim // n_blocks
        ps.shards = [
            Shard(0, rows, b * width, width, rank=ranks[b % len(ranks)])
            for b in range(n_blocks)
        ]
        return
    if st == ShardingType.TABLE_ROW_WISE:
        local = env.local_size or w
        host = getattr(ps, "host", 0)
        ranks = list(range(host * local, (host + 1) * local))
        bounds = row_shard_bounds(rows, len(ranks))
        ps.shards = [
            Shard(bounds[i], bounds[i + 1] - bounds[i], 0, dim, rank=r)
            for i, r in enumerate(ranks)
            if bounds[i + 1] > bounds[i]
        ]
        return
    if st == ShardingType.GRID_SHARD:
        local = env.local_size or w
        n_hosts = w // local
        hosts = getattr(ps, "hosts", None) or list(range(n_hosts))
        n_blocks = min(len(hosts), max(dim // MIN_CW_DIM, 1))
        if dim % n_blocks:
            raise ValueError(f"dim {dim} not divisible into {n_blocks} grid blocks")
        width = dim // n_blocks
        shards = []
        for b in range(n_blocks):
            host = hosts[b % len(hosts)]
            ranks = list(range(host * local, (host + 1) * local))
            bounds = row_shard_bounds(rows, len(ranks))
            for i, r in enumerate(ranks):
                if bounds[i + 1] > bounds[i]:
                    shards.append(
                        Shard(
                            bounds[i],
                            bounds[i + 1] - bounds[i],
                            b * width,
                            width,
                            rank=r,
                        )
                    )
        ps.shards = shards
        return
    raise NotImplementedError(f"sharding type {st}")


def construct_module_sharding_plan(
    tables: Sequence[BaseEmbeddingConfig],
    per_param_sharding: Dict[str, ParameterSharding],
    env: ShardingEnv,
) -> EmbeddingModuleShardingPlan:
    """Build a module plan from per-table specs (reference
    sharding_plan.py:construct_module_sharding_plan:460)."""
    plan = EmbeddingModuleShardingPlan()
    by_name = {t.name: t for t in tables}
    for name, ps in per_param_sharding.items():
        if name not in by_name:
            raise KeyError(f"unknown table {name!r}")
        _materialize_shards(by_name[name], ps, env)
        plan[name] = ps
    for name in by_name:
        if name not in plan:
            raise ValueError(f"table {name!r} missing from plan")
    return plan


def tower_sharding_plan(
    towers,
    env: ShardingEnv,
) -> EmbeddingModuleShardingPlan:
    """Place each tower's tables together on one rank (the reference's
    embedding_tower_sharding.py contract: a tower — embeddings + its
    interaction — shards as a UNIT so its interaction runs colocated with
    its lookups). Towers round-robin over ranks by descending size."""
    sizes = sorted(
        range(len(towers)),
        key=lambda i: -sum(
            t.num_embeddings * t.embedding_dim
            for t in towers[i].embedding._tables
        ),
    )
    load = [0] * env.world_size
    per_param = {}
    all_tables = []
    for ti in sizes:
        tower = towers[ti]
        rank = int(np.argmin(load))
        for t in tower.embedding._tables:
            per_param[t.name] = table_wise(rank)
            load[rank] += t.num_embeddings * t.embedding_dim
            all_tables.append(t)
    return construct_module_sharding_plan(all_tables, per_param, env)
