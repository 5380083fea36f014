"""Sharded modules, comms, and orchestration (reference torchrec/distributed/__init__.py)."""
from torchrec_tpu.distributed.embedding import ShardedEmbeddingCollection
from torchrec_tpu.distributed.embedding_tower_sharding import (
    ShardedEmbeddingTowerCollection,
)
from torchrec_tpu.distributed.embeddingbag import ShardedEmbeddingBagCollection
from torchrec_tpu.distributed.sharding_plan import (
    column_wise,
    construct_module_sharding_plan,
    data_parallel,
    grid_shard,
    row_wise,
    table_row_wise,
    table_wise,
    tower_sharding_plan,
)
from torchrec_tpu.distributed.fused_params import (
    FusedParams,
    apply_fused_params,
)
from torchrec_tpu.distributed.qcomms import CommType, QCommsConfig
from torchrec_tpu.distributed.types import (
    EmbeddingModuleShardingPlan,
    ParameterSharding,
    Shard,
    ShardingEnv,
    ShardingPlan,
)

__all__ = [
    "tower_sharding_plan",
    "CommType",
    "FusedParams",
    "QCommsConfig",
    "apply_fused_params",
    "ShardedEmbeddingBagCollection",
    "ShardedEmbeddingTowerCollection",
    "ShardedEmbeddingCollection",
    "column_wise",
    "construct_module_sharding_plan",
    "data_parallel",
    "grid_shard",
    "row_wise",
    "table_row_wise",
    "table_wise",
    "EmbeddingModuleShardingPlan",
    "ParameterSharding",
    "Shard",
    "ShardingEnv",
    "ShardingPlan",
]


def __getattr__(name):
    if name in ("MemoryStashingManager", "stash_to_host", "restore_to_device"):
        from torchrec_tpu.distributed import memory_stashing

        return getattr(memory_stashing, name)
    if name in ("EmbDimBucketer", "EmbDimBucketerPolicy"):
        from torchrec_tpu.distributed import embedding_dim_bucketer

        return getattr(embedding_dim_bucketer, name)
    raise AttributeError(name)
