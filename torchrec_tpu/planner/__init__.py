"""Sharding planner (reference torchrec/distributed/planner/__init__.py)."""
from torchrec_tpu.planner.api import (
    ModelArch,
    ShardingPlanResult,
    extract_model_arch,
    model_arch_hash,
    plan_for_model,
)
from torchrec_tpu.planner.cache_stats import EmbeddingOffloadStats
from torchrec_tpu.planner.enumerators import EmbeddingEnumerator
from torchrec_tpu.planner.partitioners import (
    GreedyPerfPartitioner,
    MemoryBalancedPartitioner,
)
from torchrec_tpu.planner.perf_models import NoopPerfModel, NoopStorageModel
from torchrec_tpu.planner.planners import EmbeddingShardingPlanner, plan_hash
from torchrec_tpu.planner.proposers import (
    EmbeddingOffloadScaleupProposer,
    DynamicProgrammingProposer,
    GreedyProposer,
    GridSearchProposer,
    UniformProposer,
)
from torchrec_tpu.planner.shard_estimators import (
    EmbeddingPerfEstimator,
    EmbeddingStorageEstimator,
)
from torchrec_tpu.planner.stats import EmbeddingStats
from torchrec_tpu.planner.storage_reservations import (
    FixedAbsoluteStorageReservation,
    FixedPercentageStorageReservation,
    HeuristicalStorageReservation,
    InferenceStorageReservation,
    SKUAwareStorageReservation,
)
from torchrec_tpu.planner.types import (
    ParameterConstraints,
    Perf,
    PlannerError,
    PlannerShard,
    ShardingOption,
    Storage,
    Topology,
)

__all__ = [
    "ModelArch",
    "ShardingPlanResult",
    "extract_model_arch",
    "model_arch_hash",
    "plan_for_model",
    "EmbeddingOffloadScaleupProposer",
    "EmbeddingEnumerator",
    "EmbeddingOffloadStats",
    "GreedyPerfPartitioner",
    "MemoryBalancedPartitioner",
    "NoopPerfModel",
    "NoopStorageModel",
    "EmbeddingShardingPlanner",
    "plan_hash",
    "DynamicProgrammingProposer",
    "GreedyProposer",
    "GridSearchProposer",
    "UniformProposer",
    "EmbeddingPerfEstimator",
    "EmbeddingStorageEstimator",
    "EmbeddingStats",
    "FixedAbsoluteStorageReservation",
    "FixedPercentageStorageReservation",
    "HeuristicalStorageReservation",
    "InferenceStorageReservation",
    "SKUAwareStorageReservation",
    "ParameterConstraints",
    "Perf",
    "PlannerError",
    "PlannerShard",
    "ShardingOption",
    "Storage",
    "Topology",
]
