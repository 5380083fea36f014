"""Composable sharding: per-module shard() without the DMP facade.

Capability parity with torchrec/distributed/shard.py (shard():55,
shard_modules():167 — shard individual embedding modules in place, letting
the surrounding model stay under a different data-parallel wrapper).
"""

from __future__ import annotations

from typing import Dict, Optional, Union

from torchrec_tpu.distributed.embedding import ShardedEmbeddingCollection
from torchrec_tpu.distributed.embeddingbag import ShardedEmbeddingBagCollection
from torchrec_tpu.distributed.types import (
    EmbeddingModuleShardingPlan,
    ShardingEnv,
)
from torchrec_tpu.modules.embedding_modules import (
    EmbeddingBagCollection,
    EmbeddingCollection,
)

__all__ = ["shard", "shard_modules"]


def shard(
    module: Union[EmbeddingBagCollection, EmbeddingCollection],
    env: ShardingEnv,
    plan: Optional[EmbeddingModuleShardingPlan] = None,
    fused_params=None,
    **kwargs,
):
    """Shard ONE embedding module (reference shard.py:55). With no plan,
    the cost-model planner places the tables. ``fused_params``: a
    :class:`~torchrec_tpu.distributed.fused_params.FusedParams` bundle
    threaded into the module's kernel knobs before sharding (reference
    sharders' fused_params dict)."""
    if fused_params is not None:
        from torchrec_tpu.distributed.fused_params import apply_fused_params

        apply_fused_params(module, fused_params)
    if plan is None:
        from torchrec_tpu.planner import EmbeddingShardingPlanner, Topology

        planner = EmbeddingShardingPlanner(
            Topology(world_size=env.world_size)
        )
        plan = planner.plan(module._tables)
    if isinstance(module, EmbeddingBagCollection):
        return ShardedEmbeddingBagCollection(module, plan, env, **kwargs)
    if isinstance(module, EmbeddingCollection):
        return ShardedEmbeddingCollection(module, plan, env)
    raise TypeError(f"no sharder for {type(module).__name__}")


def shard_modules(
    modules: Dict[str, Union[EmbeddingBagCollection, EmbeddingCollection]],
    env: ShardingEnv,
    plans: Optional[Dict[str, EmbeddingModuleShardingPlan]] = None,
) -> Dict[str, object]:
    """Shard several modules (reference shard_modules():167)."""
    plans = plans or {}
    return {
        name: shard(m, env, plans.get(name)) for name, m in modules.items()
    }
