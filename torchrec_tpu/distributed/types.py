"""Distributed types: sharding env, per-table sharding spec, plans.

Capability parity with torchrec/distributed/types.py (ParameterSharding:~800,
ShardingPlan:868, ShardingEnv:920, ShardingEnv2D:1107) — re-designed around a
``jax.sharding.Mesh`` instead of process groups:

* ``ShardingEnv`` wraps a mesh with named axes. 1D: ``(shard,)`` — the flat
  world over which both batch and tables shard (TorchRec's default world).
  2D: ``(replica, shard)`` — DMPCollection's replica x shard grid
  (model_parallel.py:1028). Multi-host TWRW/GRID use ``(host, chip)``
  factorizations of the shard axis.

* ``ParameterSharding`` describes one table's placement; shard offsets/sizes
  are computed eagerly (pure host metadata, like the reference's
  ShardMetadata) and consumed by the SPMD layout compiler in
  distributed/embeddingbag.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from torchrec_tpu.types import ComputeKernel, ShardingType

__all__ = [
    "ShardingEnv",
    "Shard",
    "ParameterSharding",
    "EmbeddingModuleShardingPlan",
    "ShardingPlan",
]


@dataclasses.dataclass
class ShardingEnv:
    """Device mesh + axis naming (reference ShardingEnv, types.py:920)."""

    mesh: jax.sharding.Mesh
    shard_axis: str = "shard"
    replica_axis: Optional[str] = None
    # local (intra-host) size for TWRW/GRID two-level placements
    local_size: Optional[int] = None

    @property
    def world_size(self) -> int:
        return int(self.mesh.shape[self.shard_axis])

    @property
    def num_replicas(self) -> int:
        if self.replica_axis is None:
            return 1
        return int(self.mesh.shape[self.replica_axis])

    @staticmethod
    def from_devices(
        devices: Optional[Sequence[jax.Device]] = None,
        replica_size: int = 1,
        local_size: Optional[int] = None,
    ) -> "ShardingEnv":
        devices = list(devices if devices is not None else jax.devices())
        if replica_size > 1:
            if len(devices) % replica_size:
                raise ValueError("devices not divisible by replica_size")
            arr = np.array(devices).reshape(replica_size, -1)
            mesh = jax.sharding.Mesh(arr, ("replica", "shard"))
            return ShardingEnv(mesh, "shard", "replica", local_size)
        mesh = jax.sharding.Mesh(np.array(devices), ("shard",))
        return ShardingEnv(mesh, "shard", None, local_size)


@dataclasses.dataclass(frozen=True)
class Shard:
    """One placed shard of a table (reference planner/types.py:70)."""

    row_start: int
    row_count: int
    col_start: int
    col_count: int
    rank: int  # position along the shard axis


@dataclasses.dataclass
class ParameterSharding:
    """Placement of one table (reference types.py ParameterSharding)."""

    sharding_type: ShardingType
    compute_kernel: ComputeKernel = ComputeKernel.FUSED
    # ranks used by this table (meaning depends on sharding_type)
    ranks: Optional[List[int]] = None
    shards: List[Shard] = dataclasses.field(default_factory=list)


class EmbeddingModuleShardingPlan(Dict[str, ParameterSharding]):
    """table name -> ParameterSharding for one module
    (reference EmbeddingModuleShardingPlan)."""


@dataclasses.dataclass
class ShardingPlan:
    """module path -> module plan (reference types.py:868)."""

    plan: Dict[str, EmbeddingModuleShardingPlan]

    def get_plan_for_module(
        self, module_path: str
    ) -> Optional[EmbeddingModuleShardingPlan]:
        return self.plan.get(module_path)
