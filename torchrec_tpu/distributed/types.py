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
    "ShardingBucketMetadata",
    "bucket_metadata_from_rows",
    "bucket_metadata_from_shards",
    "device_put_global",
]


def device_put_global(x, sharding: jax.sharding.NamedSharding):
    """``jax.device_put`` that also works on multi-process meshes.

    On a single-process mesh this IS ``jax.device_put``. When ``sharding``
    spans devices of other processes (``ShardingEnv.from_global``), the
    host value must be available on EVERY process (our shard layout is
    computed host-side everywhere, like the reference building tables on
    each rank before scattering, model_parallel.py:444) and each process
    contributes only its addressable shards.
    """
    # AOT topology mesh (jax.experimental.topologies): the compile-only
    # client has no buffer storage (and may claim addressability). Detect
    # it EXPLICITLY — a broad except around device_put would silently
    # convert genuine runtime failures (e.g. init-time OOM on real
    # devices) into abstract values, deferring the error to a confusing
    # downstream jit-call failure. Return the sharded abstract value so
    # init/state plumbing can feed jit(...).lower(...) for compile-only
    # validation against real multi-chip topologies.
    dev = next(iter(sharding.device_set))
    client = getattr(dev, "client", None)
    if getattr(client, "runtime_type", None) == "compile_only_runtime":
        import jax.numpy as jnp

        return jax.ShapeDtypeStruct(
            jnp.shape(x), jnp.result_type(x), sharding=sharding
        )
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


@dataclasses.dataclass
class ShardingEnv:
    """Device mesh + axis naming (reference ShardingEnv, types.py:920).

    ``shard_axis`` is either one mesh axis name (flat world) or a
    ``(host, chip)`` tuple (hierarchical world — the reference's
    intra/cross-node process-group split, comm.py:164). JAX collectives
    accept the tuple directly (flat semantics); the sharded modules
    additionally FACTOR batch reduce-scatters/all-gathers per axis when
    hierarchical, so TWRW/GRID pooled reductions ride the intra-host axis
    first (reference twrw_sharding.py:305,460 two-level comms).
    """

    mesh: jax.sharding.Mesh
    shard_axis: "str | Tuple[str, str]" = "shard"
    replica_axis: Optional[str] = None
    # local (intra-host) size for TWRW/GRID two-level placements
    local_size: Optional[int] = None

    @property
    def world_size(self) -> int:
        if isinstance(self.shard_axis, tuple):
            return int(
                np.prod([self.mesh.shape[a] for a in self.shard_axis])
            )
        return int(self.mesh.shape[self.shard_axis])

    @property
    def hierarchical(self) -> bool:
        return isinstance(self.shard_axis, tuple)

    @property
    def host_axis(self) -> Optional[str]:
        return self.shard_axis[0] if self.hierarchical else None

    @property
    def chip_axis(self) -> Optional[str]:
        return self.shard_axis[-1] if self.hierarchical else None

    @property
    def num_hosts(self) -> int:
        if not self.hierarchical:
            return 1
        return int(self.mesh.shape[self.shard_axis[0]])

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
        hierarchical: bool = False,
    ) -> "ShardingEnv":
        """``hierarchical=True`` (requires ``local_size``) factorizes the
        shard world into a ``(host, chip)`` mesh: device d = (d //
        local_size, d % local_size). Flat placements/ranks are unchanged —
        only the collective lowering gains the two-level structure."""
        devices = list(devices if devices is not None else jax.devices())
        if hierarchical:
            if not local_size:
                raise ValueError("hierarchical env requires local_size")
            n = len(devices) // replica_size if replica_size > 1 else len(devices)
            if n % local_size:
                raise ValueError(
                    f"world {n} not divisible by local_size {local_size}"
                )
            if replica_size > 1:
                if len(devices) % replica_size:
                    raise ValueError("devices not divisible by replica_size")
                arr = np.array(devices).reshape(
                    replica_size, n // local_size, local_size
                )
                mesh = jax.sharding.Mesh(arr, ("replica", "host", "chip"))
                return ShardingEnv(
                    mesh, ("host", "chip"), "replica", local_size
                )
            arr = np.array(devices).reshape(n // local_size, local_size)
            mesh = jax.sharding.Mesh(arr, ("host", "chip"))
            return ShardingEnv(mesh, ("host", "chip"), None, local_size)
        if replica_size > 1:
            if len(devices) % replica_size:
                raise ValueError("devices not divisible by replica_size")
            arr = np.array(devices).reshape(replica_size, -1)
            mesh = jax.sharding.Mesh(arr, ("replica", "shard"))
            return ShardingEnv(mesh, "shard", "replica", local_size)
        mesh = jax.sharding.Mesh(np.array(devices), ("shard",))
        return ShardingEnv(mesh, "shard", None, local_size)

    @staticmethod
    def from_global(
        coordinator_address: Optional[str] = None,
        num_processes: Optional[int] = None,
        process_id: Optional[int] = None,
        replica_size: int = 1,
        hierarchical: Optional[bool] = None,
        local_size: Optional[int] = None,
    ) -> "ShardingEnv":
        """Multi-process (multi-host) env over the global device set —
        the runtime entry the reference derives from env-configured process
        groups (torchrec/distributed/comm.py:164 intra_and_cross_node_pg;
        exercised by test_utils/multi_process.py:126).

        Call after ``jax.distributed.initialize`` — or pass
        ``coordinator_address``/``num_processes``/``process_id`` and this
        initializes the runtime first. The (host, chip) factorization is
        derived from the real process topology: one "host" per process,
        ``local_size`` = ``jax.local_device_count()``. ``hierarchical``
        defaults to True when there is more than one process, giving
        TWRW/GRID their two-level collectives over the actual
        intra-host/cross-host boundary.

        Each process then feeds only its LOCAL batch shard — see
        ``DistributedModelParallel.make_global_batch``.
        """
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        # process-major device order so the (host, chip) reshape puts each
        # process's devices in one host row
        devices = sorted(
            jax.devices(), key=lambda d: (d.process_index, d.id)
        )
        if local_size is None:
            local_size = jax.local_device_count()
        if hierarchical is None:
            hierarchical = jax.process_count() > 1
        return ShardingEnv.from_devices(
            devices,
            replica_size=replica_size,
            local_size=local_size,
            hierarchical=hierarchical,
        )

    # ---- two-level collective helpers (flat fallback when 1D) ----------
    def psum_scatter_batch(self, x, scatter_dimension: int = 0):
        """Reduce-scatter over the shard world; hierarchical envs lower to
        host-axis RS then chip-axis RS (intra-host leg rides local ICI) —
        bit-identical to the flat collective."""
        if self.hierarchical:
            for ax in self.shard_axis:
                x = jax.lax.psum_scatter(
                    x, ax, scatter_dimension=scatter_dimension, tiled=True
                )
            return x
        return jax.lax.psum_scatter(
            x, self.shard_axis, scatter_dimension=scatter_dimension,
            tiled=True,
        )

    def all_gather_batch(self, x, axis: int = 0):
        """Transpose of :meth:`psum_scatter_batch` (chip then host)."""
        if self.hierarchical:
            for ax in reversed(self.shard_axis):
                x = jax.lax.all_gather(x, ax, axis=axis, tiled=True)
            return x
        return jax.lax.all_gather(x, self.shard_axis, axis=axis, tiled=True)

    def psum_shard(self, x):
        """psum over the shard world; per-axis when hierarchical."""
        if self.hierarchical:
            for ax in reversed(self.shard_axis):
                x = jax.lax.psum(x, ax)
            return x
        return jax.lax.psum(x, self.shard_axis)


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
class ShardingBucketMetadata:
    """Bucket layout of a row-wise-bucketized table (reference
    distributed/types.py:1581): virtual/KVZCH tables checkpoint their rows
    bucket-addressed so a resharded restore routes buckets to new owners.

    ``num_buckets_per_shard[i]``: buckets in shard i.
    ``bucket_offsets_per_shard[i]``: index of shard i's first bucket.
    ``bucket_size``: rows per bucket (uniform).
    """

    num_buckets_per_shard: List[int]
    bucket_offsets_per_shard: List[int]
    bucket_size: int


def bucket_metadata_from_rows(
    rows_per_shard: Sequence[int], num_buckets: int
) -> ShardingBucketMetadata:
    """Bucket metadata from per-shard row counts (reference
    utils.py:651 get_bucket_metadata_from_shard_metadata, taking row
    counts instead of torch ShardMetadata)."""
    table_rows = int(sum(rows_per_shard))
    if table_rows % num_buckets:
        raise ValueError(
            f"table rows {table_rows} not divisible by num_buckets "
            f"{num_buckets}"
        )
    bucket_size = table_rows // num_buckets
    meta = ShardingBucketMetadata([], [], bucket_size)
    off = 0
    for rows in rows_per_shard:
        if rows % bucket_size:
            raise ValueError(
                f"shard rows {rows} not divisible by bucket size "
                f"{bucket_size}"
            )
        n = rows // bucket_size
        meta.num_buckets_per_shard.append(n)
        meta.bucket_offsets_per_shard.append(off)
        off += n
    return meta


def bucket_metadata_from_shards(
    shards: Sequence[Shard], num_buckets: int
) -> ShardingBucketMetadata:
    """Bucket metadata from a plan's placed shards (row-wise only)."""
    for s in shards:
        if s.col_start != 0:
            raise ValueError(
                "bucketization requires row-wise-only sharding"
            )
    return bucket_metadata_from_rows(
        [s.row_count for s in shards], num_buckets
    )


@dataclasses.dataclass
class ShardingPlan:
    """module path -> module plan (reference types.py:868)."""

    plan: Dict[str, EmbeddingModuleShardingPlan]

    def get_plan_for_module(
        self, module_path: str
    ) -> Optional[EmbeddingModuleShardingPlan]:
        return self.plan.get(module_path)
