"""Planner data model: Topology / Perf / Storage / ShardingOption /
ParameterConstraints.

Capability parity with torchrec/distributed/planner/types.py
(Topology:952, Perf:135, Storage:70, Shard:1236, ShardingOption:1264,
ParameterConstraints:1545) — re-keyed to TPU topology (chips x hosts with
ICI/DCN bandwidths and an HBM/host-DRAM memory hierarchy).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

from torchrec_tpu.modules.embedding_configs import BaseEmbeddingConfig
from torchrec_tpu.planner import constants
from torchrec_tpu.types import ComputeKernel, ShardingType

__all__ = [
    "Topology",
    "Perf",
    "Storage",
    "PlannerShard",
    "ShardingOption",
    "ParameterConstraints",
    "PlannerError",
]


class PlannerError(RuntimeError):
    """Planner failure with error-type tag (reference planner/types.py PlannerError)."""

    pass


@dataclasses.dataclass
class Topology:
    """TPU slice description (reference Topology, planner/types.py:952)."""

    world_size: int
    generation: str = constants.DEFAULT_GENERATION
    local_world_size: Optional[int] = None  # chips per host
    hbm_cap: Optional[int] = None
    ddr_cap: int = constants.DDR_CAP

    def __post_init__(self):
        gen = constants.TPU_GENERATIONS[self.generation]
        if self.hbm_cap is None:
            self.hbm_cap = gen["hbm"]
        self.hbm_bw = gen["hbm_bw"]
        self.ici_bw = gen["ici_bw"]
        self.vmem = gen["vmem"]
        self.dcn_bw = constants.DCN_BW
        self.ddr_bw = constants.DDR_MEM_BW
        self.ssd_bw = constants.SSD_BW
        self.ssd_cap = constants.SSD_CAP
        if self.local_world_size is None:
            self.local_world_size = self.world_size

    @property
    def num_hosts(self) -> int:
        return max(self.world_size // self.local_world_size, 1)

    def inter_host_bw(self) -> float:
        return self.dcn_bw if self.num_hosts > 1 else self.ici_bw


@dataclasses.dataclass
class Perf:
    """Per-shard cost breakdown in seconds (reference Perf:135)."""

    fwd_compute: float = 0.0
    fwd_comms: float = 0.0
    bwd_compute: float = 0.0
    bwd_comms: float = 0.0
    input_dist: float = 0.0

    @property
    def total(self) -> float:
        return (
            self.fwd_compute
            + self.fwd_comms
            + self.bwd_compute
            + self.bwd_comms
            + self.input_dist
        )

    def __add__(self, other: "Perf") -> "Perf":
        return Perf(
            self.fwd_compute + other.fwd_compute,
            self.fwd_comms + other.fwd_comms,
            self.bwd_compute + other.bwd_compute,
            self.bwd_comms + other.bwd_comms,
            self.input_dist + other.input_dist,
        )


@dataclasses.dataclass
class Storage:
    """Per-shard memory bytes by tier (reference Storage:70)."""

    hbm: int = 0
    ddr: int = 0
    ssd: int = 0  # NVMe tier behind *_SSD_* virtual-table kernels

    def __add__(self, other: "Storage") -> "Storage":
        return Storage(
            self.hbm + other.hbm, self.ddr + other.ddr, self.ssd + other.ssd
        )

    def fits(self, cap: "Storage") -> bool:
        # ssd is treated as elastic (multi-TB local NVMe); partitioners
        # bound only the hbm/ddr tiers, matching the reference partitioner.
        return self.hbm <= cap.hbm and self.ddr <= cap.ddr


@dataclasses.dataclass
class PlannerShard:
    """Candidate shard with cost annotations (reference planner Shard)."""

    row_start: int
    row_count: int
    col_start: int
    col_count: int
    rank: Optional[int] = None
    perf: Optional[Perf] = None
    storage: Optional[Storage] = None


@dataclasses.dataclass
class ShardingOption:
    """One candidate placement of one table (reference ShardingOption:1264)."""

    table: BaseEmbeddingConfig
    sharding_type: ShardingType
    compute_kernel: ComputeKernel
    shards: List[PlannerShard]
    pooling_factor: float = constants.POOLING_FACTOR
    is_weighted: bool = False
    # HBM cache fraction for FUSED_HOST_OFFLOAD / KEY_VALUE kernels
    # (reference CacheParams.load_factor); scaled by the offload-scaleup
    # proposer to use leftover HBM
    cache_load_factor: Optional[float] = None
    # MRC-histogram cache statistics (reference CacheParams.stats /
    # EmbeddingOffloadStats): drives expected_miss_rate(clf) pricing in
    # the estimator instead of the uniform-traffic (1 - clf) model
    cache_stats: Optional["object"] = None

    @property
    def name(self) -> str:
        return self.table.name

    @property
    def num_shards(self) -> int:
        return len(self.shards)

    @property
    def total_perf(self) -> float:
        return sum(s.perf.total for s in self.shards if s.perf)

    @property
    def critical_perf(self) -> float:
        """Parallel (critical-path) cost of this option: the MAX per-shard
        perf. Proposal ordering must use this, not :attr:`total_perf` —
        shards run on DIFFERENT ranks, so summing them over-prices
        sharded placements by their shard count (an 8-way RW split of a
        mega-table summed to ~8x one shard and lost to TABLE_WISE on
        every proposal, inverting the reference planner's known-good
        mega-table placements)."""
        return max(
            (s.perf.total for s in self.shards if s.perf), default=0.0
        )

    @property
    def total_storage(self) -> Storage:
        st = Storage()
        for s in self.shards:
            if s.storage:
                st = st + s.storage
        return st

    def clone(self) -> "ShardingOption":
        return ShardingOption(
            table=self.table,
            sharding_type=self.sharding_type,
            compute_kernel=self.compute_kernel,
            shards=[dataclasses.replace(s) for s in self.shards],
            pooling_factor=self.pooling_factor,
            cache_stats=self.cache_stats,
            is_weighted=self.is_weighted,
            cache_load_factor=self.cache_load_factor,
        )


@dataclasses.dataclass
class ParameterConstraints:
    """Per-table search constraints (reference ParameterConstraints:1545)."""

    sharding_types: Optional[List[ShardingType]] = None
    compute_kernels: Optional[List[ComputeKernel]] = None
    min_partition: Optional[int] = None  # min rows (RW) / cols (CW) per shard
    pooling_factors: Optional[List[float]] = None  # per feature
    num_poolings: Optional[List[float]] = None
    batch_sizes: Optional[List[int]] = None
    is_weighted: bool = False
    cache_load_factor: Optional[float] = None  # host-offload cache ratio
    # EmbeddingOffloadStats (planner/cache_stats.py): measured MRC stats
    cache_stats: Optional["object"] = None
    device_group: Optional[str] = None

    def pooling_factor(self) -> float:
        if self.pooling_factors:
            return sum(self.pooling_factors) / len(self.pooling_factors)
        return constants.POOLING_FACTOR
