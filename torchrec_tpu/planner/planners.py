"""EmbeddingShardingPlanner: the search loop.

Capability parity with torchrec/distributed/planner/planners.py
(EmbeddingShardingPlanner:667; main loop :804-1030: enumerate ->
storage-reserve -> propose -> partition -> rate -> pick best, with a
proposal cache). The reference's ``collective_plan`` (rank-0 plan broadcast,
:766) is unnecessary here: planning is deterministic host code and JAX SPMD
programs are launched from identical host state on every process — determinism
IS the broadcast. For belt-and-braces multi-host use, ``plan_hash`` lets
processes assert they computed identical plans.
"""

from __future__ import annotations

import hashlib
import json
import time
from typing import Dict, List, Optional, Sequence

from torchrec_tpu.distributed.types import (
    EmbeddingModuleShardingPlan,
    ParameterSharding,
    Shard,
    ShardingEnv,
)
from torchrec_tpu.modules.embedding_configs import BaseEmbeddingConfig
from torchrec_tpu.planner.enumerators import EmbeddingEnumerator
from torchrec_tpu.planner.partitioners import GreedyPerfPartitioner
from torchrec_tpu.planner.perf_models import NoopPerfModel
from torchrec_tpu.planner.proposers import (
    DynamicProgrammingProposer,
    GreedyProposer,
    UniformProposer,
)
from torchrec_tpu.planner.shard_estimators import (
    EmbeddingPerfEstimator,
    EmbeddingStorageEstimator,
)
from torchrec_tpu.planner.stats import EmbeddingStats
from torchrec_tpu.planner.storage_reservations import (
    HeuristicalStorageReservation,
)
from torchrec_tpu.planner.types import (
    ParameterConstraints,
    PlannerError,
    ShardingOption,
    Topology,
)

__all__ = ["EmbeddingShardingPlanner", "plan_hash"]


class EmbeddingShardingPlanner:
    """enumerate -> propose -> partition -> estimate -> rate search loop (reference planner/planners.py:804-1030)."""

    def __init__(
        self,
        topology: Topology,
        batch_size: int = 512,
        constraints: Optional[Dict[str, ParameterConstraints]] = None,
        optimizer: str = "rowwise_adagrad",
        colocate_rowwise_state: bool = False,
        enumerator: Optional[EmbeddingEnumerator] = None,
        proposers: Optional[List] = None,
        partitioner=None,
        perf_model=None,
        storage_reservation=None,
        stats: Optional[EmbeddingStats] = None,
        timeout_seconds: float = 30.0,
        debug: bool = False,
    ):
        self._topology = topology
        self._constraints = constraints or {}
        self._enumerator = enumerator or EmbeddingEnumerator(
            topology, self._constraints
        )
        self._perf_estimator = EmbeddingPerfEstimator(
            topology, batch_size, optimizer
        )
        self._storage_estimator = EmbeddingStorageEstimator(
            topology, batch_size, optimizer,
            colocate_rowwise_state=colocate_rowwise_state,
        )
        self._proposers = proposers or [
            GreedyProposer(),
            UniformProposer(),
            DynamicProgrammingProposer(topology),
        ]
        self._partitioner = partitioner or GreedyPerfPartitioner()
        self._perf_model = perf_model or NoopPerfModel(topology)
        self._reservation = storage_reservation or HeuristicalStorageReservation()
        self._stats = stats or EmbeddingStats()
        self._timeout = timeout_seconds
        self._debug = debug
        self.num_proposals = 0
        self.num_plans = 0
        self.best_rating: Optional[float] = None

    def plan(
        self,
        tables: Sequence[BaseEmbeddingConfig],
        dense_param_bytes: int = 0,
    ) -> EmbeddingModuleShardingPlan:
        t_start = time.monotonic()
        reserve = self._reservation.reserve(
            self._topology, dense_param_bytes=dense_param_bytes
        )
        options = self._enumerator.enumerate(tables)
        for o in options:
            self._perf_estimator.estimate(o)
            self._storage_estimator.estimate(o)

        best = None
        best_rating = float("inf")
        cache = set()
        deadline = time.monotonic() + self._timeout
        for proposer in self._proposers:
            for proposal in proposer.propose(options):
                if time.monotonic() > deadline:
                    break
                key = tuple(
                    (
                        o.name,
                        o.sharding_type.value,
                        o.compute_kernel.value,
                        o.cache_load_factor,
                    )
                    for o in sorted(proposal, key=lambda o: o.name)
                )
                if key in cache:
                    continue
                cache.add(key)
                self.num_proposals += 1
                # proposers may mutate option parameters (e.g. cache scale);
                # re-estimate anything they marked dirty
                for o in proposal:
                    if any(sh.perf is None for sh in o.shards):
                        self._perf_estimator.estimate(o)
                        self._storage_estimator.estimate(o)
                try:
                    placed = self._partitioner.partition(
                        proposal, self._topology, hbm_reserve=reserve
                    )
                except PlannerError:
                    continue
                self.num_plans += 1
                rating = self._perf_model.rate(placed)
                if rating < best_rating:
                    best, best_rating = placed, rating
        if best is None:
            raise PlannerError(
                "no feasible plan found — reduce table sizes, relax "
                "constraints, or add devices"
            )
        self.best_rating = best_rating
        # retained for stats/dry-run reporting (planner/dry_run.py)
        self.last_plan_options = best
        if self._debug:
            self._stats.log(
                best,
                self._topology,
                batch_size=self._perf_estimator._batch,
                num_proposals=self.num_proposals,
                num_plans=self.num_plans,
                run_time=time.monotonic() - t_start,
                reserved_hbm_percent=reserve,
                dense_param_bytes=dense_param_bytes,
            )
        return _to_module_plan(best)


def _to_module_plan(
    options: Sequence[ShardingOption],
) -> EmbeddingModuleShardingPlan:
    plan = EmbeddingModuleShardingPlan()
    for o in options:
        plan[o.name] = ParameterSharding(
            sharding_type=o.sharding_type,
            compute_kernel=o.compute_kernel,
            # DP's placement sentinel (-1) means "all ranks" — keep it OUT
            # of the explicit rank list (load_plan filters it the same way;
            # consumers treat a non-empty list as an explicit placement)
            ranks=sorted(
                {
                    s.rank
                    for s in o.shards
                    if s.rank is not None and s.rank >= 0
                }
            ),
            shards=[
                Shard(
                    row_start=s.row_start,
                    row_count=s.row_count,
                    col_start=s.col_start,
                    col_count=s.col_count,
                    rank=s.rank if s.rank is not None else -1,
                )
                for s in o.shards
            ],
        )
    return plan


def plan_hash(plan: EmbeddingModuleShardingPlan) -> str:
    """Deterministic digest for cross-process plan validation (analog of the
    reference's plan-loader context hash, planners.py:906-926)."""
    payload = {
        name: {
            "type": ps.sharding_type.value,
            "kernel": ps.compute_kernel.value,
            "shards": [
                (s.row_start, s.row_count, s.col_start, s.col_count, s.rank)
                for s in ps.shards
            ],
        }
        for name, ps in sorted(plan.items())
    }
    return hashlib.sha256(
        json.dumps(payload, sort_keys=True).encode()
    ).hexdigest()


def save_plan(
    plan: EmbeddingModuleShardingPlan,
    path: str,
    context: Optional[dict] = None,
) -> None:
    """Persist a validated plan for reuse across restarts (reference
    PlanLoader, planner/types.py:1854 + context-hash validation at
    planners.py:906-926). ``context`` (e.g. {'world_size': 8, 'tables':
    [...]}) is hashed; load_plan refuses a mismatched context."""
    payload = {
        "plan": {
            name: {
                "type": ps.sharding_type.value,
                "kernel": ps.compute_kernel.value,
                "shards": [
                    [s.row_start, s.row_count, s.col_start, s.col_count, s.rank]
                    for s in ps.shards
                ],
            }
            for name, ps in plan.items()
        },
        "plan_hash": plan_hash(plan),
        "context_hash": hashlib.sha256(
            json.dumps(context or {}, sort_keys=True, default=str).encode()
        ).hexdigest(),
    }
    with open(path, "w") as f:
        json.dump(payload, f)


def load_plan(
    path: str, context: Optional[dict] = None
) -> EmbeddingModuleShardingPlan:
    """Load a saved plan; raises on context mismatch (stale plan guard)."""
    with open(path) as f:
        payload = json.load(f)
    ctx_hash = hashlib.sha256(
        json.dumps(context or {}, sort_keys=True, default=str).encode()
    ).hexdigest()
    if payload["context_hash"] != ctx_hash:
        raise ValueError(
            "saved plan context does not match the current topology/tables; "
            "re-plan instead of reusing"
        )
    from torchrec_tpu.types import ComputeKernel, ShardingType

    plan = EmbeddingModuleShardingPlan()
    for name, d in payload["plan"].items():
        plan[name] = ParameterSharding(
            sharding_type=ShardingType(d["type"]),
            compute_kernel=ComputeKernel(d["kernel"]),
            ranks=sorted({s[4] for s in d["shards"] if s[4] >= 0}),
            shards=[Shard(*s) for s in d["shards"]],
        )
    if plan_hash(plan) != payload["plan_hash"]:
        raise ValueError("plan payload corrupted (hash mismatch)")
    return plan
