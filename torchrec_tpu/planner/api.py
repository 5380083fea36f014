"""Planner service façade: model -> ModelArch -> validated plan + report.

Capability parity with the reference's plan-as-a-service layer —
torchrec/distributed/planner/api.py:48 (ShardingPlannerAPI.plan:
request -> per-target plan results with fingerprints/stats),
model_arch.py:88 (extract_model_arch) and provider.py:136
(DefaultPlannerProvider builds topology/estimators/planner from a
request). One call takes a model (or a pre-extracted arch) plus a
topology and returns the plan, its hash, the per-rank report table, and
the search statistics; an optional reuse directory gives the reference's
collective plan-reuse flow (planners.py:906-926) keyed on the
(arch, topology, batch) fingerprint.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Dict, List, Optional, Sequence

from torchrec_tpu.modules.embedding_configs import BaseEmbeddingConfig
from torchrec_tpu.planner.planners import (
    EmbeddingShardingPlanner,
    load_plan,
    plan_hash,
    save_plan,
)
from torchrec_tpu.planner.stats import EmbeddingStats
from torchrec_tpu.planner.types import ParameterConstraints, Topology

__all__ = [
    "ModelArch",
    "ShardingPlanResult",
    "extract_model_arch",
    "model_arch_hash",
    "plan_for_model",
]


@dataclasses.dataclass(frozen=True)
class ModelArch:
    """What the planner needs to know about a model (reference
    model_arch.py ModelArch): its embedding tables plus the dense bytes
    competing for HBM."""

    tables: tuple
    dense_param_bytes: int = 0

    @property
    def total_sparse_param_bytes(self) -> int:
        return sum(
            t.num_embeddings
            * t.embedding_dim
            * t.data_type.bytes_per_element
            for t in self.tables
        )


def extract_model_arch(model, dense_param_bytes: int = 0) -> ModelArch:
    """Introspect ``model`` for its embedding collections (reference
    model_arch.py:88 extract_model_arch walks named_modules; here the
    DMP model contract exposes ``.embedding_bag_collection``/``.ebc``, and
    bare collections / table lists / dicts of modules are accepted)."""
    tables: List[BaseEmbeddingConfig] = []

    def collect(obj):
        if obj is None:
            return False
        if isinstance(obj, (list, tuple)) and obj and isinstance(
            obj[0], BaseEmbeddingConfig
        ):
            tables.extend(obj)
            return True
        inner = getattr(obj, "_tables", None)
        if inner:
            tables.extend(inner)
            return True
        return False

    if not collect(model):
        found = False
        for attr in ("embedding_bag_collection", "ebc", "ec", "embedding_collection"):
            found |= collect(getattr(model, attr, None))
        if not found and isinstance(model, dict):
            for v in model.values():
                found |= collect(v)
        if not found:
            raise TypeError(
                "could not find embedding tables on the model (expose "
                ".embedding_bag_collection/.ebc, pass a collection, a "
                "table list, or a dict of modules)"
            )
    return ModelArch(
        tables=tuple(tables), dense_param_bytes=dense_param_bytes
    )


def model_arch_hash(arch: ModelArch) -> str:
    """Stable fingerprint of the arch (reference model_arch.py:163)."""
    canon = json.dumps(
        [
            (
                t.name,
                t.num_embeddings,
                t.embedding_dim,
                t.data_type.value,
                tuple(t.feature_names),
            )
            for t in arch.tables
        ]
        + [arch.dense_param_bytes],
        sort_keys=True,
    )
    return hashlib.sha256(canon.encode()).hexdigest()[:16]


@dataclasses.dataclass
class ShardingPlanResult:
    """Plan + provenance (reference api.py ShardingPlanResult)."""

    plan: Dict
    plan_hash: str
    arch_hash: str
    report: str
    num_proposals: int
    num_plans: int
    best_rating: Optional[float]
    reused: bool = False


def plan_for_model(
    model,
    topology: Optional[Topology] = None,
    world_size: int = 8,
    generation: str = "v5e",
    batch_size: int = 512,
    constraints: Optional[Dict[str, ParameterConstraints]] = None,
    optimizer: str = "rowwise_adagrad",
    dense_param_bytes: int = 0,
    reuse_dir: Optional[str] = None,
    **planner_kwargs,
) -> ShardingPlanResult:
    """Model/arch + topology -> validated plan + report in ONE call.

    ``reuse_dir``: directory for the plan-reuse flow — a plan saved under
    the (arch, topology, batch) fingerprint is loaded instead of
    re-planning (and a fresh plan is saved there for the next run), the
    reference's collective_plan reuse path.
    """
    arch = (
        model
        if isinstance(model, ModelArch)
        else extract_model_arch(model, dense_param_bytes)
    )
    topo = topology or Topology(
        world_size=world_size, generation=generation
    )
    a_hash = model_arch_hash(arch)
    fingerprint = hashlib.sha256(
        f"{a_hash}:{topo.world_size}:{topo.generation}:"
        f"{topo.local_world_size}:{batch_size}:{optimizer}".encode()
    ).hexdigest()[:16]
    reuse_path = (
        os.path.join(reuse_dir, f"plan_{fingerprint}.json")
        if reuse_dir
        else None
    )
    ctx = {"fingerprint": fingerprint}
    if reuse_path and os.path.exists(reuse_path):
        plan = load_plan(reuse_path, ctx)
        return ShardingPlanResult(
            plan=plan,
            plan_hash=plan_hash(plan),
            arch_hash=a_hash,
            report="(reused plan — no fresh search)",
            num_proposals=0,
            num_plans=0,
            best_rating=None,
            reused=True,
        )
    stats = EmbeddingStats()
    planner = EmbeddingShardingPlanner(
        topo,
        batch_size=batch_size,
        constraints=constraints,
        optimizer=optimizer,
        stats=stats,
        **planner_kwargs,
    )
    plan = planner.plan(
        list(arch.tables), dense_param_bytes=arch.dense_param_bytes
    )
    report = stats.render(
        planner.last_plan_options,
        topo,
        batch_size=batch_size,
        num_proposals=planner.num_proposals,
        num_plans=planner.num_plans,
        dense_param_bytes=arch.dense_param_bytes,
    )
    if reuse_path:
        save_plan(plan, reuse_path, ctx)
    return ShardingPlanResult(
        plan=plan,
        plan_hash=plan_hash(plan),
        arch_hash=a_hash,
        report=report,
        num_proposals=planner.num_proposals,
        num_plans=planner.num_plans,
        best_rating=planner.best_rating,
    )
