"""Storage reservations: HBM held back for dense params/activations/scratch.

Capability parity with torchrec/distributed/planner/storage_reservations.py
(FixedPercentageStorageReservation:198, FixedAbsolute:235, SKUAware:270,
HeuristicalStorageReservation:435, InferenceStorageReservation:542). All
reserve() methods return the HBM FRACTION held back from the partitioner
(the reference mutates a copied Topology instead; same information).
"""

from __future__ import annotations

from typing import Optional, Sequence

from torchrec_tpu.planner import constants
from torchrec_tpu.planner.types import Topology

__all__ = [
    "FixedPercentageStorageReservation",
    "FixedAbsoluteStorageReservation",
    "HeuristicalStorageReservation",
    "InferenceStorageReservation",
    "SKUAwareStorageReservation",
]


class FixedPercentageStorageReservation:
    """Reserve a fixed HBM fraction for dense/overheads (reference planner/storage_reservations.py:198)."""

    def __init__(self, percentage: float = constants.DEFAULT_RESERVE_PERCENT):
        if not 0.0 <= percentage < 1.0:
            raise ValueError("percentage must be in [0, 1)")
        self.percentage = percentage

    def reserve(self, topology: Topology, **kwargs) -> float:
        return self.percentage


class HeuristicalStorageReservation:
    """percentage + estimated dense params (x4 for grads+optimizer) +
    batch activations, as a fraction of HBM (reference :435)."""

    def __init__(self, percentage: float = 0.05):
        self.percentage = percentage

    def reserve(
        self,
        topology: Topology,
        dense_param_bytes: int = 0,
        batch_activation_bytes: int = 0,
        **kwargs,
    ) -> float:
        extra = 4 * dense_param_bytes + 2 * batch_activation_bytes
        frac = self.percentage + extra / topology.hbm_cap
        return min(frac, 0.9)


class FixedAbsoluteStorageReservation:
    """Reserve an absolute HBM byte count (reference
    planner/storage_reservations.py:235 FixedAbsoluteStorageReservation)."""

    def __init__(self, hbm_reserved_bytes: int):
        if hbm_reserved_bytes < 0:
            raise ValueError("hbm_reserved_bytes must be >= 0")
        self.hbm_reserved_bytes = int(hbm_reserved_bytes)

    def reserve(self, topology: Topology, **kwargs) -> float:
        return min(self.hbm_reserved_bytes / topology.hbm_cap, 0.95)


class InferenceStorageReservation:
    """Serving-time reservation (reference planner/storage_reservations.py
    :542): dense tensors replicate per chip at x1 (no grads/optimizer) and
    batch inputs ride along at x1 — no training multipliers."""

    def __init__(
        self,
        percentage: float = 0.05,
        dense_tensor_estimate: Optional[int] = None,
    ):
        if not 0.0 <= percentage <= 1.0:
            raise ValueError("percentage must be in [0, 1]")
        self.percentage = percentage
        self.dense_tensor_estimate = dense_tensor_estimate

    def reserve(
        self,
        topology: Topology,
        dense_param_bytes: int = 0,
        batch_activation_bytes: int = 0,
        **kwargs,
    ) -> float:
        dense = (
            self.dense_tensor_estimate
            if self.dense_tensor_estimate is not None
            else dense_param_bytes
        )
        extra = dense + batch_activation_bytes  # x1: inference replicas
        return min(self.percentage + extra / topology.hbm_cap, 0.9)


class SKUAwareStorageReservation:
    """SKU-invariant reservation (reference planner/storage_reservations.py
    :270 SKUAwareStorageReservation): the margin is anchored to a fixed
    HOME generation's HBM, so the reserved BYTE count does not scale with
    whatever chip the job lands on — only the returned fraction does.
    ``runtime_overhead_bytes`` is the per-SKU runtime tax slot (XLA
    scratch/allocator, the reference's NCCL-buffer analog)."""

    def __init__(
        self,
        margin_bytes: Optional[int] = None,
        home_generation: str = constants.DEFAULT_GENERATION,
        percentage: float = constants.DEFAULT_RESERVE_PERCENT,
        runtime_overhead_bytes: int = 0,
        parameter_multiplier: float = 4.0,
        model_base_bytes: Optional[int] = None,
    ):
        if margin_bytes is None:
            home_hbm = constants.TPU_GENERATIONS[home_generation]["hbm"]
            margin_bytes = int(percentage * home_hbm)
        if margin_bytes < 0 or runtime_overhead_bytes < 0:
            raise ValueError("byte counts must be >= 0")
        self.margin_bytes = margin_bytes
        self.runtime_overhead_bytes = runtime_overhead_bytes
        self.parameter_multiplier = parameter_multiplier
        self.model_base_bytes = model_base_bytes

    def reserve(
        self,
        topology: Topology,
        dense_param_bytes: int = 0,
        batch_activation_bytes: int = 0,
        **kwargs,
    ) -> float:
        if self.model_base_bytes is not None:
            static_base = self.model_base_bytes  # measured base replaces
        else:
            static_base = self.margin_bytes + int(
                self.parameter_multiplier * dense_param_bytes
            )
        total = (
            static_base
            + 2 * batch_activation_bytes  # dynamic term, recomputed live
            + self.runtime_overhead_bytes
        )
        return min(total / topology.hbm_cap, 0.95)
