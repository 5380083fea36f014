"""Storage reservations: HBM held back for dense params/activations/scratch.

Capability parity with torchrec/distributed/planner/storage_reservations.py
(FixedPercentageStorageReservation:198, HeuristicalStorageReservation:435).
"""

from __future__ import annotations

from typing import Optional, Sequence

from torchrec_tpu.planner import constants
from torchrec_tpu.planner.types import Topology

__all__ = [
    "FixedPercentageStorageReservation",
    "HeuristicalStorageReservation",
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
