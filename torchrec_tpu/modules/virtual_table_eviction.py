"""Virtual-table eviction engine — policy-driven row eviction metadata.

Capability parity with the reference's virtual-table eviction machinery:
the policy config family (torchrec/modules/embedding_configs.py:181-359)
drives which KVZCH/SSD-tier rows are evicted. The reference packs a
16-byte metadata header (key, timestamp, used-bit+count) per row inside
the FBGEMM KV tensor and evicts inside the C++ backend
(fbgemm KVZCH eviction, embedding_configs.py:196 comment); here the
metadata is explicit host-side numpy arrays beside the bounded HBM cache
(one slot per cache row), updated in the input pipeline where the
IDTransformer already runs — the device program never sees any of it.

``EvictionTracker`` is pure bookkeeping: `touch` on every batch, `select`
returns the slots a policy wants evicted. The KV collection
(modules/kv_embedding.py) spills the selected rows to the parameter
server and frees their transformer entries.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import numpy as np

from torchrec_tpu.modules.embedding_configs import (
    CountBasedEvictionPolicy,
    CountTimestampMixedEvictionPolicy,
    FeatureL2NormBasedEvictionPolicy,
    FeatureScoreBasedEvictionPolicy,
    NoEvictionPolicy,
    TimestampBasedEvictionPolicy,
    VirtualTableEvictionPolicy,
)

__all__ = ["EvictionTracker"]


class EvictionTracker:
    """Per-cache-slot eviction metadata for ONE virtual table.

    Arrays are sized to the bounded cache capacity; slots are the
    IDTransformer's cache ids. All ops are vectorized numpy (host-side,
    input-pipeline thread)."""

    def __init__(self, capacity: int):
        self.capacity = int(capacity)
        self.count = np.zeros(capacity, np.float64)  # decayed access count
        self.score = np.zeros(capacity, np.float64)  # decayed feature score
        self.last_seen_min = np.full(capacity, -1.0, np.float64)
        self.in_use = np.zeros(capacity, np.bool_)

    # ------------------------------------------------------------- updates
    def touch(
        self,
        slots: np.ndarray,
        now_min: float,
        feature_score: float = 1.0,
    ) -> None:
        """Record one batch's accesses. ``slots`` may repeat (multi-hit
        rows count every hit, like the reference's per-access count)."""
        slots = np.asarray(slots, np.int64)
        if not len(slots):
            return
        np.add.at(self.count, slots, 1.0)
        np.add.at(self.score, slots, float(feature_score))
        self.last_seen_min[slots] = float(now_min)
        self.in_use[slots] = True

    def decay(self, rate: float) -> None:
        """One decay round (the reference decays counts/scores per
        eviction pass, CountBasedEvictionPolicy.decay_rate)."""
        self.count *= rate
        self.score *= rate

    def free(self, slots: np.ndarray) -> None:
        slots = np.asarray(slots, np.int64)
        if not len(slots):
            return
        self.count[slots] = 0.0
        self.score[slots] = 0.0
        self.last_seen_min[slots] = -1.0
        self.in_use[slots] = False

    # ------------------------------------------------------------ selection
    def select(
        self,
        policy: Optional[VirtualTableEvictionPolicy],
        now_min: float,
        l2_norms: Optional[np.ndarray] = None,
        inference: bool = False,
    ) -> np.ndarray:
        """Slots the policy wants evicted NOW (int64, possibly empty).

        ``l2_norms``: per-slot embedding L2 norms, required only by
        FeatureL2NormBasedEvictionPolicy. ``inference=True`` swaps in each
        policy's inference thresholds (the publish-time sweep)."""
        if policy is None or isinstance(policy, NoEvictionPolicy):
            return np.empty(0, np.int64)
        used = int(self.in_use.sum())
        trigger = policy.training_id_eviction_trigger_count
        if trigger and used <= trigger:
            return np.empty(0, np.int64)

        mask = np.zeros(self.capacity, np.bool_)
        if isinstance(policy, CountBasedEvictionPolicy):
            thr = (
                policy.inference_eviction_threshold
                if inference
                else policy.eviction_threshold
            )
            if thr:
                self.decay(policy.decay_rate)
                mask = self.in_use & (self.count < thr)
        elif isinstance(policy, TimestampBasedEvictionPolicy):
            ttl = (
                policy.inference_eviction_ttl_mins
                if inference
                else policy.eviction_ttl_mins
            )
            if ttl:
                mask = self.in_use & (now_min - self.last_seen_min > ttl)
            if inference and policy.max_inference_id_num_per_rank:
                mask |= self._cap_excess(
                    policy.max_inference_id_num_per_rank, self.last_seen_min
                )
        elif isinstance(policy, CountTimestampMixedEvictionPolicy):
            thr = (
                policy.inference_eviction_threshold
                if inference
                else policy.eviction_threshold
            )
            ttl = (
                policy.inference_eviction_ttl_mins
                if inference
                else policy.eviction_ttl_mins
            )
            if thr:
                self.decay(policy.decay_rate)
                mask = self.in_use & (self.count < thr)
            if ttl:
                mask |= self.in_use & (now_min - self.last_seen_min > ttl)
        elif isinstance(policy, FeatureL2NormBasedEvictionPolicy):
            thr = (
                policy.inference_eviction_threshold
                if inference
                else policy.eviction_threshold
            )
            if thr and l2_norms is not None:
                norms = np.asarray(l2_norms, np.float64)
                mask = self.in_use & (norms < thr)
        elif isinstance(policy, FeatureScoreBasedEvictionPolicy):
            if not policy.enable_eviction:
                return np.empty(0, np.int64)
            if policy.eviction_ttl_mins:
                mask = self.in_use & (
                    now_min - self.last_seen_min > policy.eviction_ttl_mins
                )
            elif policy.training_id_keep_count:
                self.decay(policy.decay_rate)
                mask = self._cap_excess(
                    policy.training_id_keep_count, self.score
                )
        else:
            raise NotImplementedError(f"eviction policy {type(policy)}")
        return np.flatnonzero(mask).astype(np.int64)

    def _cap_excess(self, keep: int, priority: np.ndarray) -> np.ndarray:
        """Mask of in-use slots beyond the top-``keep`` by priority."""
        used_slots = np.flatnonzero(self.in_use)
        if len(used_slots) <= keep:
            return np.zeros(self.capacity, np.bool_)
        order = used_slots[np.argsort(-priority[used_slots], kind="stable")]
        mask = np.zeros(self.capacity, np.bool_)
        mask[order[keep:]] = True
        return mask

    # ------------------------------------------------------------ checkpoint
    def export_state(self) -> Dict[str, np.ndarray]:
        return {
            "count": self.count.copy(),
            "score": self.score.copy(),
            "last_seen_min": self.last_seen_min.copy(),
            "in_use": self.in_use.copy(),
        }

    def restore_state(self, state: Dict[str, np.ndarray]) -> None:
        self.count = np.asarray(state["count"], np.float64).copy()
        self.score = np.asarray(state["score"], np.float64).copy()
        self.last_seen_min = np.asarray(
            state["last_seen_min"], np.float64
        ).copy()
        self.in_use = np.asarray(state["in_use"], np.bool_).copy()
