"""Managed collision (ZCH): remap unbounded raw ids into a bounded slot
range with frequency/recency-based slot eviction.

Capability parity with torchrec/modules/mc_modules.py:
``MCHManagedCollisionModule`` (:1070 — sorted-raw-id map + binary-search
remap, history accumulation in ``profile`` (:1376), periodic
``_coalesce_history`` eviction (:1337)), eviction policies ``LFU`` (:647),
``LRU`` (:739), ``DistanceLFU`` (:875), and ``ManagedCollisionCollection``
(:346).

TPU-first design: the module is a pure function over an explicit state
pytree — every array is fixed-shape so the whole train step stays inside
one jitted program (the reference mutates registered buffers eagerly):

* ``sorted_raw_ids [Z]`` (int32, EMPTY sentinel = int32 max) with
  positionally-aligned ``remap [Z]`` slot ids, ``counts [Z]``,
  ``last_seen [Z]``.
* ``remap``: vectorized binary search (jnp.searchsorted); misses map to the
  reserved slot ``zch_size - 1`` (reference _mch_remap sentinel,
  mc_modules.py:1433-1436).
* ``profile``: ids accumulate into a fixed ring buffer; every
  ``eviction_interval`` steps a fixed-shape coalesce runs under
  ``lax.cond``: unique+count the history, match against the map, merge
  scores, keep the top-Z (reference
  _compute_selected_eviction_and_replacement_indices, :623), swap evicted
  slots to the new ids, and re-sort the map (reference :1256-1267).
* evicted slots surface in ``state["evicted_slots"]`` (padded with -1) so
  the embedding wrapper can reset those rows — the reference's ``evict()``
  contract (:1475).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.sparse import JaggedTensor, KeyedJaggedTensor

__all__ = [
    "MCHManagedCollisionModule",
    "ManagedCollisionCollection",
    "LFU_EVICTION",
    "LRU_EVICTION",
    "DISTANCE_LFU_EVICTION",
]

_EMPTY = jnp.int32(2**31 - 1)

LFU_EVICTION = "lfu"
LRU_EVICTION = "lru"
DISTANCE_LFU_EVICTION = "distance_lfu"

State = Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class MCHManagedCollisionModule:
    """Zero-collision-hash module for ONE id space.

    ``zch_size``: number of managed slots (output range ``[0, zch_size)``;
    slot ``zch_size - 1`` doubles as the miss sentinel, like the reference).
    ``history_size``: ring-buffer capacity for ids seen between evictions
    (>= ids-per-batch * eviction_interval for lossless profiling).
    """

    zch_size: int
    history_size: int = 4096
    eviction_interval: int = 1
    eviction_policy: str = LFU_EVICTION
    # LRU/DistanceLFU decay: score = count / (decay ** iters_since_seen)
    decay_exponent: float = 0.7

    def init_state(self) -> State:
        z = self.zch_size
        return {
            "sorted_raw_ids": jnp.full((z,), _EMPTY, jnp.int32),
            "remap": jnp.arange(z, dtype=jnp.int32),
            "counts": jnp.zeros((z,), jnp.int32),
            "last_seen": jnp.zeros((z,), jnp.int32),
            "history": jnp.full((self.history_size,), _EMPTY, jnp.int32),
            "history_fill": jnp.zeros((), jnp.int32),
            "iter": jnp.zeros((), jnp.int32),
            "evicted_slots": jnp.full((z,), -1, jnp.int32),
        }

    # ------------------------------------------------------------------ remap
    def remap(self, state: State, values: jnp.ndarray) -> jnp.ndarray:
        """Raw ids -> managed slots; misses -> zch_size - 1."""
        idx = jnp.searchsorted(state["sorted_raw_ids"], values).astype(jnp.int32)
        idx = jnp.minimum(idx, self.zch_size - 1)
        hit = jnp.take(state["sorted_raw_ids"], idx) == values
        slots = jnp.where(
            hit, jnp.take(state["remap"], idx), jnp.int32(self.zch_size - 1)
        )
        return slots

    # ---------------------------------------------------------------- profile
    def profile(
        self, state: State, values: jnp.ndarray, valid: Optional[jnp.ndarray] = None
    ) -> State:
        """Record ids into the history ring; evict/refresh on interval."""
        vals = values if valid is None else jnp.where(valid, values, _EMPTY)
        h = self.history_size
        n = vals.shape[0]
        start = state["history_fill"]
        pos = (start + jnp.arange(n, dtype=jnp.int32)) % h
        history = state["history"].at[pos].set(vals.astype(jnp.int32))
        new_iter = state["iter"] + 1
        state = {
            **state,
            "history": history,
            "history_fill": (start + n) % h,
            "iter": new_iter,
        }
        return jax.lax.cond(
            new_iter % self.eviction_interval == 0,
            self._coalesce,
            lambda s: {**s, "evicted_slots": jnp.full((self.zch_size,), -1, jnp.int32)},
            state,
        )

    def forward(
        self, state: State, values: jnp.ndarray, valid: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, State]:
        """profile (train only) then remap — reference forward(:1438)."""
        if train:
            state = self.profile(state, values, valid)
        return self.remap(state, values), state

    # --------------------------------------------------------------- coalesce
    def _coalesce(self, state: State) -> State:
        z, h = self.zch_size, self.history_size
        hist = state["history"]

        # unique + counts of the history (sorted; EMPTY pads to the end)
        sorted_hist = jnp.sort(hist)
        is_new = jnp.concatenate(
            [
                jnp.ones((1,), jnp.int32),
                (sorted_hist[1:] != sorted_hist[:-1]).astype(jnp.int32),
            ]
        )
        run_id = jnp.cumsum(is_new) - 1  # [h]
        uniq_ids = jnp.full((h,), _EMPTY, jnp.int32).at[run_id].min(
            sorted_hist, indices_are_sorted=True
        )
        uniq_counts = (
            jnp.zeros((h,), jnp.int32)
            .at[run_id]
            .add(jnp.ones((h,), jnp.int32), indices_are_sorted=True)
        )
        real = uniq_ids != _EMPTY
        uniq_counts = jnp.where(real, uniq_counts, 0)

        # match history uniques against the current map
        idx = jnp.minimum(
            jnp.searchsorted(state["sorted_raw_ids"], uniq_ids).astype(jnp.int32),
            z - 1,
        )
        matched = (jnp.take(state["sorted_raw_ids"], idx) == uniq_ids) & real
        # merge counts of matched ids into mch metadata (positional)
        counts = state["counts"].at[jnp.where(matched, idx, z)].add(
            jnp.where(matched, uniq_counts, 0), mode="drop"
        )
        last_seen = state["last_seen"].at[jnp.where(matched, idx, z)].max(
            jnp.where(matched, state["iter"], 0), mode="drop"
        )

        # candidate new ids = unmatched uniques
        cand = real & ~matched
        cand_counts = jnp.where(cand, uniq_counts, 0)

        # scores (float; EMPTY slots score 0 so they're evicted first)
        if self.eviction_policy == LFU_EVICTION:
            existing_score = counts.astype(jnp.float32)
            cand_score = cand_counts.astype(jnp.float32)
        elif self.eviction_policy == LRU_EVICTION:
            existing_score = jnp.where(
                state["sorted_raw_ids"] != _EMPTY,
                last_seen.astype(jnp.float32) + 1.0,
                0.0,
            )
            cand_score = jnp.where(
                cand, state["iter"].astype(jnp.float32) + 1.0, 0.0
            )
        else:  # DISTANCE_LFU: count decayed by distance-since-seen
            dist = (state["iter"] - last_seen).astype(jnp.float32)
            existing_score = counts.astype(jnp.float32) / jnp.power(
                2.0, dist * self.decay_exponent
            )
            cand_score = cand_counts.astype(jnp.float32)
        existing_score = jnp.where(
            state["sorted_raw_ids"] != _EMPTY, existing_score, -1.0
        )
        # the position holding output slot zch_size-1 is the miss sentinel —
        # a real id mapped there would be indistinguishable from a miss, so
        # it is never evictable/assignable (reference reserves the last slot,
        # mc_modules.py:1433-1436)
        existing_score = jnp.where(
            state["remap"] == self.zch_size - 1, jnp.inf, existing_score
        )
        cand_score = jnp.where(cand, cand_score, -jnp.inf)

        # keep top-Z of [existing ++ candidates] (reference :623-645)
        all_scores = jnp.concatenate([existing_score, cand_score])  # [z+h]
        order = jnp.argsort(-all_scores)  # descending, stable-ish
        in_top = jnp.zeros((z + h,), jnp.bool_).at[order[:z]].set(True)
        evict_mask = ~in_top[:z]  # existing slots leaving
        select_mask = in_top[z:] & cand  # candidates entering

        # pair k-th evicted slot with k-th selected candidate (fixed shape)
        evict_rank = jnp.cumsum(evict_mask.astype(jnp.int32)) - 1
        select_rank = jnp.cumsum(select_mask.astype(jnp.int32)) - 1
        n_pairs = jnp.minimum(
            jnp.sum(evict_mask.astype(jnp.int32)),
            jnp.sum(select_mask.astype(jnp.int32)),
        )
        k = min(z, h)
        # k-th evicted slot position
        evict_pos = jnp.full((k,), z, jnp.int32).at[
            jnp.where(evict_mask & (evict_rank < k), evict_rank, k)
        ].set(jnp.arange(z, dtype=jnp.int32), mode="drop")
        sel_pos = jnp.full((k,), h, jnp.int32).at[
            jnp.where(select_mask & (select_rank < k), select_rank, k)
        ].set(jnp.arange(h, dtype=jnp.int32), mode="drop")
        pair_valid = jnp.arange(k, dtype=jnp.int32) < n_pairs
        evict_pos = jnp.where(pair_valid, evict_pos, z)
        sel_pos = jnp.where(pair_valid, sel_pos, h)

        new_ids = jnp.take(
            jnp.concatenate([uniq_ids, _EMPTY[None]]), jnp.minimum(sel_pos, h)
        )
        new_counts = jnp.take(
            jnp.concatenate([cand_counts, jnp.zeros((1,), jnp.int32)]),
            jnp.minimum(sel_pos, h),
        )

        evicted_slot_ids = jnp.full((z,), -1, jnp.int32)
        evicted_slot_ids = evicted_slot_ids.at[
            jnp.minimum(jnp.arange(k, dtype=jnp.int32), z - 1)
        ].max(
            jnp.where(
                pair_valid,
                jnp.take(
                    jnp.concatenate([state["remap"], -jnp.ones((1,), jnp.int32)]),
                    jnp.minimum(evict_pos, z),
                ),
                -1,
            )
        )

        raw = state["sorted_raw_ids"].at[evict_pos].set(new_ids, mode="drop")
        counts = counts.at[evict_pos].set(new_counts, mode="drop")
        last_seen = last_seen.at[evict_pos].set(state["iter"], mode="drop")

        # re-sort the map by raw id, permuting metadata positionally
        perm = jnp.argsort(raw)
        return {
            **state,
            "sorted_raw_ids": jnp.take(raw, perm),
            "remap": jnp.take(state["remap"], perm),
            "counts": jnp.take(counts, perm),
            "last_seen": jnp.take(last_seen, perm),
            "history": jnp.full((h,), _EMPTY, jnp.int32),
            "history_fill": jnp.zeros((), jnp.int32),
            "evicted_slots": evicted_slot_ids,
        }

    def output_size(self) -> int:
        return self.zch_size


class ManagedCollisionCollection:
    """Per-table MCH modules applied to a KJT (reference
    ManagedCollisionCollection, mc_modules.py:346).

    ``managed_collision_modules``: table name -> MCHManagedCollisionModule.
    ``feature_to_table``: feature name -> table name.
    """

    def __init__(
        self,
        managed_collision_modules: Dict[str, MCHManagedCollisionModule],
        feature_to_table: Dict[str, str],
    ):
        self._modules = dict(managed_collision_modules)
        self._feature_to_table = dict(feature_to_table)
        for f, t in feature_to_table.items():
            if t not in self._modules:
                raise KeyError(f"feature {f!r} maps to unknown table {t!r}")

    def init_state(self) -> Dict[str, State]:
        return {name: m.init_state() for name, m in self._modules.items()}

    def forward(
        self,
        states: Dict[str, State],
        kjt: KeyedJaggedTensor,
        train: bool = True,
    ) -> Tuple[KeyedJaggedTensor, Dict[str, State]]:
        """Remap every feature's ids through its table's MCH module.

        Returns a KJT with remapped values plus the new states.
        """
        kjt = kjt.materialize()
        b = kjt.stride()
        f = kjt.num_keys
        seg = kjt.segment_ids()
        slot_feature = jnp.minimum(seg // b, f)
        values = kjt.values()
        valid = kjt.valid_mask()
        keys = kjt.keys()

        new_states = dict(states)
        out_values = values
        for tname, module in self._modules.items():
            feats = [
                i for i, key in enumerate(keys)
                if self._feature_to_table.get(key) == tname
            ]
            if not feats:
                continue
            member = np.zeros(f + 1, np.bool_)
            member[feats] = True
            mine = jnp.take(jnp.asarray(member), slot_feature) & valid
            if train:
                new_states[tname] = module.profile(
                    states[tname], values, valid=mine
                )
            slots = module.remap(new_states[tname] if train else states[tname], values)
            out_values = jnp.where(mine, slots, out_values)
        out = KeyedJaggedTensor(
            keys=keys,
            values=out_values,
            lengths=kjt._lengths,
            weights=kjt.weights_or_none(),
        )
        return out, new_states

    def evicted_slots(self, states: Dict[str, State]) -> Dict[str, jnp.ndarray]:
        """Table -> padded (-1) slot ids evicted at the last step; the
        embedding wrapper resets those rows (reference evict(), :1475)."""
        return {name: states[name]["evicted_slots"] for name in self._modules}

    def table_names(self) -> List[str]:
        return list(self._modules)
