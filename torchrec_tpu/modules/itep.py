"""ITEP — in-training embedding pruning.

Capability parity with torchrec/modules/itep_modules.py
(GenericITEPModule:78 — full-size logical tables backed by smaller physical
buffers; row utilization tracked per lookup; every ``pruning_interval``
iterations the top-utilization rows are (re)assigned physical slots) and
the wrapper ITEPEmbeddingBagCollection
(torchrec/modules/itep_embedding_modules.py:24).

TPU-first: state is an explicit pytree ({row_util [R], remap [R], iter});
reselection is a fixed-shape top-k under ``lax.cond`` so training stays in
one jitted program. Rows without a physical slot remap to the reserved
last slot (like ZCH's miss sentinel).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from torchrec_tpu.modules.embedding_modules import EmbeddingBagCollection
from torchrec_tpu.sparse import KeyedJaggedTensor, KeyedTensor

__all__ = [
    "GenericITEPModule",
    "ITEPEmbeddingBagCollection",
    "ITEPEmbeddingCollection",
    "itep_remap_kjt",
]

State = Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class GenericITEPModule:
    """Pruning controller for ONE logical id space.

    ``num_rows``: logical (unpruned) rows. ``physical_rows``: budget after
    pruning (reference table_name_to_pruning_ratio analog:
    physical = ceil(rows * (1 - ratio))). Slot ``physical_rows - 1`` is the
    shared miss slot.
    """

    num_rows: int
    physical_rows: int
    pruning_interval: int = 100
    util_decay: float = 0.99

    def init_state(self) -> State:
        # start with the identity prefix mapped (first physical_rows - 1
        # logical rows own slots) so cold-start lookups behave
        remap = jnp.where(
            jnp.arange(self.num_rows, dtype=jnp.int32) < self.physical_rows - 1,
            jnp.arange(self.num_rows, dtype=jnp.int32),
            jnp.int32(self.physical_rows - 1),
        )
        return {
            "row_util": jnp.zeros((self.num_rows,), jnp.float32),
            "remap": remap,
            "iter": jnp.zeros((), jnp.int32),
        }

    def remap(self, state: State, values: jnp.ndarray) -> jnp.ndarray:
        safe = jnp.clip(values, 0, self.num_rows - 1)
        return jnp.take(state["remap"], safe)

    def profile(
        self, state: State, values: jnp.ndarray, valid: Optional[jnp.ndarray] = None
    ) -> State:
        """Accumulate decayed utilization; reselect slots on interval."""
        safe = jnp.clip(values, 0, self.num_rows - 1)
        inc = jnp.ones_like(safe, jnp.float32)
        if valid is not None:
            inc = jnp.where(valid, inc, 0.0)
            safe = jnp.where(valid, safe, self.num_rows)
        util = state["row_util"] * self.util_decay
        util = util.at[safe].add(inc, mode="drop")
        new_iter = state["iter"] + 1
        state = {**state, "row_util": util, "iter": new_iter}
        return jax.lax.cond(
            new_iter % self.pruning_interval == 0,
            self._reselect,
            lambda s: s,
            state,
        )

    def _reselect(self, state: State) -> State:
        """Assign physical slots to the top-(physical_rows-1) rows by
        utilization; keep a stable slot for rows that stay selected."""
        p = self.physical_rows - 1
        util = state["row_util"]
        # top-p logical rows
        _, top_rows = jax.lax.top_k(util, p)
        selected = jnp.zeros((self.num_rows,), jnp.bool_).at[top_rows].set(True)
        old_remap = state["remap"]
        had_slot = (old_remap < p) & (
            old_remap >= 0
        )  # rows owning a physical slot now
        keep = selected & had_slot
        # free slots: those owned by non-kept rows
        slot_owner_keeps = jnp.zeros((p,), jnp.bool_).at[
            jnp.where(keep, old_remap, p)
        ].set(True, mode="drop")
        free_slots_mask = ~slot_owner_keeps  # [p]
        # newly selected rows needing slots, in top_k order
        new_rows_mask = selected & ~keep  # [R]
        # pair i-th free slot with i-th new row (fixed shape p)
        free_rank = jnp.cumsum(free_slots_mask.astype(jnp.int32)) - 1
        free_slot_at = jnp.full((p,), p, jnp.int32).at[
            jnp.where(free_slots_mask, free_rank, p)
        ].set(jnp.arange(p, dtype=jnp.int32), mode="drop")
        new_row_flags = jnp.take(new_rows_mask, top_rows)  # [p] aligned to top order
        new_rank = jnp.cumsum(new_row_flags.astype(jnp.int32)) - 1
        new_row_at = jnp.full((p,), self.num_rows, jnp.int32).at[
            jnp.where(new_row_flags, new_rank, p)
        ].set(top_rows, mode="drop")
        n_pairs = jnp.minimum(
            jnp.sum(free_slots_mask.astype(jnp.int32)),
            jnp.sum(new_row_flags.astype(jnp.int32)),
        )
        pair_ok = jnp.arange(p, dtype=jnp.int32) < n_pairs
        assign_rows = jnp.where(pair_ok, new_row_at, self.num_rows)
        assign_slots = jnp.where(pair_ok, free_slot_at, p)

        remap = jnp.where(keep, old_remap, jnp.int32(p))  # default: miss slot
        remap = remap.at[assign_rows].set(assign_slots, mode="drop")
        return {**state, "remap": remap}


def itep_remap_kjt(
    iteps: Dict[str, GenericITEPModule],
    feature_to_table: Dict[str, str],
    itep_states: Dict[str, State],
    kjt: KeyedJaggedTensor,
    train: bool = True,
) -> Tuple[KeyedJaggedTensor, Dict[str, State]]:
    """Profile (train only) + remap a KJT's raw ids to physical slots.

    Shared by the module-level and sharded ITEP forms — under SPMD the
    controller state is replicated and its transitions are deterministic,
    so every device computes the identical remap with zero collective
    traffic (the reference instead RW-shards utilization buffers and
    syncs them: distributed/itep_embeddingbag.py:70)."""
    import numpy as np

    kjt = kjt.materialize()
    keys = kjt.keys()
    b = kjt.stride()
    f = kjt.num_keys
    seg = kjt.segment_ids()
    slot_feature = jnp.minimum(seg // b, f)
    values = kjt.values()
    valid = kjt.valid_mask()

    new_states = dict(itep_states)
    out_values = values
    for tname, module in iteps.items():
        feats = [
            i for i, key in enumerate(keys)
            if feature_to_table.get(key) == tname
        ]
        if not feats:
            continue
        member = np.zeros(f + 1, np.bool_)
        member[feats] = True
        mine = jnp.take(jnp.asarray(member), slot_feature) & valid
        if train:
            new_states[tname] = module.profile(
                itep_states[tname], values, valid=mine
            )
        slots = module.remap(
            new_states[tname] if train else itep_states[tname], values
        )
        out_values = jnp.where(mine, slots, out_values)
    remapped = KeyedJaggedTensor(
        keys=keys,
        values=out_values,
        lengths=kjt._lengths,
        weights=kjt.weights_or_none(),
    )
    return remapped, new_states


class ITEPEmbeddingBagCollection:
    """ITEP controller + EBC over PHYSICAL tables (reference
    itep_embedding_modules.py:24). The EBC's tables must be sized
    ``physical_rows`` per logical table."""

    def __init__(
        self,
        embedding_bag_collection: EmbeddingBagCollection,
        itep_modules: Dict[str, GenericITEPModule],
        feature_to_table: Dict[str, str],
    ):
        self._ebc = embedding_bag_collection
        self._iteps = dict(itep_modules)
        self._feature_to_table = dict(feature_to_table)

    @property
    def embedding_bag_collection(self) -> EmbeddingBagCollection:
        return self._ebc

    @property
    def itep_modules(self) -> Dict[str, GenericITEPModule]:
        return dict(self._iteps)

    @property
    def feature_to_table(self) -> Dict[str, str]:
        return dict(self._feature_to_table)

    def init(self, key: jax.Array):
        return self._ebc.init(key)

    def init_itep_state(self) -> Dict[str, State]:
        return {k: m.init_state() for k, m in self._iteps.items()}

    def apply(
        self,
        params,
        itep_states: Dict[str, State],
        kjt: KeyedJaggedTensor,
        train: bool = True,
    ) -> Tuple[KeyedTensor, Dict[str, State]]:
        remapped, new_states = itep_remap_kjt(
            self._iteps, self._feature_to_table, itep_states, kjt, train
        )
        return self._ebc.apply(params, remapped), new_states


class ITEPEmbeddingCollection:
    """ITEP controller + sequence EC over PHYSICAL tables (reference
    itep_embedding_modules.py:88): per-id rows from pruned tables."""

    def __init__(
        self,
        embedding_collection,
        itep_modules: Dict[str, GenericITEPModule],
        feature_to_table: Dict[str, str],
    ):
        self._ec = embedding_collection
        self._iteps = dict(itep_modules)
        self._feature_to_table = dict(feature_to_table)

    @property
    def embedding_collection(self):
        return self._ec

    @property
    def itep_modules(self) -> Dict[str, GenericITEPModule]:
        return dict(self._iteps)

    @property
    def feature_to_table(self) -> Dict[str, str]:
        return dict(self._feature_to_table)

    def init(self, key: jax.Array):
        return self._ec.init(key)

    def init_itep_state(self) -> Dict[str, State]:
        return {k: m.init_state() for k, m in self._iteps.items()}

    def apply(
        self,
        params,
        itep_states: Dict[str, State],
        kjt: KeyedJaggedTensor,
        train: bool = True,
    ):
        remapped, new_states = itep_remap_kjt(
            self._iteps, self._feature_to_table, itep_states, kjt, train
        )
        return self._ec.apply(params, remapped), new_states
