"""Managed-collision embedding compositions.

Capability parity with torchrec/modules/mc_embedding_modules.py
(ManagedCollisionEmbeddingCollection:135,
ManagedCollisionEmbeddingBagCollection:173): remap raw ids through a
ManagedCollisionCollection, look up in the (bounded) embedding collection,
and reset embedding rows whose slots were evicted this step.

TPU-first: ``apply`` threads the MC state pytree explicitly and performs
row resets with a fixed-shape masked scatter (evicted slot lists are
padded with -1), so the whole composition stays inside one jitted step.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from torchrec_tpu.modules.embedding_modules import (
    EmbeddingBagCollection,
    EmbeddingCollection,
)
from torchrec_tpu.modules.mc_modules import ManagedCollisionCollection
from torchrec_tpu.sparse import JaggedTensor, KeyedJaggedTensor, KeyedTensor

__all__ = [
    "ManagedCollisionEmbeddingBagCollection",
    "ManagedCollisionEmbeddingCollection",
]


def _reset_evicted_rows(
    collection, params: Dict[str, jnp.ndarray], evicted: Dict[str, jnp.ndarray]
) -> Dict[str, jnp.ndarray]:
    """Zero embedding rows at evicted slots (padded -1 entries dropped).

    The reference resets evicted rows to their init distribution inside the
    lookup kernel (mc_embedding_modules.py _evict); zeroing matches its
    default zero-init for ZCH tables.
    """
    new_params = dict(params)
    for ti, t in enumerate(collection._tables):
        slots = evicted.get(t.name)
        if slots is None:
            continue
        gi, row_off = collection._table_group[ti]
        g = collection._groups[gi]
        rows = jnp.where(slots >= 0, slots + row_off, g.total_rows)
        new_params[g.key] = new_params[g.key].at[rows].set(
            jnp.zeros((slots.shape[0], g.dim), new_params[g.key].dtype),
            mode="drop",
        )
    return new_params


class ManagedCollisionEmbeddingBagCollection:
    """MC + EBC: forward(KJT) -> KeyedTensor over managed slots."""

    def __init__(
        self,
        embedding_bag_collection: EmbeddingBagCollection,
        managed_collision_collection: ManagedCollisionCollection,
    ):
        self._ebc = embedding_bag_collection
        self._mcc = managed_collision_collection

    @property
    def embedding_bag_collection(self) -> EmbeddingBagCollection:
        return self._ebc

    @property
    def managed_collision_collection(self) -> ManagedCollisionCollection:
        return self._mcc

    def init(self, key: jax.Array):
        return self._ebc.init(key)

    def init_mc_state(self):
        return self._mcc.init_state()

    def apply(
        self,
        params: Dict[str, jnp.ndarray],
        mc_states,
        kjt: KeyedJaggedTensor,
        train: bool = True,
    ) -> Tuple[KeyedTensor, Dict[str, jnp.ndarray], Dict]:
        """Returns (pooled KeyedTensor, params-with-evicted-rows-reset,
        new mc states)."""
        remapped, new_states = self._mcc.forward(mc_states, kjt, train=train)
        if train:
            params = _reset_evicted_rows(
                self._ebc, params, self._mcc.evicted_slots(new_states)
            )
        kt = self._ebc.apply(params, remapped)
        return kt, params, new_states

    def remap(self, mc_states, kjt: KeyedJaggedTensor) -> KeyedJaggedTensor:
        out, _ = self._mcc.forward(mc_states, kjt, train=False)
        return out


class ManagedCollisionEmbeddingCollection:
    """MC + EC: forward(KJT) -> Dict[str, JaggedTensor] over managed slots."""

    def __init__(
        self,
        embedding_collection: EmbeddingCollection,
        managed_collision_collection: ManagedCollisionCollection,
    ):
        self._ec = embedding_collection
        self._mcc = managed_collision_collection

    @property
    def embedding_collection(self) -> EmbeddingCollection:
        return self._ec

    @property
    def managed_collision_collection(self) -> ManagedCollisionCollection:
        return self._mcc

    def init(self, key: jax.Array):
        return self._ec.init(key)

    def init_mc_state(self):
        return self._mcc.init_state()

    def apply(
        self,
        params: Dict[str, jnp.ndarray],
        mc_states,
        kjt: KeyedJaggedTensor,
        train: bool = True,
    ) -> Tuple[Dict[str, JaggedTensor], Dict[str, jnp.ndarray], Dict]:
        remapped, new_states = self._mcc.forward(mc_states, kjt, train=train)
        if train:
            params = _reset_evicted_rows(
                self._ec, params, self._mcc.evicted_slots(new_states)
            )
        out = self._ec.apply(params, remapped)
        return out, params, new_states
