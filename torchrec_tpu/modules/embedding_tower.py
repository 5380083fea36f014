"""Embedding towers: pair an embedding collection with its interaction
module so they shard as a unit.

Capability parity with torchrec/modules/embedding_tower.py
(EmbeddingTower:39, EmbeddingTowerCollection:86). In the reference the
tower is a sharding boundary (embedding_tower_sharding.py places the whole
tower on one rank group); here the interaction runs on the (already
batch-sharded) pooled output, so "sharding as a unit" falls out of placing
the tower's tables table-wise on the same rank via the plan.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from torchrec_tpu.modules.embedding_modules import EmbeddingBagCollection
from torchrec_tpu.sparse import KeyedJaggedTensor, KeyedTensor

__all__ = ["EmbeddingTower", "EmbeddingTowerCollection"]

Params = Dict[str, jnp.ndarray]


class EmbeddingTower:
    """embedding module + interaction module (reference :39).

    ``interaction``: (params, pooled_values [B, sum_dims]) -> [B, out].
    """

    def __init__(
        self,
        embedding_module: EmbeddingBagCollection,
        interaction_init: Callable[[jax.Array], Params],
        interaction_apply: Callable[[Params, jnp.ndarray], jnp.ndarray],
    ):
        self.embedding = embedding_module
        self._i_init = interaction_init
        self._i_apply = interaction_apply

    def init(self, key: jax.Array) -> Params:
        params = {f"embedding.{k}": v for k, v in self.embedding.init(key).items()}
        params.update(
            {
                f"interaction.{k}": v
                for k, v in self._i_init(jax.random.fold_in(key, 1)).items()
            }
        )
        return params

    def apply(self, params: Params, kjt: KeyedJaggedTensor) -> jnp.ndarray:
        emb_params = {
            k[len("embedding."):]: v
            for k, v in params.items()
            if k.startswith("embedding.")
        }
        i_params = {
            k[len("interaction."):]: v
            for k, v in params.items()
            if k.startswith("interaction.")
        }
        kt = self.embedding.apply(emb_params, kjt)
        return self._i_apply(i_params, kt.values())


class EmbeddingTowerCollection:
    """Towers applied to disjoint feature subsets, outputs concatenated
    (reference :86)."""

    def __init__(self, towers: Sequence[EmbeddingTower]):
        if not towers:
            raise ValueError("at least one tower required")
        self.towers = list(towers)
        seen = set()
        for t in self.towers:
            for f in t.embedding.feature_names():
                if f in seen:
                    raise ValueError(f"feature {f!r} appears in two towers")
                seen.add(f)

    def init(self, key: jax.Array) -> Params:
        params: Params = {}
        for i, t in enumerate(self.towers):
            for k, v in t.init(jax.random.fold_in(key, i)).items():
                params[f"tower_{i}.{k}"] = v
        return params

    def apply(self, params: Params, kjt: KeyedJaggedTensor) -> jnp.ndarray:
        outs = []
        for i, t in enumerate(self.towers):
            sub = {
                k[len(f"tower_{i}."):]: v
                for k, v in params.items()
                if k.startswith(f"tower_{i}.")
            }
            outs.append(t.apply(sub, kjt.select_keys(t.embedding.feature_names())))
        return jnp.concatenate(outs, axis=1)
