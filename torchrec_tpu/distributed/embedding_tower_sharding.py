"""Sharded embedding towers — the tower as a PLACEMENT UNIT.

Capability parity with torchrec/distributed/embedding_tower_sharding.py
(ShardedEmbeddingTower:100, ShardedEmbeddingTowerCollection:472): a tower's
embedding tables AND its interaction module live on one rank, so pooled
embeddings never cross the wire — only the (much smaller) interaction
outputs do.

TPU-native design (SPMD, not the reference's MPMD rank-local modules):

* All towers' tables are merged into ONE ShardedEmbeddingBagCollection with
  a table-wise plan that colocates each tower's tables on its owner rank
  (``tower_sharding_plan``). The width-class blob layout keeps per-device
  parameter shapes uniform, so the program is identical on every device.
* ``pooled_local_partial`` gives each device the pooled values of the
  tables it owns (complete for TW tables, zero elsewhere) with NO
  collective.
* Every device runs every tower's interaction (same program — SPMD), but
  on non-owner devices the pooled input is zero and the output is masked
  to zero; a single ``psum_scatter`` over the concatenated tower outputs
  both selects the owner's values and batch-shards the result. The wire
  cost is sum(tower_out_dims), not sum(embedding_dims) — the same saving
  the reference's tower sharding buys with its all-to-all of interaction
  outputs (embedding_tower_sharding.py:472).
* Interaction parameters are replicated (they are small); their gradients
  are non-zero only on the owner and shard_map's transpose machinery psums
  them, so replicas stay in sync under any optax optimizer.

Training: ``apply_local``/``apply`` are pure jnp programs — differentiate
with ``jax.grad`` straight through. For very large tower tables, compose
per-tower ``ShardedEmbeddingBagCollection.apply_gradients`` (the fused
sparse-optimizer path) instead.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.distributed.embeddingbag import ShardedEmbeddingBagCollection
from torchrec_tpu.distributed.sharding_plan import tower_sharding_plan
from torchrec_tpu.distributed.types import (
    EmbeddingModuleShardingPlan,
    ShardingEnv,
)
from torchrec_tpu.modules.embedding_modules import EmbeddingBagCollection
from torchrec_tpu.modules.embedding_tower import (
    EmbeddingTower,
    EmbeddingTowerCollection,
)
from torchrec_tpu.sparse import KeyedJaggedTensor

__all__ = ["ShardedEmbeddingTowerCollection"]

Params = Dict[str, jnp.ndarray]


class ShardedEmbeddingTowerCollection:
    """Sharded EmbeddingTowerCollection (reference
    embedding_tower_sharding.py:472). Output matches
    ``EmbeddingTowerCollection.apply`` (concat of tower outputs), returned
    batch-sharded over ``env.shard_axis``."""

    def __init__(
        self,
        towers: "EmbeddingTowerCollection | Sequence[EmbeddingTower]",
        env: ShardingEnv,
        plan: Optional[EmbeddingModuleShardingPlan] = None,
    ):
        if isinstance(towers, EmbeddingTowerCollection):
            towers = towers.towers
        self.towers: List[EmbeddingTower] = list(towers)
        self._env = env
        if plan is None:
            plan = tower_sharding_plan(self.towers, env)
        self._plan = plan
        all_tables = [
            t for tower in self.towers for t in tower.embedding._tables
        ]
        weighted = {t.embedding.is_weighted() for t in self.towers}
        if len(weighted) != 1:
            raise ValueError("towers mix weighted and unweighted EBCs")
        self._ebc = EmbeddingBagCollection(
            all_tables, is_weighted=weighted.pop()
        )
        self._sebc = ShardedEmbeddingBagCollection(self._ebc, plan, env)
        # owner rank per tower = rank of its (colocated) tables
        self._owner: List[int] = []
        for tower in self.towers:
            # EVERY shard of every table must sit on one rank — checking
            # only shards[0] would let a row-wise table through and the
            # unreduced partial pooled sums would silently be wrong
            ranks = {
                s.rank
                for t in tower.embedding._tables
                for s in plan[t.name].shards
            }
            if len(ranks) != 1:
                raise ValueError(
                    f"tower tables span ranks {sorted(ranks)}; tower "
                    "sharding requires colocation (use tower_sharding_plan)"
                )
            self._owner.append(ranks.pop())
        # column index map: union pooled layout -> each tower's own
        # EBC KeyedTensor layout (feature order within the tower)
        union_off = {}
        off = 0
        for name, dim in zip(self._sebc.feature_names(), self._sebc._dims):
            union_off[name] = (off, dim)
            off += dim
        self._tower_cols: List[np.ndarray] = []
        for tower in self.towers:
            idx = []
            for fname in tower.embedding.feature_names():
                o, dim = union_off[fname]
                idx.extend(range(o, o + dim))
            self._tower_cols.append(np.asarray(idx, np.int32))

    # ------------------------------------------------------------- params
    def init(self, key: jax.Array) -> Params:
        unsharded = EmbeddingTowerCollection(self.towers).init(key)
        return self.shard_params(unsharded)

    def shard_params(self, unsharded: Params) -> Params:
        """Re-layout ``EmbeddingTowerCollection.init``-style params
        (``tower_{i}.embedding.* / tower_{i}.interaction.*``)."""
        per_table: Dict[str, np.ndarray] = {}
        params: Params = {}
        repl = jax.sharding.NamedSharding(
            self._env.mesh, jax.sharding.PartitionSpec()
        )
        for i, tower in enumerate(self.towers):
            emb = {
                k[len(f"tower_{i}.embedding."):]: v
                for k, v in unsharded.items()
                if k.startswith(f"tower_{i}.embedding.")
            }
            for t in tower.embedding._tables:
                per_table[t.name] = np.asarray(
                    tower.embedding.table_slice(emb, t.name)
                )
            for k, v in unsharded.items():
                if k.startswith(f"tower_{i}.interaction."):
                    params[k] = jax.device_put(jnp.asarray(v), repl)
        params.update(self._sebc.shard_from_tables(per_table))
        return params

    def unshard_params(self, params: Params) -> Params:
        """Back to EmbeddingTowerCollection layout (checkpoint analog)."""
        emb_params = {
            k: v for k, v in params.items() if not k.startswith("tower_")
        }
        tables = self._sebc.unshard_params(emb_params)
        out: Params = {}
        for i, tower in enumerate(self.towers):
            for g in tower.embedding._groups:
                out[f"tower_{i}.embedding.{g.key}"] = np.concatenate(
                    [tables[n] for n in g.table_names], axis=0
                )
            for k, v in params.items():
                if k.startswith(f"tower_{i}.interaction."):
                    out[k] = np.asarray(jax.device_get(v))
        return out

    # ------------------------------------------------------------ forward
    def apply_local(self, params: Params, kjt: KeyedJaggedTensor) -> jnp.ndarray:
        """Inside shard_map: replicated KJT in, batch-sharded
        ``[B_local, sum(tower_out_dims)]`` out. ONE collective, sized by
        the interaction outputs."""
        axis = self._env.shard_axis
        d = jax.lax.axis_index(axis)
        emb_params = {
            k: v for k, v in params.items() if not k.startswith("tower_")
        }
        pooled = self._sebc.pooled_local_partial(emb_params, kjt)  # [B, D]
        outs = []
        for i, tower in enumerate(self.towers):
            i_params = {
                k[len(f"tower_{i}.interaction."):]: v
                for k, v in params.items()
                if k.startswith(f"tower_{i}.interaction.")
            }
            x = jnp.take(pooled, jnp.asarray(self._tower_cols[i]), axis=1)
            y = tower._i_apply(i_params, x)  # [B, out_i]
            mask = (d == self._owner[i]).astype(y.dtype)
            outs.append(y * mask)
        y = jnp.concatenate(outs, axis=1)  # [B, sum_out]
        # selects the owner's values AND batch-shards in one collective
        return jax.lax.psum_scatter(y, axis, scatter_dimension=0, tiled=True)

    def apply(self, params: Params, kjt: KeyedJaggedTensor) -> jnp.ndarray:
        """Standalone wrapper: builds the shard_map, returns
        ``[B, sum(tower_out_dims)]`` batch-sharded over the shard axis."""
        from jax import shard_map

        P = jax.sharding.PartitionSpec
        axis = self._env.shard_axis
        specs = dict(self._sebc._param_specs())
        for k in params:
            if k.startswith("tower_"):
                specs[k] = P()

        @jax.jit
        def run(params, kjt):
            return shard_map(
                self.apply_local,
                mesh=self._env.mesh,
                in_specs=(specs, P()),
                out_specs=P(axis),
                check_vma=False,
            )(params, kjt)

        return run(params, kjt)
