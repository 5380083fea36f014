"""Sharded managed-collision embedding (ZCH under SPMD sharding).

Capability parity with torchrec/distributed/mc_modules.py
(ShardedManagedCollisionCollection:208) and mc_embeddingbag.py
(ShardedMCEmbeddingBagCollection): collision remapping composed with a
sharded embedding lookup.

TPU-first design difference: the reference RW-shards the remapper and
routes ids to their owner twice (a2a -> remap -> a2a). Here the MCH map is
small (a few MB at zch_size ~1e6) and its state transitions are
DETERMINISTIC, so every device carries a replicated copy and remaps
locally — zero collective traffic for remapping, identical state on every
device by construction (SPMD). The remapped slots then flow into the
standard ShardedEmbeddingBagCollection program; evicted slots reset their
rows directly on the owning device's local blob.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.distributed.embeddingbag import ShardedEmbeddingBagCollection
from torchrec_tpu.distributed.types import (
    EmbeddingModuleShardingPlan,
    ShardingEnv,
)
from torchrec_tpu.modules.mc_embedding_modules import (
    ManagedCollisionEmbeddingBagCollection,
)
from torchrec_tpu.sparse import KeyedJaggedTensor

__all__ = ["ShardedManagedCollisionEmbeddingBagCollection"]


class ShardedManagedCollisionEmbeddingBagCollection:
    """Sharded MC-EBC: RW-sharded remappers feeding the sharded EBC (reference distributed/mc_embeddingbag.py)."""

    def __init__(
        self,
        mc_ebc: ManagedCollisionEmbeddingBagCollection,
        plan: EmbeddingModuleShardingPlan,
        env: ShardingEnv,
    ):
        self._mc_ebc = mc_ebc
        self._mcc = mc_ebc.managed_collision_collection
        self._sebc = ShardedEmbeddingBagCollection(
            mc_ebc.embedding_bag_collection, plan, env
        )
        self._env = env

    @property
    def sharded_ebc(self) -> ShardedEmbeddingBagCollection:
        return self._sebc

    def init(self, key: jax.Array):
        return self._sebc.init(key)

    def init_mc_state(self):
        return self._mcc.init_state()

    def init_optimizer(self, params, optimizer):
        return self._sebc.init_optimizer(params, optimizer)

    def _reset_evicted_local(self, params, evicted: Dict[str, jnp.ndarray]):
        """Zero evicted rows on the owning device's local blob (inside
        shard_map) — shared with the sequence form."""
        from torchrec_tpu.distributed.mc_embedding import (
            reset_evicted_rows_local,
        )

        return reset_evicted_rows_local(
            self._sebc, params, evicted, self._env.shard_axis
        )

    def apply_local(
        self,
        params,
        mc_states,
        kjt: KeyedJaggedTensor,
        train: bool = True,
    ):
        """Inside shard_map: remap (replicated) -> reset evicted rows on
        local blobs -> sharded pooled lookup. Returns
        (pooled [B_local, total_dim], params', new_states)."""
        remapped, new_states = self._mcc.forward(mc_states, kjt, train=train)
        if train:
            params = self._reset_evicted_local(
                params, self._mcc.evicted_slots(new_states)
            )
        pooled = self._sebc.apply_local(params, remapped)
        return pooled, params, new_states

    def apply_gradients_local(
        self, params, opt_states, optimizer, remapped_kjt, out_grad, lr=None
    ):
        return self._sebc.apply_gradients_local(
            params, opt_states, optimizer, remapped_kjt, out_grad, lr=lr
        )

    def remap(self, mc_states, kjt: KeyedJaggedTensor) -> KeyedJaggedTensor:
        out, _ = self._mcc.forward(mc_states, kjt, train=False)
        return out

    # ----------------------------------------------------------- standalone
    def apply(self, params, mc_states, kjt: KeyedJaggedTensor, train=True):
        """Standalone wrapper building the shard_map."""
        from jax import shard_map

        env = self._env
        P = jax.sharding.PartitionSpec
        param_specs = self._sebc._param_specs()
        state_specs = jax.tree_util.tree_map(lambda _: P(), mc_states)

        fn = shard_map(
            lambda p, s, k: self.apply_local(p, s, k, train=train),
            mesh=env.mesh,
            in_specs=(param_specs, state_specs, P()),
            out_specs=(P(env.shard_axis), param_specs, state_specs),
            check_vma=False,
        )
        return jax.jit(fn)(params, mc_states, kjt)
