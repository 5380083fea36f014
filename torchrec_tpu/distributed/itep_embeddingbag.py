"""Sharded ITEP — in-training embedding pruning over sharded tables.

Capability parity with torchrec/distributed/itep_embeddingbag.py
(ShardedITEPEmbeddingBagCollection:70, ShardedITEPEmbeddingCollection:349):
the pruning controller composed with sharded pooled/sequence lookups.

TPU-first: the reference RW-shards per-table utilization buffers and
coordinates slot reassignment across ranks with collectives. Here the
controller state ({row_util, remap, iter} per table) is replicated and its
transitions are deterministic functions of the replicated KJT, so every
device computes the identical remap/reselection locally — zero collective
traffic for pruning, state equal on every device by construction (the same
SPMD argument as sharded managed collision, mc_embeddingbag.py). Remapped
slots flow into the standard Sharded{EBC,EC} width-class program; the
physical tables are sized ``physical_rows``, so pruning bounds per-device
lookup work by construction.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from torchrec_tpu.ops.lookup import roll_rows as _roll_rows

from torchrec_tpu.distributed.embedding import ShardedEmbeddingCollection
from torchrec_tpu.distributed.embeddingbag import ShardedEmbeddingBagCollection
from torchrec_tpu.distributed.types import (
    EmbeddingModuleShardingPlan,
    ShardingEnv,
)
from torchrec_tpu.modules.itep import (
    ITEPEmbeddingBagCollection,
    ITEPEmbeddingCollection,
    itep_remap_kjt,
)
from torchrec_tpu.sparse import KeyedJaggedTensor

__all__ = [
    "ShardedITEPEmbeddingBagCollection",
    "ShardedITEPEmbeddingCollection",
]


class ShardedITEPEmbeddingBagCollection:
    """Sharded pooled ITEP (reference distributed/itep_embeddingbag.py:70)."""

    def __init__(
        self,
        itep_ebc: ITEPEmbeddingBagCollection,
        plan: EmbeddingModuleShardingPlan,
        env: ShardingEnv,
    ):
        self._itep_ebc = itep_ebc
        self._iteps = itep_ebc.itep_modules
        self._f2t = itep_ebc.feature_to_table
        self._sebc = ShardedEmbeddingBagCollection(
            itep_ebc.embedding_bag_collection, plan, env
        )
        self._env = env

    @property
    def sharded_ebc(self) -> ShardedEmbeddingBagCollection:
        return self._sebc

    def init(self, key: jax.Array):
        return self._sebc.init(key)

    def init_itep_state(self):
        return self._itep_ebc.init_itep_state()

    def init_optimizer(self, params, optimizer):
        return self._sebc.init_optimizer(params, optimizer)

    def apply_local(
        self, params, itep_states, kjt: KeyedJaggedTensor, train: bool = True
    ):
        """Inside shard_map: replicated remap -> sharded pooled lookup.
        Returns (pooled [B_local, total_dim], new_states, remapped KJT —
        feed the remapped KJT to apply_gradients_local)."""
        remapped, new_states = itep_remap_kjt(
            self._iteps, self._f2t, itep_states, kjt, train
        )
        pooled = self._sebc.apply_local(params, remapped)
        return pooled, new_states, remapped

    def apply_gradients_local(
        self, params, opt_states, optimizer, remapped_kjt, out_grad, lr=None
    ):
        return self._sebc.apply_gradients_local(
            params, opt_states, optimizer, remapped_kjt, out_grad, lr=lr
        )

    # ----------------------------------------------------------- standalone
    def apply(self, params, itep_states, kjt: KeyedJaggedTensor, train=True):
        """Standalone wrapper: (pooled values [B, total_dim], new states)."""
        from jax import shard_map

        env = self._env
        P = jax.sharding.PartitionSpec
        param_specs = self._sebc._param_specs()
        state_specs = jax.tree_util.tree_map(lambda _: P(), itep_states)

        @jax.jit
        def run(p, s, k):
            fn = shard_map(
                lambda p, s, k: self.apply_local(p, s, k, train=train)[:2],
                mesh=env.mesh,
                in_specs=(param_specs, state_specs, P()),
                out_specs=(P(env.shard_axis), state_specs),
                check_vma=False,
            )
            return fn(p, s, k)

        return run(params, itep_states, kjt)


class ShardedITEPEmbeddingCollection:
    """Sharded sequence ITEP (reference distributed/itep_embeddingbag.py:349)."""

    def __init__(
        self,
        itep_ec: ITEPEmbeddingCollection,
        plan: EmbeddingModuleShardingPlan,
        env: ShardingEnv,
    ):
        self._itep_ec = itep_ec
        self._iteps = itep_ec.itep_modules
        self._f2t = itep_ec.feature_to_table
        self._sec = ShardedEmbeddingCollection(
            itep_ec.embedding_collection, plan, env
        )
        self._env = env

    @property
    def sharded_ec(self) -> ShardedEmbeddingCollection:
        return self._sec

    def init(self, key: jax.Array):
        return self._sec.init(key)

    def init_itep_state(self):
        return self._itep_ec.init_itep_state()

    def init_optimizer(self, params, optimizer):
        return self._sec.init_optimizer(params, optimizer)

    def apply_local(
        self, params, itep_states, kjt: KeyedJaggedTensor, train: bool = True
    ):
        """Inside shard_map: replicated remap -> sharded sequence lookup.
        Returns (per-class row streams, new_states, remapped KJT)."""
        remapped, new_states = itep_remap_kjt(
            self._iteps, self._f2t, itep_states, kjt, train
        )
        streams = self._sec.apply_local(params, remapped)
        return streams, new_states, remapped

    def apply_gradients_local(
        self, params, opt_states, optimizer, remapped_kjt, cot, lr=None
    ):
        return self._sec.apply_gradients_local(
            params, opt_states, optimizer, remapped_kjt, cot, lr=lr
        )

    # ----------------------------------------------------------- standalone
    def apply(self, params, itep_states, kjt: KeyedJaggedTensor, train=True):
        """Standalone wrapper: (Dict[str, JaggedTensor], new states)."""
        from jax import shard_map

        from torchrec_tpu.sparse import JaggedTensor

        env = self._env
        P = jax.sharding.PartitionSpec
        sec = self._sec
        param_specs = sec._param_specs()
        state_specs = jax.tree_util.tree_map(lambda _: P(), itep_states)
        kjt_mat = kjt.select_keys(sec._feature_names).materialize()
        stream_specs = {
            **{c.key: P() for c in sec._classes},
            **({"dp": P()} if sec._dp is not None else {}),
        }

        @jax.jit
        def run(p, s, k):
            fn = shard_map(
                lambda p, s, k: self.apply_local(p, s, k, train=train)[:2],
                mesh=env.mesh,
                in_specs=(param_specs, state_specs, P()),
                out_specs=(stream_specs, state_specs),
                check_vma=False,
            )
            return fn(p, s, k)

        streams, new_states = run(params, itep_states, kjt_mat)
        rows = sec.rows_per_feature(streams)
        offsets_pk = kjt_mat.offset_per_key()
        lengths = kjt_mat.lengths()
        out = {}
        for fi, name in enumerate(sec._feature_names):
            start = offsets_pk[fi]
            out[name] = JaggedTensor(
                values=_roll_rows(rows[fi], start), lengths=lengths[fi]
            )
        return out, new_states



