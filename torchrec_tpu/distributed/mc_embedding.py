"""Sharded managed-collision *sequence* embedding (ZCH + ShardedEC).

Capability parity with torchrec/distributed/mc_embedding.py
(ShardedManagedCollisionEmbeddingCollection:55): collision remapping
composed with a sharded unpooled EmbeddingCollection lookup.

Same TPU-first shape as the pooled form (distributed/mc_embeddingbag.py):
the MCH map is small and deterministic, so every device remaps a
replicated copy locally — zero collective traffic for the remap; remapped
slots flow into the standard ShardedEmbeddingCollection SPMD program and
evicted slots zero their rows directly on the owning device's local blob.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from torchrec_tpu.ops.lookup import roll_rows as _roll_rows
import numpy as np

from torchrec_tpu.distributed.embedding import ShardedEmbeddingCollection
from torchrec_tpu.distributed.types import (
    EmbeddingModuleShardingPlan,
    ShardingEnv,
)
from torchrec_tpu.modules.mc_embedding_modules import (
    ManagedCollisionEmbeddingCollection,
)
from torchrec_tpu.sparse import KeyedJaggedTensor

__all__ = [
    "ShardedManagedCollisionEmbeddingCollection",
    "reset_evicted_rows_local",
]


def reset_evicted_rows_local(
    sharded, params, evicted: Dict[str, jnp.ndarray], axis
):
    """Zero evicted rows on the owning device's local width-class blob
    (inside shard_map): slot s of table t lives on the device whose
    [id_lo, id_hi) row range covers s. Shared by the pooled and sequence
    sharded MC forms — both build on the same width-class layout."""
    d = jax.lax.axis_index(axis)
    collection = sharded._unsharded_collection()
    f_of_table = {}
    for i, ti in enumerate(collection._feature_table):
        f_of_table.setdefault(collection._tables[ti].name, i)
    new_params = dict(params)
    for c in sharded._classes:
        blob = new_params[c.key]
        flat = blob.reshape(blob.shape[-2], blob.shape[-1])
        id_lo = jnp.asarray(c.id_lo)[d]
        id_hi = jnp.asarray(c.id_hi)[d]
        blob_off = jnp.asarray(c.blob_off)[d]
        for tname, slots in evicted.items():
            if tname not in f_of_table:
                continue
            fi = f_of_table[tname]
            for blk in range(c.max_blocks):
                if c.vf_pos[fi, blk] < 0:
                    continue
                lo = id_lo[fi, blk]
                hi = id_hi[fi, blk]
                off = blob_off[fi, blk]
                mine = (slots >= lo) & (slots < hi) & (slots >= 0)
                local = jnp.where(mine, slots - lo + off, c.local_rows)
                flat = flat.at[local].set(
                    jnp.zeros((slots.shape[0], c.width), flat.dtype),
                    mode="drop",
                )
        new_params[c.key] = flat[None]
    return new_params


class ShardedManagedCollisionEmbeddingCollection:
    """Sharded MC-EC: replicated remappers feeding the sharded sequence EC
    (reference distributed/mc_embedding.py:55)."""

    def __init__(
        self,
        mc_ec: ManagedCollisionEmbeddingCollection,
        plan: EmbeddingModuleShardingPlan,
        env: ShardingEnv,
    ):
        self._mc_ec = mc_ec
        self._mcc = mc_ec.managed_collision_collection
        self._sec = ShardedEmbeddingCollection(
            mc_ec.embedding_collection, plan, env
        )
        self._env = env

    @property
    def sharded_ec(self) -> ShardedEmbeddingCollection:
        return self._sec

    def init(self, key: jax.Array):
        return self._sec.init(key)

    def init_mc_state(self):
        return self._mcc.init_state()

    def init_optimizer(self, params, optimizer):
        return self._sec.init_optimizer(params, optimizer)

    def apply_local(
        self,
        params,
        mc_states,
        kjt: KeyedJaggedTensor,
        train: bool = True,
    ):
        """Inside shard_map: remap (replicated) -> reset evicted rows on
        local blobs -> sharded sequence lookup. Returns (per-class row
        streams, params', new_states, remapped KJT — feed the remapped KJT
        to apply_gradients_local so the backward sees managed slots)."""
        remapped, new_states = self._mcc.forward(mc_states, kjt, train=train)
        if train:
            params = reset_evicted_rows_local(
                self._sec,
                params,
                self._mcc.evicted_slots(new_states),
                self._env.shard_axis,
            )
        streams = self._sec.apply_local(params, remapped)
        return streams, params, new_states, remapped

    def apply_gradients_local(
        self, params, opt_states, optimizer, remapped_kjt, cot, lr=None
    ):
        return self._sec.apply_gradients_local(
            params, opt_states, optimizer, remapped_kjt, cot, lr=lr
        )

    def remap(self, mc_states, kjt: KeyedJaggedTensor) -> KeyedJaggedTensor:
        out, _ = self._mcc.forward(mc_states, kjt, train=False)
        return out

    # ----------------------------------------------------------- standalone
    def apply(self, params, mc_states, kjt: KeyedJaggedTensor, train=True):
        """Standalone wrapper: returns (Dict[str, JaggedTensor], params',
        new mc states) like the unsharded module."""
        from jax import shard_map

        from torchrec_tpu.sparse import JaggedTensor

        env = self._env
        P = jax.sharding.PartitionSpec
        param_specs = self._sec._param_specs()
        state_specs = jax.tree_util.tree_map(lambda _: P(), mc_states)
        sec = self._sec
        kjt_mat = kjt.select_keys(sec._feature_names).materialize()

        stream_specs = {
            **{c.key: P() for c in sec._classes},
            **({"dp": P()} if sec._dp is not None else {}),
        }

        @jax.jit
        def run(params, mc_states, kjt):
            fn = shard_map(
                lambda p, s, k: self.apply_local(p, s, k, train=train)[:3],
                mesh=env.mesh,
                in_specs=(param_specs, state_specs, P()),
                out_specs=(stream_specs, param_specs, state_specs),
                check_vma=False,
            )
            return fn(params, mc_states, kjt)

        streams, new_params, new_states = run(params, mc_states, kjt_mat)
        rows = sec.rows_per_feature(streams)
        offsets_pk = kjt_mat.offset_per_key()
        lengths = kjt_mat.lengths()
        out = {}
        for fi, name in enumerate(sec._feature_names):
            start = offsets_pk[fi]
            out[name] = JaggedTensor(
                values=_roll_rows(rows[fi], start), lengths=lengths[fi]
            )
        return out, new_params, new_states



