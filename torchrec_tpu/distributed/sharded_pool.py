"""Sharded object pools: row-wise sharded id-addressed storage.

Capability parity with torchrec/distributed/tensor_pool.py +
keyed_jagged_tensor_pool.py and sharding/rw_*_pool_sharding.py (RW-sharded
updatable pools with lookup/update redistribution).

TPU-first: pool rows range-split over the shard axis; ``lookup`` is the
familiar masked-local-gather + psum (each id's row lives on exactly one
device, others contribute zeros — the a2a-free SPMD form), ``update``
scatters only on the owning device.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from torchrec_tpu.distributed.types import ShardingEnv

__all__ = ["ShardedTensorPool", "ShardedKeyedJaggedTensorPool"]


@dataclasses.dataclass(frozen=True)
class ShardedTensorPool:
    """RW-sharded TensorPool (reference distributed/tensor_pool.py:28)."""

    pool_size: int
    dim: int
    env: ShardingEnv

    @property
    def rows_per_shard(self) -> int:
        w = self.env.world_size
        return -(-self.pool_size // w)

    def init_state(self) -> Dict[str, jnp.ndarray]:
        w = self.env.world_size
        local = self.rows_per_shard
        sharding = jax.sharding.NamedSharding(
            self.env.mesh,
            jax.sharding.PartitionSpec(self.env.shard_axis, None, None),
        )
        return {
            "values": jax.device_put(
                jnp.zeros((w, local, self.dim), jnp.float32), sharding
            )
        }

    # ---- inside shard_map ---------------------------------------------------
    def lookup_local(self, state, ids: jnp.ndarray) -> jnp.ndarray:
        """[N] ids -> [N, dim] rows (replicated output via psum)."""
        d = jax.lax.axis_index(self.env.shard_axis)
        local = self.rows_per_shard
        lo = d * local
        mine = (ids >= lo) & (ids < lo + local) & (ids < self.pool_size)
        idx = jnp.clip(ids - lo, 0, local - 1)
        vals = state["values"].reshape(local, self.dim)
        rows = jnp.where(mine[:, None], jnp.take(vals, idx, axis=0), 0.0)
        return jax.lax.psum(rows, self.env.shard_axis)

    def update_local(self, state, ids: jnp.ndarray, rows: jnp.ndarray):
        d = jax.lax.axis_index(self.env.shard_axis)
        local = self.rows_per_shard
        lo = d * local
        mine = (ids >= lo) & (ids < lo + local) & (ids < self.pool_size)
        idx = jnp.where(mine, ids - lo, local)
        vals = state["values"].reshape(local, self.dim)
        vals = vals.at[idx].set(rows.astype(vals.dtype), mode="drop")
        return {"values": vals[None]}

    # ---- standalone wrappers -------------------------------------------------
    def _specs(self):
        P = jax.sharding.PartitionSpec
        return {"values": P(self.env.shard_axis, None, None)}

    def lookup(self, state, ids: jnp.ndarray) -> jnp.ndarray:
        from jax import shard_map

        P = jax.sharding.PartitionSpec
        fn = shard_map(
            lambda s, i: self.lookup_local(s, i),
            mesh=self.env.mesh,
            in_specs=(self._specs(), P()),
            out_specs=P(),
            check_vma=False,
        )
        return jax.jit(fn)(state, ids)

    def update(self, state, ids: jnp.ndarray, rows: jnp.ndarray):
        from jax import shard_map

        P = jax.sharding.PartitionSpec
        fn = shard_map(
            lambda s, i, r: self.update_local(s, i, r),
            mesh=self.env.mesh,
            in_specs=(self._specs(), P(), P()),
            out_specs=self._specs(),
            check_vma=False,
        )
        return jax.jit(fn)(state, ids, rows)


@dataclasses.dataclass(frozen=True)
class ShardedKeyedJaggedTensorPool:
    """RW-sharded KeyedJaggedTensorPool (reference
    distributed/keyed_jagged_tensor_pool.py:143 +
    sharding/rw_kjt_pool_sharding.py).

    Pool rows range-split over the shard axis; storage keeps the module's
    dense padded layout ([local, F, max_len] ids + [local, F] lengths) so
    ``lookup`` is one masked local gather + psum per array and ``update``
    scatters only on the owning device — no a2a needed in the SPMD form
    (the reference exchanges ids/values because each rank runs its own
    program; here one program sees every device's masked contribution).
    """

    pool_size: int
    keys: Tuple[str, ...]
    env: ShardingEnv
    max_len: int = 16

    @property
    def rows_per_shard(self) -> int:
        w = self.env.world_size
        return -(-self.pool_size // w)

    def init_state(self) -> Dict[str, jnp.ndarray]:
        w = self.env.world_size
        local = self.rows_per_shard
        f = len(self.keys)
        P = jax.sharding.PartitionSpec
        ax = self.env.shard_axis
        mesh = self.env.mesh
        return {
            "values": jax.device_put(
                jnp.zeros((w, local, f, self.max_len), jnp.int32),
                jax.sharding.NamedSharding(mesh, P(ax, None, None, None)),
            ),
            "lengths": jax.device_put(
                jnp.zeros((w, local, f), jnp.int32),
                jax.sharding.NamedSharding(mesh, P(ax, None, None)),
            ),
        }

    # ---- inside shard_map ----------------------------------------------
    def lookup_local(self, state, ids: jnp.ndarray):
        """[N] ids -> ([N, F, max_len] ids, [N, F] lengths), replicated."""
        d = jax.lax.axis_index(self.env.shard_axis)
        local = self.rows_per_shard
        lo = d * local
        mine = (ids >= lo) & (ids < lo + local) & (ids < self.pool_size)
        idx = jnp.clip(ids - lo, 0, local - 1)
        vals = state["values"].reshape(local, len(self.keys), self.max_len)
        lens = state["lengths"].reshape(local, len(self.keys))
        v = jnp.where(mine[:, None, None], jnp.take(vals, idx, axis=0), 0)
        l = jnp.where(mine[:, None], jnp.take(lens, idx, axis=0), 0)
        return (
            jax.lax.psum(v, self.env.shard_axis),
            jax.lax.psum(l, self.env.shard_axis),
        )

    def update_local(self, state, ids, dense, lens):
        """Scatter ``dense [B, F, max_len]`` / ``lens [B, F]`` at rows
        ``ids`` — only on the owning device. Repeated ids within one update
        batch keep the LAST occurrence (deterministic; XLA's scatter leaves
        the winner among duplicate indices undefined, so earlier duplicates
        are masked out before the scatter)."""
        d = jax.lax.axis_index(self.env.shard_axis)
        local = self.rows_per_shard
        lo = d * local
        mine = (ids >= lo) & (ids < lo + local) & (ids < self.pool_size)
        # keep-last dedup: position of the last occurrence of each id
        n = ids.shape[0]
        pos = jnp.arange(n, dtype=jnp.int32)
        tgt = jnp.where(ids < self.pool_size, ids, self.pool_size)
        last_pos = jnp.full(
            (self.pool_size + 1,), -1, jnp.int32
        ).at[tgt].max(pos, mode="drop")
        mine = mine & (jnp.take(last_pos, tgt) == pos)
        idx = jnp.where(mine, ids - lo, local)
        f = len(self.keys)
        vals = state["values"].reshape(local, f, self.max_len)
        lengths = state["lengths"].reshape(local, f)
        vals = vals.at[idx].set(dense.astype(jnp.int32), mode="drop")
        lengths = lengths.at[idx].set(lens.astype(jnp.int32), mode="drop")
        return {"values": vals[None], "lengths": lengths[None]}

    # ---- standalone wrappers ---------------------------------------------
    def _specs(self):
        P = jax.sharding.PartitionSpec
        ax = self.env.shard_axis
        return {
            "values": P(ax, None, None, None),
            "lengths": P(ax, None, None),
        }

    def lookup(self, state, ids: jnp.ndarray):
        """Fetch pool rows as a KJT batch of len(ids) examples."""
        from jax import shard_map

        from torchrec_tpu.modules.object_pool import padded_to_kjt

        P = jax.sharding.PartitionSpec
        fn = shard_map(
            lambda s, i: self.lookup_local(s, i),
            mesh=self.env.mesh,
            in_specs=(self._specs(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        vals, lens = jax.jit(fn)(state, ids)
        return padded_to_kjt(list(self.keys), vals, lens)

    def update(self, state, ids: jnp.ndarray, kjt):
        """Store each example's per-feature id lists at pool rows ``ids``."""
        from jax import shard_map

        from torchrec_tpu.modules.object_pool import _kjt_to_padded

        kjt = kjt.select_keys(list(self.keys)).materialize()
        dense = jnp.transpose(
            _kjt_to_padded(kjt, self.max_len), (1, 0, 2)
        )  # [B, F, max_len]
        lens = jnp.minimum(kjt.lengths(), self.max_len).T  # [B, F]
        P = jax.sharding.PartitionSpec
        fn = shard_map(
            lambda s, i, dv, ln: self.update_local(s, i, dv, ln),
            mesh=self.env.mesh,
            in_specs=(self._specs(), P(), P(), P()),
            out_specs=self._specs(),
            check_vma=False,
        )
        return jax.jit(fn)(state, ids, dense, lens)
