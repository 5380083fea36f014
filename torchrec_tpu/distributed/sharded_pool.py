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

__all__ = ["ShardedTensorPool"]


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
