"""Sharded object pools: row-wise sharded id-addressed storage.

Capability parity with torchrec/distributed/tensor_pool.py +
keyed_jagged_tensor_pool.py and sharding/rw_*_pool_sharding.py (RW-sharded
updatable pools with lookup/update redistribution).

TPU-first: pool rows range-split over the shard axis, with TWO access
forms per pool:

* replicated-psum (``lookup_local``/``update_local``): masked local
  gather + psum — simplest SPMD form, wire cost O(world x ids); fine on
  a handful of chips.
* owner-exchange (``*_bucketized``): batch-sharded id streams routed to
  their owning devices over the shared KJT exchange machinery
  (input_dist.exchange/reverse_exchange — the reference's
  rw_*_pool_sharding a2a shape); each row crosses the wire twice
  regardless of world size — O(ids), the scalable default.
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

    # ---- bucketized (owner-exchange) path ------------------------------
    # wire cost O(ids): with BATCH-SHARDED id streams each requested row
    # crosses the wire twice (id to owner, row back) regardless of world
    # size — the reference's PooledEmbeddings/TensorPool a2a shape
    # (rw_tensor_pool_sharding.py) — where the replicated-psum form above
    # ships every row to every device (O(world x ids)). Preferred above
    # a handful of chips.

    def lookup_local_bucketized(
        self, state, ids: jnp.ndarray, a2a_factor: float = 2.0,
        mode: str | None = None,
    ):
        """THIS device's id batch [n] -> ([n, dim] rows, psum'd dropped
        count). Inside shard_map; ids beyond pool_size return zeros."""
        from torchrec_tpu.distributed.input_dist import (
            default_exchange_mode,
            exchange,
            reverse_exchange,
        )

        axis = self.env.shard_axis
        w = self.env.world_size
        local = self.rows_per_shard
        n = ids.shape[0]
        mode = mode or default_exchange_mode()
        valid = ids < self.pool_size
        owner = jnp.where(valid, ids // local, w).astype(jnp.int32)
        order = jnp.argsort(owner)
        s_owner = jnp.take(owner, order)
        s_ids = jnp.take(ids, order)
        recv_cap = -(-int(a2a_factor * max(n, 1)) // w) * w
        (rids,), rvalid, dropped, route = exchange(
            (s_owner, s_ids), recv_cap, axis, w, mode
        )
        d = jax.lax.axis_index(axis)
        lo = d * local
        vals = state["values"].reshape(local, self.dim)
        rows = jnp.take(
            vals, jnp.clip(rids - lo, 0, local - 1), axis=0
        )
        rows = jnp.where(rvalid[:, None], rows, 0.0)
        back = reverse_exchange(route, rows, axis, w)
        out = (
            jnp.zeros((n, self.dim), jnp.float32)
            .at[order]
            .set(back, unique_indices=True)
        )
        return out, jax.lax.psum(dropped, axis)

    def update_local_bucketized(
        self, state, ids: jnp.ndarray, rows: jnp.ndarray,
        a2a_factor: float = 2.0, mode: str | None = None,
    ):
        """Route (id, row) pairs to their owning devices and scatter
        there. Duplicate ids (within or across devices) keep ONE
        deterministic winner (the latest in the owner's received-stream
        order). Returns (new_state, psum'd dropped count)."""
        from torchrec_tpu.distributed.input_dist import (
            default_exchange_mode,
            exchange,
        )

        axis = self.env.shard_axis
        w = self.env.world_size
        local = self.rows_per_shard
        n = ids.shape[0]
        mode = mode or default_exchange_mode()
        valid = ids < self.pool_size
        owner = jnp.where(valid, ids // local, w).astype(jnp.int32)
        order = jnp.argsort(owner)
        (rids, rrows), rvalid, dropped, route = exchange(
            (
                jnp.take(owner, order),
                jnp.take(ids, order),
                jnp.take(rows, order, axis=0),
            ),
            -(-int(a2a_factor * max(n, 1)) // w) * w,
            axis,
            w,
            mode,
        )
        d = jax.lax.axis_index(axis)
        lo = d * local
        mine = rvalid & (rids >= lo) & (rids < lo + local)
        # keep-last dedup over the received stream (deterministic order)
        m = rids.shape[0]
        pos = jnp.arange(m, dtype=jnp.int32)
        tgt = jnp.where(mine, rids - lo, local)
        last_pos = jnp.full((local + 1,), -1, jnp.int32).at[tgt].max(
            pos, mode="drop"
        )
        mine = mine & (jnp.take(last_pos, tgt) == pos)
        idx = jnp.where(mine, rids - lo, local)
        vals = state["values"].reshape(local, self.dim)
        vals = vals.at[idx].set(rrows.astype(vals.dtype), mode="drop")
        return {"values": vals[None]}, jax.lax.psum(dropped, axis)

    def lookup_bucketized(self, state, ids: jnp.ndarray,
                          a2a_factor: float = 2.0):
        """Standalone wrapper: global [N] ids, batch-sharded exchange.
        ``a2a_factor`` bounds the per-device receive capacity (in units
        of the LOCAL batch); skewed owner distributions need a larger
        factor (up to ``world`` for fully-skewed ids) — overflow is
        surfaced in the returned dropped count, like the EC a2a."""
        from jax import shard_map

        P = jax.sharding.PartitionSpec
        fn = shard_map(
            lambda s, i: self.lookup_local_bucketized(
                s, i, a2a_factor=a2a_factor
            ),
            mesh=self.env.mesh,
            in_specs=(self._specs(), P(self.env.shard_axis)),
            out_specs=(P(self.env.shard_axis), P()),
            check_vma=False,
        )
        rows, dropped = jax.jit(fn)(state, ids)
        return rows, dropped

    def update_bucketized(self, state, ids: jnp.ndarray, rows,
                          a2a_factor: float = 2.0):
        from jax import shard_map

        P = jax.sharding.PartitionSpec
        ax = self.env.shard_axis
        fn = shard_map(
            lambda s, i, r: self.update_local_bucketized(
                s, i, r, a2a_factor=a2a_factor
            ),
            mesh=self.env.mesh,
            in_specs=(self._specs(), P(ax), P(ax)),
            out_specs=(self._specs(), P()),
            check_vma=False,
        )
        return jax.jit(fn)(state, ids, rows)

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

    # ---- bucketized (owner-exchange) path ------------------------------
    def lookup_local_bucketized(
        self, state, ids: jnp.ndarray, a2a_factor: float = 2.0,
        mode: str | None = None,
    ):
        """THIS device's id batch [n] -> ([n, F, max_len] ids, [n, F]
        lengths, psum'd dropped). O(ids) wire (see ShardedTensorPool)."""
        from torchrec_tpu.distributed.input_dist import (
            default_exchange_mode,
            exchange,
            reverse_exchange,
        )

        axis = self.env.shard_axis
        w = self.env.world_size
        local = self.rows_per_shard
        f = len(self.keys)
        n = ids.shape[0]
        mode = mode or default_exchange_mode()
        valid = ids < self.pool_size
        owner = jnp.where(valid, ids // local, w).astype(jnp.int32)
        order = jnp.argsort(owner)
        (rids,), rvalid, dropped, route = exchange(
            (jnp.take(owner, order), jnp.take(ids, order)),
            -(-int(a2a_factor * max(n, 1)) // w) * w,
            axis,
            w,
            mode,
        )
        d = jax.lax.axis_index(axis)
        lo = d * local
        idx = jnp.clip(rids - lo, 0, local - 1)
        vals = state["values"].reshape(local, f, self.max_len)
        lens = state["lengths"].reshape(local, f)
        v = jnp.where(
            rvalid[:, None, None], jnp.take(vals, idx, axis=0), 0
        )
        l = jnp.where(rvalid[:, None], jnp.take(lens, idx, axis=0), 0)
        # one transpose exchange per payload; flatten the id block so the
        # row payload stays 2-D
        back_v = reverse_exchange(
            route, v.reshape(-1, f * self.max_len), axis, w
        )
        back_l = reverse_exchange(route, l, axis, w)
        out_v = (
            jnp.zeros((n, f * self.max_len), jnp.int32)
            .at[order]
            .set(back_v, unique_indices=True)
            .reshape(n, f, self.max_len)
        )
        out_l = (
            jnp.zeros((n, f), jnp.int32)
            .at[order]
            .set(back_l, unique_indices=True)
        )
        return out_v, out_l, jax.lax.psum(dropped, axis)

    def update_local_bucketized(
        self, state, ids, dense, lens, a2a_factor: float = 2.0,
        mode: str | None = None,
    ):
        """Route (id, row) to owners and scatter there (keep-one winner
        in received-stream order). Returns (new_state, psum'd dropped)."""
        from torchrec_tpu.distributed.input_dist import (
            default_exchange_mode,
            exchange,
        )

        axis = self.env.shard_axis
        w = self.env.world_size
        local = self.rows_per_shard
        f = len(self.keys)
        n = ids.shape[0]
        mode = mode or default_exchange_mode()
        valid = ids < self.pool_size
        owner = jnp.where(valid, ids // local, w).astype(jnp.int32)
        order = jnp.argsort(owner)
        (rids, rdense, rlens), rvalid, dropped, route = exchange(
            (
                jnp.take(owner, order),
                jnp.take(ids, order),
                jnp.take(dense, order, axis=0).reshape(
                    n, f * self.max_len
                ),
                jnp.take(lens, order, axis=0),
            ),
            -(-int(a2a_factor * max(n, 1)) // w) * w,
            axis,
            w,
            mode,
        )
        d = jax.lax.axis_index(axis)
        lo = d * local
        mine = rvalid & (rids >= lo) & (rids < lo + local)
        m = rids.shape[0]
        pos = jnp.arange(m, dtype=jnp.int32)
        tgt = jnp.where(mine, rids - lo, local)
        last_pos = jnp.full((local + 1,), -1, jnp.int32).at[tgt].max(
            pos, mode="drop"
        )
        mine = mine & (jnp.take(last_pos, tgt) == pos)
        idx = jnp.where(mine, rids - lo, local)
        vals = state["values"].reshape(local, f, self.max_len)
        lengths = state["lengths"].reshape(local, f)
        vals = vals.at[idx].set(
            rdense.reshape(m, f, self.max_len).astype(jnp.int32),
            mode="drop",
        )
        lengths = lengths.at[idx].set(rlens.astype(jnp.int32), mode="drop")
        return (
            {"values": vals[None], "lengths": lengths[None]},
            jax.lax.psum(dropped, axis),
        )

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
