"""ShardedEmbeddingBagCollection — SPMD sharded pooled lookups.

Capability parity with torchrec/distributed/embeddingbag.py
(ShardedEmbeddingBagCollection:492: input_dist -> lookup -> output_dist) and
the sharding strategies of torchrec/distributed/sharding/ (tw/rw/cw/twrw/
grid, one file each) — re-designed as ONE uniform SPMD program:

* Every sharding type is compiled to the same structure: each (table,
  column-block) becomes a **virtual table** whose rows are range-assigned to
  devices. TW = one range on one device; RW = ranges on all devices; CW =
  blocks on different devices; TWRW/GRID = ranges within a host group. The
  *placement* lives in data arrays ``id_lo/id_hi/blob_off[device, feature,
  block]`` indexed by ``lax.axis_index`` at runtime, so the program is
  identical on every device (SPMD), only the data differs.

* Per width class, each device owns one packed ``[local_rows, width]`` blob
  (one buffer per device like FBGEMM TBE's per-rank table pack). Lookup =
  blocks-many gather+segment-sum passes over the id stream with non-local
  slots masked to an out-of-range segment; partial pooled sums are combined
  with ``psum_scatter`` over the shard axis, which simultaneously performs
  the reference's output_dist (PooledEmbeddingsReduceScatter,
  dist_data.py:1731) and hands each device its batch slice.

* Backward is the exact transpose: ``all_gather`` the pooled-grad batch,
  expand to per-slot gradient rows, dedup locally, and run the fused
  optimizer on the local blob — no cross-device traffic for the update
  itself (gradients for a row only exist on the row's owner).

* DATA_PARALLEL tables keep a replicated buffer; their (dense) gradients are
  psum'd before a replicated update — the reference's DENSE-kernel + DDP
  allreduce path (sharding/dp_sharding.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.distributed._layout import (
    ShardedCollectionBase,
    WidthClass as _WidthClass,
    build_width_classes,
)
from torchrec_tpu.distributed.types import (
    EmbeddingModuleShardingPlan,
    ShardingEnv,
)
from torchrec_tpu.modules.embedding_modules import EmbeddingBagCollection
from torchrec_tpu.ops.fused_optim import EmbeddingOptimizer
from torchrec_tpu.ops.lookup import dedup_rows_from_pooled
from torchrec_tpu.sparse import KeyedJaggedTensor, KeyedTensor
from torchrec_tpu.types import DataType, PoolingType, ShardingType

__all__ = ["ShardedEmbeddingBagCollection"]

Params = Dict[str, jnp.ndarray]


class ShardedEmbeddingBagCollection(ShardedCollectionBase):
    """Drop-in sharded version of EmbeddingBagCollection.

    All ``*_local`` methods run INSIDE ``shard_map`` (they use
    ``lax.axis_index``/``psum_scatter``/``all_gather`` on ``env.shard_axis``);
    ``apply``/``apply_gradients`` are standalone wrappers that build the
    shard_map themselves.
    """

    # (_class_gather/_class_fast_update/_SEGSCAN_TEST_CHUNK live on
    # ShardedCollectionBase — shared with ShardedEmbeddingCollection)

    def __init__(
        self,
        ebc: EmbeddingBagCollection,
        plan: EmbeddingModuleShardingPlan,
        env: ShardingEnv,
        qcomms=None,
        a2a_capacity_factor: float = 2.0,
        exchange_mode: Optional[str] = None,
    ):
        """``qcomms``: optional distributed.qcomms.QCommsConfig — casts the
        pooled-output collective (forward) and gradient all-gather
        (backward) payloads to reduced precision (reference QCommsConfig,
        fbgemm_qcomm_codec.py:55).

        ``a2a_capacity_factor``/``exchange_mode`` configure the bucketized
        input-distribution path (``apply_local_bucketized``): the receive
        buffer holds ``factor * cap_local * max_blocks`` slots, and the
        exchange primitive is ``"ragged"`` (TPU) or ``"padded"`` (portable);
        ``None`` auto-selects per backend. VBE dedup batches are skewed
        across the batch split (every key's examples start at position 0),
        so bucketized VBE typically needs a larger factor than the uniform
        -batch default — watch the returned ``dropped`` count."""
        self._ebc = ebc
        self._plan = plan
        self._env = env
        self._qcomms = qcomms
        self._a2a_factor = a2a_capacity_factor
        self._exchange_mode = exchange_mode
        # fused Pallas kernel tier (segscan backward, tile-row / pair-
        # packed storage) follows the module's max_unique_gradient_rows
        # contract — one kernel stack for every sharding type, like the
        # reference's per-shard BatchedFusedEmbeddingBag
        # (batched_embedding_kernel.py:3725)
        self._max_unique = getattr(ebc, "_max_unique", None)
        self._all_tables = list(ebc._tables)
        tables = {t.name: t for t in ebc._tables}
        f_count = len(ebc._feature_names)

        for name in tables:
            if name not in plan:
                raise ValueError(f"table {name!r} missing from plan")

        # ---- DP tables keep the unsharded grouped layout -------------------
        dp_names = [
            n for n, ps in plan.items()
            if ps.sharding_type == ShardingType.DATA_PARALLEL
        ]
        self._dp_ebc: Optional[EmbeddingBagCollection] = None
        self._dp_feature_ids: List[int] = []
        if dp_names:
            dp_tables = [tables[n] for n in dp_names]
            # inherit the fast window: the DP collection then runs the
            # single-chip count-matmul machinery (small tables are best
            # placed DATA_PARALLEL — replicated lookup + psum'd dense
            # accumulator, the reference's dp_sharding.py)
            self._dp_ebc = EmbeddingBagCollection(
                dp_tables, is_weighted=ebc.is_weighted(),
                max_unique_gradient_rows=self._max_unique,
            )
            dp_feats = set(self._dp_ebc.feature_names())
            self._dp_feature_ids = [
                i for i, f in enumerate(ebc._feature_names) if f in dp_feats
            ]
        self._dp = self._dp_ebc  # base-class hook for param (un)packing

        # ---- sharded tables -> width classes (shared layout compiler) ------
        feat_of_table: Dict[str, List[int]] = {}
        for i, ti in enumerate(ebc._feature_table):
            feat_of_table.setdefault(ebc._tables[ti].name, []).append(i)
        self._classes = build_width_classes(
            tables, plan, ebc._feature_names, feat_of_table, env.world_size,
            fast_window=self._max_unique,
            colocate_rowwise_state=getattr(
                ebc, "_colocate_rowwise_state", False
            ),
        )

        # output column offsets per logical feature
        dims = ebc.embedding_dims()
        self._dims = dims
        self._feature_col_off = np.concatenate([[0], np.cumsum(dims)])
        self._total_dim = int(self._feature_col_off[-1])
        self._poolings = [
            ebc._tables[ebc._feature_table[i]].pooling
            if hasattr(ebc._tables[ebc._feature_table[i]], "pooling")
            else PoolingType.SUM
            for i in range(f_count)
        ]

    # ------------------------------------------------------------------ util
    @property
    def unsharded(self) -> EmbeddingBagCollection:
        return self._ebc

    def feature_names(self) -> List[str]:
        return self._ebc.feature_names()

    def _unsharded_collection(self):
        return self._ebc

    # shard_params/unshard_params/init_optimizer/_param_specs inherited from
    # ShardedCollectionBase (distributed/_layout.py)

    # -------------------------------------------------------------- params
    def init(self, key: jax.Array) -> Params:
        """Initialize sharded params directly (per-table init then placed)."""
        return self.shard_params(self._ebc.init(key))

    # ------------------------------------------------------------ SPMD core
    def _slot_arrays(self, kjt: KeyedJaggedTensor):
        kjt = kjt.select_keys(self._ebc._feature_names)
        b = kjt.stride()
        f = len(self._ebc._feature_names)
        seg = kjt.segment_ids()
        slot_feature = jnp.minimum(seg // b, f)
        slot_batch = seg % jnp.int32(b)
        return kjt, b, f, seg, slot_feature, slot_batch

    def _class_pooled_local(
        self,
        c: _WidthClass,
        blob: jnp.ndarray,  # [local_rows, width] local view
        values: jnp.ndarray,
        weights: Optional[jnp.ndarray],
        slot_feature: jnp.ndarray,
        slot_batch: jnp.ndarray,
        b: int,
        d: jnp.ndarray,  # device index along shard axis
    ) -> jnp.ndarray:
        """Local partial pooled sums [num_vf * B, width]."""
        oob = c.num_vf * b
        id_lo = jnp.asarray(c.id_lo)[d]  # [F+1, MB]
        id_hi = jnp.asarray(c.id_hi)[d]
        blob_off = jnp.asarray(c.blob_off)[d]
        vf_pos = jnp.asarray(c.vf_pos)  # [F+1, MB]
        all_ids, all_seg, all_valid = [], [], []
        for blk in range(c.max_blocks):
            lo = jnp.take(id_lo[:, blk], slot_feature)
            hi = jnp.take(id_hi[:, blk], slot_feature)
            off = jnp.take(blob_off[:, blk], slot_feature)
            pos = jnp.take(vf_pos[:, blk], slot_feature)
            valid = (pos >= 0) & (values >= lo) & (values < hi)
            all_ids.append(jnp.clip(values - lo + off, 0, c.local_rows - 1))
            all_seg.append(jnp.where(valid, pos * b + slot_batch, oob))
            all_valid.append(valid)
        if self._fast_forward(c):
            wcat = (
                jnp.tile(weights, c.max_blocks)
                if weights is not None else None
            )
            return self._class_pooled_fast(
                c, blob,
                jnp.concatenate(all_ids), jnp.concatenate(all_seg),
                jnp.concatenate(all_valid), wcat, oob,
            )
        pooled = jnp.zeros((oob, c.width), jnp.float32)
        for blk in range(c.max_blocks):
            rows = self._class_gather(c, blob, all_ids[blk])
            if weights is not None:
                rows = rows * weights[:, None].astype(rows.dtype)
            pooled = pooled + jax.ops.segment_sum(
                rows, all_seg[blk], num_segments=oob
            )
        return self._depermute_pooled(c, pooled)

    def _fast_forward(self, c: _WidthClass) -> bool:
        """Compact sorted-window forward gate: fast-tier storage AND no
        small-table region in the class (small tables belong in
        DATA_PARALLEL placement, where the count-matmul machinery pools
        them; a small region inside a width class keeps the full-stream
        gather forward — correct, just not windowed)."""
        return c.scratch_rows > 0 and c.small_rows_max == 0

    def _class_pooled_fast(
        self, c: _WidthClass, blob, ids, seg, valid, wcat, oob: int
    ) -> jnp.ndarray:
        """Windowed forward for fast-tier classes: ONE id-sort of the
        local slot stream (the IDENTICAL expression in the segscan
        backward makes XLA CSE it across the train step), gather only the
        leading ``max_unique`` window of owned slots, one sorted
        segment-sum. The row gather is also the backward's ``old_rows``
        (CSE), so the update's own gather disappears — the single-chip
        compact-forward structure (modules/embedding_modules.py apply,
        v3 path) under sharding."""
        from torchrec_tpu.ops.lookup import sorted_window

        n = ids.shape[0]
        u = min(self._max_unique, n)
        R = c.local_rows
        sk, ss, sw = sorted_window(ids, seg, valid, R, oob, None, wcat)
        # no small region: the window starts at the stream head
        sids_u = sk[:u]
        sseg_u = ss[:u]
        sw_u = None if sw is None else sw[:u]
        in_range = sids_u < R
        rows = self._class_gather(c, blob, sids_u, ids_sorted=True)
        if sw_u is not None:
            rows = rows * sw_u[:, None].astype(rows.dtype)
        rows = jnp.where(in_range[:, None], rows, 0.0)
        pooled = jax.ops.segment_sum(
            rows, jnp.where(in_range, sseg_u, oob), num_segments=oob
        )
        return self._depermute_pooled(c, pooled)

    def _mean_scale(
        self, c: _WidthClass, lengths: jnp.ndarray, b: int
    ) -> Optional[jnp.ndarray]:
        """[num_vf, B] 1/length scale for MEAN-pooled features (or None)."""
        if self._ebc.is_weighted():
            return None
        mean_vfs = [
            i for i, fi in enumerate(c.vf_feature)
            if self._poolings[fi] == PoolingType.MEAN
        ]
        if not mean_vfs:
            return None
        scale = jnp.ones((c.num_vf, b), jnp.float32)
        inv = 1.0 / jnp.maximum(lengths.astype(jnp.float32), 1.0)  # [F, B]
        for i, fi in enumerate(c.vf_feature):
            if self._poolings[fi] == PoolingType.MEAN:
                scale = scale.at[i].set(inv[fi])
        return scale

    def _vbe_ctx(self, kjt: KeyedJaggedTensor, w: int, d):
        """(inverse_indices [F, B_out], local window [F, B_out_local],
        B_out, B_out_local) for a VBE KJT, or None. The sharded VBE design
        (reference dist_data.py:1444 VariableBatchPooledEmbeddingsAllToAll):
        pooling runs at the DEDUPLICATED per-key batch, the (small) dedup
        pooled partials are psum'd over the shard world, and each device
        expands only ITS output-batch window via the inverse indices."""
        if not kjt.variable_stride_per_key():
            return None
        return self._vbe_ctx_from_inv(kjt.inverse_indices(), w, d)

    def _vbe_ctx_from_inv(self, inv, w: int, d):
        """See :meth:`_vbe_ctx`; ``inv`` is the global [F, B_out] inverse
        indices (replicated) — used by the bucketized path, whose per-device
        inputs are raw batch-sharded arrays rather than a VBE KJT."""
        b_out = inv.shape[1]
        if b_out % w:
            raise ValueError(
                f"VBE output batch {b_out} not divisible by world {w}"
            )
        b_out_local = b_out // w
        inv_local = jax.lax.dynamic_slice(
            inv, (0, d * b_out_local), (inv.shape[0], b_out_local)
        )
        return inv, inv_local, b_out, b_out_local

    def apply_local(
        self, params: Params, kjt: KeyedJaggedTensor
    ) -> jnp.ndarray:
        """Sharded forward (inside shard_map): global/replicated KJT in,
        batch-sharded ``[B_local, total_dim]`` pooled values out (for VBE,
        ``[B_out_local, total_dim]`` over the inverse-indices output
        batch)."""
        axis = self._env.shard_axis
        w = self._env.world_size
        d = jax.lax.axis_index(axis)
        kjt, b, f, seg, slot_feature, slot_batch = self._slot_arrays(kjt)
        vbe = self._vbe_ctx(kjt, w, d)
        if vbe is None and b % w:
            raise ValueError(f"global batch {b} not divisible by world {w}")
        b_local = vbe[3] if vbe is not None else b // w
        values = kjt.values()
        weights = kjt.weights() if self._ebc.is_weighted() else None
        lengths = kjt.lengths()

        out = jnp.zeros((b_local, self._total_dim), jnp.float32)
        for c in self._classes:
            blob = params[c.key]
            blob = blob.reshape(blob.shape[-2], blob.shape[-1])  # [rows, w]
            pooled = self._class_pooled_local(
                c, blob, values, weights, slot_feature, slot_batch, b, d
            )  # [num_vf*B, width]
            scale = self._mean_scale(c, lengths, b)
            pooled = pooled.reshape(c.num_vf, b, c.width)
            if scale is not None:
                pooled = pooled * scale[:, :, None]
            out = self._class_output_dist(c, pooled, out, vbe)
        if self._dp_ebc is not None:
            dp_params = {
                g.key: params[f"dp_{g.key}"] for g in self._dp_ebc.groups
            }
            if vbe is not None:
                # DP + VBE: pool at the (small) dedup batch on every device,
                # then expand only the local output-batch window
                kt = self._dp_ebc.apply(dp_params, _strip_vbe(kjt))
                out = self._dp_vbe_expand(kt, out, vbe[1])
            else:
                # DP tables: lookup the local batch shard only
                kjt_local = _kjt_batch_shard(kjt, d, w)
                kt = self._dp_ebc.apply(dp_params, kjt_local)
                out = self._dp_write_cols(kt, out)
        return out

    def _class_output_dist(self, c, pooled, out, vbe):
        """Output dist for one width class. ``pooled``: [num_vf, B, width]
        mean-scaled partial sums. Non-VBE: reduce-scatter over the batch
        dim. VBE: psum the dedup pooled, expand the local output window via
        inverse indices (see :meth:`_vbe_ctx`). qcomms casts the wire
        payload either way."""
        q = self._qcomms
        if q is not None:
            from torchrec_tpu.distributed.qcomms import decode, encode
        if vbe is not None:
            _, inv_local, _, _ = vbe
            if q is not None:
                pooled = decode(
                    self._env.psum_shard(
                        encode(pooled, q.forward_precision)
                    ),
                    q.forward_precision,
                )
            else:
                pooled = self._env.psum_shard(pooled)
            for i, fi in enumerate(c.vf_feature):
                col = int(self._feature_col_off[fi]) + c.vf_col_start[i]
                rows = jnp.take(pooled[i], inv_local[fi], axis=0)
                out = jax.lax.dynamic_update_slice(out, rows, (0, col))
            return out
        # output dist: reduce-scatter over the batch dim
        pooled = jnp.transpose(pooled, (1, 0, 2))  # [B, num_vf, width]
        if q is not None:
            pooled = decode(
                self._env.psum_scatter_batch(
                    encode(pooled, q.forward_precision)
                ),
                q.forward_precision,
            )
        else:
            # two-level (host -> chip) when the env is hierarchical:
            # TWRW/GRID pooled partials reduce intra-host first
            # (reference twrw_sharding.py:460)
            pooled = self._env.psum_scatter_batch(pooled)
            # [B_local, num_vf, width]
        for i, fi in enumerate(c.vf_feature):
            col = int(self._feature_col_off[fi]) + c.vf_col_start[i]
            out = jax.lax.dynamic_update_slice(
                out, pooled[:, i, :], (0, col)
            )
        return out

    def _dp_write_cols(self, kt: KeyedTensor, out: jnp.ndarray):
        dp_dims = dict(zip(kt.keys(), kt.length_per_key()))
        off = 0
        for key in kt.keys():
            fi = self._ebc._feature_names.index(key)
            col = int(self._feature_col_off[fi])
            out = jax.lax.dynamic_update_slice(
                out,
                kt.values()[:, off : off + dp_dims[key]].astype(jnp.float32),
                (0, col),
            )
            off += dp_dims[key]
        return out

    def _dp_vbe_expand(
        self, kt: KeyedTensor, out: jnp.ndarray, inv_local: jnp.ndarray
    ):
        """Write DP columns expanded from dedup rows to the local output
        window (``inv_local``: [F, B_out_local])."""
        dp_dims = dict(zip(kt.keys(), kt.length_per_key()))
        off = 0
        for key in kt.keys():
            fi = self._ebc._feature_names.index(key)
            col = int(self._feature_col_off[fi])
            rows = jnp.take(
                kt.values()[:, off : off + dp_dims[key]].astype(jnp.float32),
                inv_local[fi],
                axis=0,
            )
            out = jax.lax.dynamic_update_slice(out, rows, (0, col))
            off += dp_dims[key]
        return out

    def pooled_local_partial(
        self, params: Params, kjt: KeyedJaggedTensor
    ) -> jnp.ndarray:
        """Local partial pooled sums ``[B, total_dim]`` (inside shard_map)
        with NO output dist: complete rows for locally-owned (TW) tables,
        zeros elsewhere. Building block for tower sharding — the tower's
        interaction runs colocated with its lookups and only the (small)
        interaction outputs hit the wire (reference
        embedding_tower_sharding.py contract)."""
        if self._dp_ebc is not None:
            raise NotImplementedError(
                "pooled_local_partial requires a plan without DATA_PARALLEL"
            )
        d = jax.lax.axis_index(self._env.shard_axis)
        kjt, b, f, seg, slot_feature, slot_batch = self._slot_arrays(kjt)
        values = kjt.values()
        weights = kjt.weights() if self._ebc.is_weighted() else None
        lengths = kjt.lengths()
        out = jnp.zeros((b, self._total_dim), jnp.float32)
        for c in self._classes:
            blob = params[c.key]
            blob = blob.reshape(blob.shape[-2], blob.shape[-1])
            pooled = self._class_pooled_local(
                c, blob, values, weights, slot_feature, slot_batch, b, d
            ).reshape(c.num_vf, b, c.width)
            scale = self._mean_scale(c, lengths, b)
            if scale is not None:
                # 1/len is linear in the partial sums — safe pre-reduction
                pooled = pooled * scale[:, :, None]
            pooled = jnp.transpose(pooled, (1, 0, 2))
            for i, fi in enumerate(c.vf_feature):
                col = int(self._feature_col_off[fi]) + c.vf_col_start[i]
                out = jax.lax.dynamic_update_slice(
                    out, pooled[:, i, :], (0, col)
                )
        return out

    def _backward_streams(
        self, kjt: KeyedJaggedTensor, out_grad: jnp.ndarray
    ) -> Dict[str, Tuple]:
        """Shared backward prefix (inside shard_map): gather the pooled
        cotangent and build each class's local slot stream. Returns
        ``{class key: (ids, seg, valid, weights_cat, pg_flat)}``."""
        axis = self._env.shard_axis
        w = self._env.world_size
        d = jax.lax.axis_index(axis)
        kjt, b, f, seg, slot_feature, slot_batch = self._slot_arrays(kjt)
        vbe = self._vbe_ctx(kjt, w, d)
        values = kjt.values()
        weights = kjt.weights() if self._ebc.is_weighted() else None
        lengths = kjt.lengths()
        # transpose of psum_scatter = all_gather over batch; qcomms casts
        # the gradient payload (with optional loss scale for fp16)
        if self._qcomms is not None:
            from torchrec_tpu.distributed.qcomms import decode, encode

            q = self._qcomms
            scale = q.backward_loss_scale
            payload = out_grad * scale if scale else out_grad
            full_grad = decode(
                self._env.all_gather_batch(
                    encode(payload, q.backward_precision)
                ),
                q.backward_precision,
            )
            full_grad = full_grad / scale if scale else full_grad
        else:
            full_grad = self._env.all_gather_batch(
                out_grad
            )  # [B, total_dim]

        streams: Dict[str, Tuple] = {}
        for c in self._classes:
            oob = c.num_vf * b
            # [num_vf, B, width] mean-scaled pooled-grad for this class
            # (VBE: collapsed onto dedup positions via inverse indices)
            pg = self._class_pooled_grad(c, full_grad, b, vbe, lengths)
            pg_flat = pg.reshape(oob, c.width)

            id_lo = jnp.asarray(c.id_lo)[d]
            id_hi = jnp.asarray(c.id_hi)[d]
            blob_off = jnp.asarray(c.blob_off)[d]
            vf_pos = jnp.asarray(c.vf_pos)
            all_ids = []
            all_seg = []
            all_valid = []
            for blk in range(c.max_blocks):
                lo = jnp.take(id_lo[:, blk], slot_feature)
                hi = jnp.take(id_hi[:, blk], slot_feature)
                off = jnp.take(blob_off[:, blk], slot_feature)
                pos = jnp.take(vf_pos[:, blk], slot_feature)
                valid = (pos >= 0) & (values >= lo) & (values < hi)
                local_id = jnp.clip(values - lo + off, 0, c.local_rows - 1)
                all_ids.append(local_id)
                all_seg.append(jnp.where(valid, pos * b + slot_batch, oob))
                all_valid.append(valid)
            streams[c.key] = (
                jnp.concatenate(all_ids),
                jnp.concatenate(all_seg),
                jnp.concatenate(all_valid),
                (
                    jnp.tile(weights, c.max_blocks)
                    if weights is not None
                    else None
                ),
                pg_flat,
            )
        return streams

    def sparse_grads_local(
        self, kjt: KeyedJaggedTensor, out_grad: jnp.ndarray
    ) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
        """Transpose of apply_local: batch-sharded [B_local, total_dim]
        cotangent -> per-class local (unique_ids, unique_grads)."""
        streams = self._backward_streams(kjt, out_grad)
        grads: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        for c in self._classes:
            ids, seg, valid, wcat, pg_flat = streams[c.key]
            # int-only streams into the sorted dedup: gradient rows are
            # gathered from the SMALL pg_flat in sorted order and run-summed
            # sorted (the slot-order [N, D] materialization + unsorted
            # segment-sum this used to do measured ~3x slower); POSITION
            # layout skips the rank-compaction scatter (optimizer gets
            # ids_sorted=False)
            uids, ugrads = dedup_rows_from_pooled(
                ids, seg, pg_flat, valid, c.local_rows,
                weights=wcat, compact=False,
            )
            grads[c.key] = (uids, ugrads)
        return grads

    def _class_pooled_grad(self, c, full_grad, b, vbe, lengths):
        """[num_vf, b, width] mean-scaled dedup-level pooled cotangent for
        one width class from the gathered [B(_out), total_dim] gradient.
        VBE: transpose of the inverse-indices expansion = segment_sum of
        output-batch cotangents onto each key's dedup positions."""
        cols = []
        for i, fi in enumerate(c.vf_feature):
            g = jax.lax.dynamic_slice(
                full_grad,
                (0, int(self._feature_col_off[fi]) + c.vf_col_start[i]),
                (full_grad.shape[0], c.width),
            )
            if vbe is not None:
                g = jax.ops.segment_sum(g, vbe[0][fi], num_segments=b)
            cols.append(g)
        pg = jnp.stack(cols, axis=0)
        scale = self._mean_scale(c, lengths, b)
        if scale is not None:
            pg = pg * scale[:, :, None]
        return pg

    def apply_gradients_local(
        self,
        params: Params,
        opt_states: Dict[str, Dict[str, jnp.ndarray]],
        optimizer: EmbeddingOptimizer,
        kjt: KeyedJaggedTensor,
        out_grad: jnp.ndarray,
        lr=None,
    ) -> Tuple[Params, Dict[str, Dict[str, jnp.ndarray]]]:
        """Fused sparse update on local blobs (inside shard_map)."""
        d = jax.lax.axis_index(self._env.shard_axis)
        streams = self._backward_streams(kjt, out_grad)
        new_params = dict(params)
        new_states = dict(opt_states)
        for c in self._classes:
            ids, seg, valid, wcat, pg_flat = streams[c.key]
            blob = params[c.key]
            state = {
                k: v.reshape(v.shape[1:]) for k, v in opt_states[c.key].items()
            }
            blob2 = blob.reshape(blob.shape[-2], blob.shape[-1])
            fast = self._class_fast_update(
                c, blob2, state, optimizer, ids, seg, valid, wcat,
                pg_flat, d, lr,
            )
            if fast is None:
                uids, ugrads = dedup_rows_from_pooled(
                    ids, seg, pg_flat, valid, c.local_rows,
                    weights=wcat, compact=False,
                )
                new_blob, new_state = self._class_generic_update(
                    c, blob2, state, optimizer, uids, ugrads, lr
                )
            else:
                new_blob, new_state = fast
            new_params[c.key] = new_blob[None]
            new_states[c.key] = {k: v[None] for k, v in new_state.items()}
        if self._dp_ebc is not None:
            axis = self._env.shard_axis
            w = self._env.world_size
            d = jax.lax.axis_index(axis)
            kjt_sel, b, f, _, _, _ = self._slot_arrays(kjt)
            vbe = self._vbe_ctx(kjt_sel, w, d)
            if vbe is not None:
                # DP + VBE: dense_grads over the full dedup batch with the
                # LOCAL window's cotangents collapsed onto dedup positions;
                # the accumulator psum below sums the per-device partials
                kjt_local = _strip_vbe(kjt_sel)
            else:
                kjt_local = _kjt_batch_shard(kjt_sel, d, w)
            # grads of the DP columns, local batch
            dp_grads_cols = []
            dp_keys = self._dp_ebc.feature_names()
            for key in dp_keys:
                fi = self._ebc._feature_names.index(key)
                col = int(self._feature_col_off[fi])
                g = jax.lax.dynamic_slice(
                    out_grad, (0, col), (out_grad.shape[0], self._dims[fi])
                )
                if vbe is not None:
                    g = jax.ops.segment_sum(
                        g, vbe[1][fi], num_segments=b
                    )
                dp_grads_cols.append(g)
            kt_grad = jnp.concatenate(dp_grads_cols, axis=1)
            dp_params = {
                g.key: params[f"dp_{g.key}"] for g in self._dp_ebc.groups
            }
            dp_states = {
                g.key: opt_states[f"dp_{g.key}"] for g in self._dp_ebc.groups
            }
            dg = self._dp_ebc.dense_accumulators(kjt_local, kt_grad)
            for g in self._dp_ebc.groups:
                # combine updates across devices: psum the dense accumulator
                # then a replicated update (reference DENSE + DDP allreduce)
                acc, touched = dg[g.key]
                acc = jax.lax.psum(acc, self._env.shard_axis)
                touched = (
                    jax.lax.psum(
                        touched.astype(jnp.int32), self._env.shard_axis
                    )
                    > 0
                )
                new_t, new_s = self._dp_ebc.group_dense_update(
                    g, dp_params[g.key], dp_states[g.key], optimizer,
                    acc, touched, lr=lr,
                )
                new_params[f"dp_{g.key}"] = new_t
                new_states[f"dp_{g.key}"] = new_s
        return new_params, new_states

    # ------------------------------------------- bucketized input dist path
    # Reference: RwSparseFeaturesDist (sharding/rw_sharding.py:361) +
    # KJTAllToAll (dist_data.py:1137). Each device holds only its LOCAL
    # batch's slot stream; ids are bucketized by owner and exchanged
    # (ragged or padded all-to-all, distributed/input_dist.py), so lookup,
    # sort and dedup all run on O(global ids / world) slots — the scaling
    # property the replicated-input path lacks.

    def _local_kjt(self, values, lengths, weights):
        return KeyedJaggedTensor(
            keys=self._ebc._feature_names,
            values=values,
            lengths=lengths,
            weights=weights,
        )

    def _bucketized_streams(self, kjt_local: KeyedJaggedTensor, d):
        """Shared fwd/bwd prefix: owner-bucketize + exchange per class.
        Identical expressions in forward and backward let XLA CSE the sort
        and the collective across the step."""
        from torchrec_tpu.distributed.input_dist import (
            bucketize_for_class,
            default_exchange_mode,
            exchange,
        )

        w = self._env.world_size
        kjt, b_local, f, seg, slot_feature, slot_batch = self._slot_arrays(
            kjt_local
        )
        values = kjt.values()
        weights = kjt.weights() if self._ebc.is_weighted() else None
        valid = slot_feature < f
        mode = self._exchange_mode or default_exchange_mode()
        streams = {}
        for c in self._classes:
            cap = values.shape[0] * c.max_blocks
            recv_cap = max(int(self._a2a_factor * cap), w)
            recv_cap = -(-recv_cap // w) * w  # padded mode needs W | cap
            ops = bucketize_for_class(
                c, values, slot_feature, slot_batch, valid, weights,
                b_local, d, w,
            )
            recvd, rvalid, dropped, _route = exchange(
                ops, recv_cap, self._env.shard_axis, w, mode
            )
            w_recv = recvd[2] if weights is not None else None
            streams[c.key] = (recvd[0], recvd[1], w_recv, rvalid, dropped)
        return kjt, b_local, streams

    def apply_local_bucketized(
        self,
        params: Params,
        values: jnp.ndarray,  # [cap_local] this device's batch slot stream
        lengths: jnp.ndarray,  # [F, B_local]
        weights: Optional[jnp.ndarray] = None,
        inverse_indices: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Bucketized sharded forward (inside shard_map): LOCAL batch KJT
        arrays in, batch-sharded ``[B_local, total_dim]`` out, plus the
        a2a-capacity overflow count (psum'd scalar — surface as a metric).
        ``inverse_indices`` (VBE, replicated [F, B_out]): the local arrays
        then hold this device's window of the GLOBAL dedup batch, and the
        output is ``[B_out / world, total_dim]`` (see :meth:`_vbe_ctx`)."""
        axis = self._env.shard_axis
        w = self._env.world_size
        d = jax.lax.axis_index(axis)
        kjt_local = self._local_kjt(values, lengths, weights)
        kjt, b_local, streams = self._bucketized_streams(kjt_local, d)
        b_global = b_local * w
        vbe = (
            None
            if inverse_indices is None
            else self._vbe_ctx_from_inv(inverse_indices, w, d)
        )
        lengths_g = self._env.all_gather_batch(
            kjt.lengths(), axis=1
        )  # [F, B_global]

        b_out_local = vbe[3] if vbe is not None else b_local
        out = jnp.zeros((b_out_local, self._total_dim), jnp.float32)
        dropped = jnp.zeros((), jnp.int32)
        for c in self._classes:
            rows_l, pool_seg, w_recv, rvalid, drp = streams[c.key]
            dropped = dropped + drp
            blob = params[c.key]
            blob = blob.reshape(blob.shape[-2], blob.shape[-1])
            rows = self._class_gather(
                c, blob, jnp.clip(rows_l, 0, c.local_rows - 1)
            )
            if w_recv is not None:
                rows = rows * w_recv[:, None].astype(rows.dtype)
            rows = jnp.where(rvalid[:, None], rows, 0.0)
            oobg = c.num_vf * b_global
            pooled = self._depermute_pooled(
                c,
                jax.ops.segment_sum(
                    rows,
                    jnp.where(rvalid, pool_seg, oobg),
                    num_segments=oobg,
                ),
            ).reshape(c.num_vf, b_global, c.width)
            scale = self._mean_scale(c, lengths_g, b_global)
            if scale is not None:
                pooled = pooled * scale[:, :, None]
            out = self._class_output_dist(c, pooled, out, vbe)
        if self._dp_ebc is not None:
            dp_params = {
                g.key: params[f"dp_{g.key}"] for g in self._dp_ebc.groups
            }
            kt = self._dp_ebc.apply(dp_params, kjt_local)
            if vbe is not None:
                # DP + VBE: gather the dedup rows globally (small), then
                # expand the local output window
                vals_g = self._env.all_gather_batch(kt.values())
                kt = KeyedTensor(
                    keys=kt.keys(),
                    length_per_key=kt.length_per_key(),
                    values=vals_g,
                )
                out = self._dp_vbe_expand(kt, out, vbe[1])
            else:
                out = self._dp_write_cols(kt, out)
        return out, jax.lax.psum(dropped, axis)

    def apply_gradients_local_bucketized(
        self,
        params: Params,
        opt_states,
        optimizer: EmbeddingOptimizer,
        values: jnp.ndarray,
        lengths: jnp.ndarray,
        weights: Optional[jnp.ndarray],
        out_grad: jnp.ndarray,  # [B_local, total_dim]
        lr=None,
        inverse_indices: Optional[jnp.ndarray] = None,
    ):
        """Bucketized fused backward + update (inside shard_map): dedup and
        the sparse update run on the O(ids/world) received stream."""
        axis = self._env.shard_axis
        w = self._env.world_size
        d = jax.lax.axis_index(axis)
        kjt_local = self._local_kjt(values, lengths, weights)
        kjt, b_local, streams = self._bucketized_streams(kjt_local, d)
        b_global = b_local * w
        vbe = (
            None
            if inverse_indices is None
            else self._vbe_ctx_from_inv(inverse_indices, w, d)
        )
        lengths_g = self._env.all_gather_batch(kjt.lengths(), axis=1)
        if self._qcomms is not None:
            from torchrec_tpu.distributed.qcomms import decode, encode

            q = self._qcomms
            scale_q = q.backward_loss_scale
            payload = out_grad * scale_q if scale_q else out_grad
            full_grad = decode(
                self._env.all_gather_batch(
                    encode(payload, q.backward_precision)
                ),
                q.backward_precision,
            )
            full_grad = full_grad / scale_q if scale_q else full_grad
        else:
            full_grad = self._env.all_gather_batch(
                out_grad
            )  # [B_global, total_dim]

        new_params = dict(params)
        new_states = dict(opt_states)
        for c in self._classes:
            rows_l, pool_seg, w_recv, rvalid, _drp = streams[c.key]
            # [num_vf, B_global, width] mean-scaled pooled-grad (VBE:
            # collapsed onto global dedup positions via inverse indices)
            pg = self._class_pooled_grad(
                c, full_grad, b_global, vbe, lengths_g
            )
            pg_flat = pg.reshape(c.num_vf * b_global, c.width)
            blob = params[c.key]
            state = {
                k: v.reshape(v.shape[1:])
                for k, v in opt_states[c.key].items()
            }
            blob2 = blob.reshape(blob.shape[-2], blob.shape[-1])
            fast = self._class_fast_update(
                c, blob2, state, optimizer, rows_l, pool_seg, rvalid,
                w_recv, pg_flat, d, lr,
            )
            if fast is None:
                uids, ugrads = dedup_rows_from_pooled(
                    rows_l, pool_seg, pg_flat, rvalid, c.local_rows,
                    weights=w_recv, compact=False,
                )
                new_blob, new_state = self._class_generic_update(
                    c, blob2, state, optimizer, uids, ugrads, lr
                )
            else:
                new_blob, new_state = fast
            new_params[c.key] = new_blob[None]
            new_states[c.key] = {k: v[None] for k, v in new_state.items()}
        if self._dp_ebc is not None:
            dp_grads_cols = []
            dp_keys = self._dp_ebc.feature_names()
            for key in dp_keys:
                fi = self._ebc._feature_names.index(key)
                col = int(self._feature_col_off[fi])
                if vbe is not None:
                    # VBE: collapse the FULL output-batch cotangent onto
                    # global dedup positions, then take this device's dedup
                    # window (each dedup example is owned by exactly one
                    # device, so the accumulator psum below double-counts
                    # nothing)
                    g = jax.lax.dynamic_slice(
                        full_grad,
                        (0, col),
                        (full_grad.shape[0], self._dims[fi]),
                    )
                    g = jax.ops.segment_sum(
                        g, vbe[0][fi], num_segments=b_global
                    )
                    g = jax.lax.dynamic_slice(
                        g, (d * b_local, 0), (b_local, self._dims[fi])
                    )
                else:
                    g = jax.lax.dynamic_slice(
                        out_grad,
                        (0, col),
                        (out_grad.shape[0], self._dims[fi]),
                    )
                dp_grads_cols.append(g)
            kt_grad = jnp.concatenate(dp_grads_cols, axis=1)
            dp_params = {
                g.key: params[f"dp_{g.key}"] for g in self._dp_ebc.groups
            }
            dp_states = {
                g.key: opt_states[f"dp_{g.key}"] for g in self._dp_ebc.groups
            }
            dg = self._dp_ebc.dense_accumulators(kjt_local, kt_grad)
            for g in self._dp_ebc.groups:
                acc, touched = dg[g.key]
                acc = jax.lax.psum(acc, axis)
                touched = (
                    jax.lax.psum(touched.astype(jnp.int32), axis) > 0
                )
                new_t, new_s = self._dp_ebc.group_dense_update(
                    g, dp_params[g.key], dp_states[g.key], optimizer,
                    acc, touched, lr=lr,
                )
                new_params[f"dp_{g.key}"] = new_t
                new_states[f"dp_{g.key}"] = new_s
        return new_params, new_states

    def apply_bucketized(
        self,
        params: Params,
        kjt: KeyedJaggedTensor,
        return_dropped: bool = False,
    ):
        """Standalone bucketized forward: host-splits the global KJT into
        per-device batch streams, then runs the a2a path under shard_map.
        ``return_dropped=True`` additionally returns the global count of
        slots lost to a2a receive capacity (feed it to the metrics stack)."""
        from jax import shard_map

        from torchrec_tpu.distributed.input_dist import shard_kjt_arrays

        mesh = self._env.mesh
        axis = self._env.shard_axis
        w = self._env.world_size
        P = jax.sharding.PartitionSpec
        param_specs = self._param_specs()
        sel = kjt.select_keys(self._ebc._feature_names)
        inv = (
            sel.inverse_indices() if sel.variable_stride_per_key() else None
        )
        vals, lens, wts = shard_kjt_arrays(sel, w)

        def body(p, v, l, wt, iv):
            out, dropped = self.apply_local_bucketized(
                p, v.reshape(v.shape[1:]), l.reshape(l.shape[1:]),
                None if wt is None else wt.reshape(wt.shape[1:]),
                inverse_indices=iv,
            )
            return out, dropped

        in_specs = (
            param_specs, P(axis), P(axis),
            None if wts is None else P(axis),
            None if inv is None else P(),
        )
        fn = shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=(P(axis), P()),
            check_vma=False,
        )
        vals_out, dropped = jax.jit(fn)(params, vals, lens, wts, inv)
        kt = KeyedTensor(
            keys=self.feature_names(),
            length_per_key=self._dims,
            values=vals_out,
        )
        return (kt, dropped) if return_dropped else kt

    def apply_gradients_bucketized(
        self,
        params: Params,
        opt_states,
        optimizer: EmbeddingOptimizer,
        kjt: KeyedJaggedTensor,
        out_grad: jnp.ndarray,
        lr=None,
    ):
        """Standalone bucketized backward + fused update."""
        from jax import shard_map

        from torchrec_tpu.distributed.input_dist import shard_kjt_arrays

        mesh = self._env.mesh
        axis = self._env.shard_axis
        w = self._env.world_size
        P = jax.sharding.PartitionSpec
        param_specs = self._param_specs()
        state_specs = {
            k: jax.tree_util.tree_map(
                lambda v: P(axis, *([None] * (v.ndim - 1)))
                if not k.startswith("dp_")
                else P(),
                opt_states[k],
            )
            for k in opt_states
        }
        sel = kjt.select_keys(self._ebc._feature_names)
        inv = (
            sel.inverse_indices() if sel.variable_stride_per_key() else None
        )
        vals, lens, wts = shard_kjt_arrays(sel, w)

        def body(p, s, v, l, wt, g, iv):
            return self.apply_gradients_local_bucketized(
                p, s, optimizer,
                v.reshape(v.shape[1:]), l.reshape(l.shape[1:]),
                None if wt is None else wt.reshape(wt.shape[1:]),
                g, lr=lr, inverse_indices=iv,
            )

        fn = shard_map(
            body,
            mesh=mesh,
            in_specs=(
                param_specs, state_specs, P(axis), P(axis),
                None if wts is None else P(axis), P(axis),
                None if inv is None else P(),
            ),
            out_specs=(param_specs, state_specs),
            check_vma=False,
        )
        return jax.jit(fn)(
            params, opt_states, vals, lens, wts, out_grad, inv
        )

    # -------------------------------------------------- standalone wrappers
    def apply(self, params: Params, kjt: KeyedJaggedTensor) -> KeyedTensor:
        """Standalone sharded forward: wraps shard_map, returns a KeyedTensor
        whose values are batch-sharded over the shard axis."""
        from jax import shard_map

        mesh = self._env.mesh
        axis = self._env.shard_axis
        P = jax.sharding.PartitionSpec
        param_specs = self._param_specs()

        @jax.jit
        def run(params, kjt):
            fn = shard_map(
                lambda p, k: self.apply_local(p, k),
                mesh=mesh,
                in_specs=(param_specs, P()),
                out_specs=P(axis),
                check_vma=False,
            )
            return fn(params, kjt)

        vals = run(params, kjt)
        return KeyedTensor(
            keys=self.feature_names(),
            length_per_key=self._dims,
            values=vals,
        )

    def apply_gradients(
        self,
        params: Params,
        opt_states,
        optimizer: EmbeddingOptimizer,
        kjt: KeyedJaggedTensor,
        out_grad: jnp.ndarray,
        lr=None,
    ):
        from jax import shard_map

        mesh = self._env.mesh
        axis = self._env.shard_axis
        P = jax.sharding.PartitionSpec
        param_specs = self._param_specs()
        state_specs = {
            k: jax.tree_util.tree_map(
                lambda v: P(axis, *([None] * (v.ndim - 1)))
                if not k.startswith("dp_")
                else P(),
                opt_states[k],
            )
            for k in opt_states
        }

        fn = shard_map(
            lambda p, s, k, g: self.apply_gradients_local(
                p, s, optimizer, k, g, lr=lr
            ),
            mesh=mesh,
            in_specs=(param_specs, state_specs, P(), P(axis)),
            out_specs=(param_specs, state_specs),
            check_vma=False,
        )
        return jax.jit(fn)(params, opt_states, kjt, out_grad)



def _strip_vbe(kjt: KeyedJaggedTensor) -> KeyedJaggedTensor:
    """Plain KJT over the same buffers with the VBE fields dropped —
    pooling then happens at the deduplicated per-key batch positions
    (lengths columns beyond ``stride_per_key[k]`` are zero by the VBE
    contract, so those rows pool to zero)."""
    base = kjt.materialize()
    return KeyedJaggedTensor(
        keys=base.keys(),
        values=base.values(),
        lengths=base._lengths,
        weights=base.weights_or_none(),
    )


def _kjt_batch_shard(
    kjt: KeyedJaggedTensor, d: jnp.ndarray, w: int
) -> KeyedJaggedTensor:
    """Local batch slice of a replicated KJT (values buffer kept whole;
    lengths sliced so only the local examples contribute)."""
    b = kjt.stride()
    b_local = b // w
    # the window view keeps the base buffers; lengths/segment_ids remap
    # window rows to [0, b_local) and everything else to OOB padding
    return _WindowedKJT(kjt, d * b_local, b_local)


class _WindowedKJT(KeyedJaggedTensor):
    """Replicated-buffer KJT view restricted to a batch window.

    Reuses the full value buffer; ``lengths``/``segment_ids`` remap window
    rows to [0, b_local) so an unsharded EBC sees a batch of b_local
    examples. Supports key selection views like the base class.
    """

    def __init__(self, base: KeyedJaggedTensor, start, b_local):
        # physical lengths stay the base's (value layout unchanged);
        # require physical == logical order so the buffer matches lengths.
        base = base.materialize()
        self._keys = tuple(base.keys())
        self._values = base.values()
        self._weights = base.weights_or_none()
        self._lengths = base._lengths
        self._sel = tuple(range(len(self._keys)))
        self._start = start
        self._b_local = b_local
        self._stride_per_key = None
        self._inverse_indices = None

    def _view(self, sel):
        obj = object.__new__(_WindowedKJT)
        obj._keys = self._keys
        obj._values = self._values
        obj._weights = self._weights
        obj._lengths = self._lengths
        obj._start = self._start
        obj._b_local = self._b_local
        obj._sel = tuple(sel)
        obj._stride_per_key = None
        obj._inverse_indices = None
        return obj

    def tree_flatten(self):
        return (
            (self._values, self._lengths, self._weights, self._start),
            (self._keys, self._sel, self._b_local),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, sel, b_local = aux
        obj = object.__new__(cls)
        obj._keys = keys
        obj._values, obj._lengths, obj._weights, obj._start = children
        obj._sel = sel
        obj._b_local = b_local
        obj._stride_per_key = None
        obj._inverse_indices = None
        return obj

    def stride(self) -> int:
        return self._b_local

    def lengths(self):
        sub = self._lengths[jnp.array(self._sel, dtype=jnp.int32), :]
        return jax.lax.dynamic_slice(
            sub, (0, self._start), (sub.shape[0], self._b_local)
        )

    def segment_ids(self, oob=None):
        f_phys, b = self._lengths.shape
        b_local = self._b_local
        num_segments = self.num_keys * b_local
        oob_val = num_segments if oob is None else oob
        pos = [-1] * f_phys
        for logical, phys in enumerate(self._sel):
            pos[phys] = logical
        pos_arr = jnp.array(pos, dtype=jnp.int32)
        batch_ids = jnp.arange(b, dtype=jnp.int32)
        local_b = batch_ids[None, :] - self._start
        in_win = (local_b >= 0) & (local_b < b_local) & (pos_arr[:, None] >= 0)
        seg = pos_arr[:, None] * b_local + jnp.clip(local_b, 0, b_local - 1)
        seg = jnp.where(in_win, seg, oob_val)
        from torchrec_tpu.sparse.jagged import _repeat_with_oob_tail

        return _repeat_with_oob_tail(seg, self._lengths, self.capacity, oob_val)

    def select_keys(self, keys):
        key_to_phys = {k: i for i, k in enumerate(self._keys)}
        return self._view([key_to_phys[k] for k in keys])

    def permute(self, indices):
        if len(set(indices)) != len(indices):  # same contract as the base
            raise ValueError("duplicate indices in permute on a KJT view")
        return self._view([self._sel[i] for i in indices])

    def split(self, segments):
        out, start = [], 0
        for seg in segments:
            out.append(self._view(self._sel[start : start + seg]))
            start += seg
        return out

    def materialize(self):
        raise NotImplementedError("windowed KJT views are lookup-only")


jax.tree_util.register_pytree_node(
    _WindowedKJT,
    lambda t: t.tree_flatten(),
    _WindowedKJT.tree_unflatten,
)
