"""ShardedEmbeddingCollection — SPMD sharded *sequence* (unpooled) lookups.

Capability parity with torchrec/distributed/embedding.py
(ShardedEmbeddingCollection:439, sharder :1815) and the sequence sharding
strategies (torchrec/distributed/sharding/rw_sequence_sharding.py:57-284,
tw_sequence_sharding.py, cw_sequence_sharding.py, dp_sequence_sharding.py)
whose output dist is SequenceEmbeddingsAllToAll (dist_data.py:1974) —
re-designed as one uniform SPMD program on the shared width-class layout
(distributed/_layout.py):

* Input KJT is replicated; each device produces embedding rows for the id
  slots whose rows it owns (zeros elsewhere) into a ``[cap, dim]``-shaped
  per-class buffer; a single ``psum`` over the shard axis replaces the
  reference's SequenceEmbeddingsAllToAll — every device ends with the full
  per-id row stream (TorchRec's sequence a2a instead returns only the
  local batch's rows; downstream dense archs here run batch-sharded on a
  replicated stream, so the collective rides ICI once per class).

* Column-wise blocks (CW/GRID) assemble by concatenation along the dim
  axis before the psum — one collective regardless of block count.

* Backward is the exact transpose: the stream cotangent is already
  replicated (transpose of psum = broadcast); each device selects the
  slots it owns, dedups locally, and runs the fused optimizer on its blob —
  zero cross-device traffic in the update itself.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from torchrec_tpu.ops.lookup import roll_rows as _roll_rows
import numpy as np

from torchrec_tpu.distributed._layout import (
    ShardedCollectionBase,
    WidthClass,
    build_width_classes,
)
from torchrec_tpu.distributed.types import (
    EmbeddingModuleShardingPlan,
    ShardingEnv,
)
from torchrec_tpu.modules.embedding_modules import EmbeddingCollection
from torchrec_tpu.ops.fused_optim import EmbeddingOptimizer
from torchrec_tpu.ops.lookup import dedup_rows_from_pooled
from torchrec_tpu.sparse import JaggedTensor, KeyedJaggedTensor
from torchrec_tpu.types import DataType

__all__ = ["ShardedEmbeddingCollection"]

Params = Dict[str, jnp.ndarray]


class ShardedEmbeddingCollection(ShardedCollectionBase):
    """Drop-in sharded EmbeddingCollection.

    ``apply_local``/``apply_gradients_local`` run INSIDE ``shard_map``;
    ``apply`` is a standalone wrapper returning ``Dict[str, JaggedTensor]``
    like the unsharded module.
    """

    def __init__(
        self,
        ec: EmbeddingCollection,
        plan: EmbeddingModuleShardingPlan,
        env: ShardingEnv,
        exchange_mode: Optional[str] = None,
    ):
        """``exchange_mode``: force "ragged"/"padded" for the bucketized
        a2a (None = platform default) — same knob as the EBC twin."""
        self._ec = ec
        self._plan = plan
        self._env = env
        self._exchange_mode = exchange_mode
        # fused Pallas kernel tier (segscan backward, tile-row /
        # pair-packed storage) — shared with the EBC twin via
        # ShardedCollectionBase; gated on the module's fast window
        self._max_unique = getattr(ec, "_max_unique", None)
        self._all_tables = list(ec._tables)
        tables = {t.name: t for t in ec._tables}
        for name in tables:
            if name not in plan:
                raise ValueError(f"table {name!r} missing from plan")

        from torchrec_tpu.types import ShardingType

        dp_names = [
            n for n, ps in plan.items()
            if ps.sharding_type == ShardingType.DATA_PARALLEL
        ]
        self._dp: Optional[EmbeddingCollection] = None
        if dp_names:
            self._dp = EmbeddingCollection([tables[n] for n in dp_names])

        feat_of_table: Dict[str, List[int]] = {}
        for i, ti in enumerate(ec._feature_table):
            feat_of_table.setdefault(ec._tables[ti].name, []).append(i)
        self._classes = build_width_classes(
            tables, plan, ec._feature_names, feat_of_table, env.world_size,
            fast_window=self._max_unique,
        )
        # sequence assembly requires uniform column blocks: block bi of any
        # table in a class must start at bi*width (our plan generators
        # guarantee this; reference CW also splits uniformly)
        for c in self._classes:
            for i, fi in enumerate(c.vf_feature):
                bi = int(np.where(c.vf_pos[fi] == i)[0][0])
                if c.vf_col_start[i] != bi * c.width:
                    raise NotImplementedError(
                        "non-uniform CW blocks unsupported for sequence "
                        f"sharding (feature {fi}, block {bi})"
                    )

        self._dims = [
            ec._tables[ti].embedding_dim for ti in ec._feature_table
        ]
        self._feature_names = list(ec._feature_names)

    def _unsharded_collection(self):
        return self._ec

    def init(self, key: jax.Array) -> Params:
        return self.shard_params(self._ec.init(key))

    def feature_names(self) -> List[str]:
        return list(self._feature_names)

    # ------------------------------------------------------------ SPMD core
    def _slot_arrays(self, kjt: KeyedJaggedTensor):
        kjt = kjt.select_keys(self._feature_names)
        b = kjt.stride()
        f = len(self._feature_names)
        seg = kjt.segment_ids()
        slot_feature = jnp.minimum(seg // b, f)
        return kjt, b, f, slot_feature

    def apply_local(
        self, params: Params, kjt: KeyedJaggedTensor
    ) -> Dict[str, jnp.ndarray]:
        """Sharded forward (inside shard_map): replicated KJT in, replicated
        per-class row streams out: ``{class key: [cap, max_blocks*width]}``
        (plus ``"dp"`` -> [cap, dim] if DP tables exist). Rows at slots of
        other classes' features are zero. Use :meth:`rows_per_feature` to
        slice per-feature ``[cap, dim]`` views."""
        axis = self._env.shard_axis
        d = jax.lax.axis_index(axis)
        kjt, b, f, slot_feature = self._slot_arrays(kjt)
        values = kjt.values()
        valid_slot = kjt.valid_mask()

        out: Dict[str, jnp.ndarray] = {}
        for c in self._classes:
            id_lo = jnp.asarray(c.id_lo)[d]  # [F+1, MB]
            id_hi = jnp.asarray(c.id_hi)[d]
            blob_off = jnp.asarray(c.blob_off)[d]
            vf_pos = jnp.asarray(c.vf_pos)
            blob = params[c.key]
            blob = blob.reshape(blob.shape[-2], blob.shape[-1])
            parts = []
            for blk in range(c.max_blocks):
                lo = jnp.take(id_lo[:, blk], slot_feature)
                hi = jnp.take(id_hi[:, blk], slot_feature)
                off = jnp.take(blob_off[:, blk], slot_feature)
                pos = jnp.take(vf_pos[:, blk], slot_feature)
                valid = (pos >= 0) & (values >= lo) & (values < hi) & valid_slot
                local_id = jnp.clip(values - lo + off, 0, c.local_rows - 1)
                # storage-aware gather (packed rows arrive in half lanes
                # and de-permute to logical — the stream is user-facing)
                rows = self._depermute_pooled(
                    c, self._class_gather(c, blob, local_id)
                )
                rows = jnp.where(valid[:, None], rows, 0.0)
                parts.append(rows)
            stream = jnp.concatenate(parts, axis=1)  # [cap, MB*width]
            # output dist: one psum replaces SequenceEmbeddingsAllToAll
            # (per-axis when hierarchical: intra-host leg first)
            out[c.key] = self._env.psum_shard(stream)
        if self._dp is not None:
            dp_params = {g.key: params[f"dp_{g.key}"] for g in self._dp.groups}
            out["dp"] = self._dp_rows(dp_params, kjt)
        return out

    def _dp_rows(self, dp_params, kjt) -> jnp.ndarray:
        """Replicated-compute rows for DP tables: [cap, max_dp_dim]."""
        dp = self._dp
        b = kjt.stride()
        f_all = len(self._feature_names)
        seg = kjt.segment_ids()
        slot_feature = jnp.minimum(seg // b, f_all)
        values = kjt.values()
        valid_slot = kjt.valid_mask()
        max_dim = max(g.dim for g in dp.groups)
        out = jnp.zeros((kjt.capacity, max_dim), jnp.float32)
        # feature index remap: global feature -> membership in dp
        dp_feats = {name: i for i, name in enumerate(dp.feature_names())}
        for g in dp.groups:
            roff = np.zeros(f_all + 1, np.int32)
            member = np.zeros(f_all + 1, np.bool_)
            for gi_name, off in zip(g.table_names, g.row_offsets):
                for fi, name in enumerate(self._feature_names):
                    t = self._ec._tables[self._ec._feature_table[fi]]
                    if t.name == gi_name:
                        roff[fi] = off
                        member[fi] = True
            ids_g = values + jnp.take(jnp.asarray(roff), slot_feature)
            valid = jnp.take(jnp.asarray(member), slot_feature) & valid_slot
            table = dp_params[g.key]
            table = (
                table.astype(jnp.float32)
                if g.data_type != DataType.FP32
                else table
            )
            rows = jnp.take(
                table, jnp.clip(ids_g, 0, g.total_rows - 1), axis=0
            )
            rows = jnp.where(valid[:, None], rows, 0.0)
            out = out.at[:, : g.dim].add(rows)
        return out

    def rows_per_feature(
        self, streams: Dict[str, jnp.ndarray]
    ) -> List[jnp.ndarray]:
        """Slice apply_local's class streams into per-feature [cap, dim_f]
        row arrays (rows are only meaningful at each feature's own slots)."""
        out: List[Optional[jnp.ndarray]] = [None] * len(self._feature_names)
        for c in self._classes:
            for i, fi in enumerate(c.vf_feature):
                if out[fi] is None:
                    # feature's full dim = contiguous blocks in this class
                    dim = self._dims[fi]
                    out[fi] = streams[c.key][:, :dim]
        if self._dp is not None:
            for name in self._dp.feature_names():
                fi = self._feature_names.index(name)
                out[fi] = streams["dp"][:, : self._dims[fi]]
        return out  # type: ignore[return-value]

    def sparse_grads_local(
        self, kjt: KeyedJaggedTensor, cot: Dict[str, jnp.ndarray]
    ) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
        """Transpose of apply_local: per-class stream cotangents
        (replicated) -> per-class local (unique_ids, unique_grads)."""
        axis = self._env.shard_axis
        d = jax.lax.axis_index(axis)
        kjt, b, f, slot_feature = self._slot_arrays(kjt)
        values = kjt.values()
        valid_slot = kjt.valid_mask()
        grads: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        for c in self._classes:
            id_lo = jnp.asarray(c.id_lo)[d]
            id_hi = jnp.asarray(c.id_hi)[d]
            blob_off = jnp.asarray(c.blob_off)[d]
            vf_pos = jnp.asarray(c.vf_pos)
            g_stream = cot[c.key]  # [cap, MB*width]
            all_ids, all_g, all_valid = [], [], []
            for blk in range(c.max_blocks):
                lo = jnp.take(id_lo[:, blk], slot_feature)
                hi = jnp.take(id_hi[:, blk], slot_feature)
                off = jnp.take(blob_off[:, blk], slot_feature)
                pos = jnp.take(vf_pos[:, blk], slot_feature)
                valid = (pos >= 0) & (values >= lo) & (values < hi) & valid_slot
                local_id = jnp.clip(values - lo + off, 0, c.local_rows - 1)
                g = g_stream[:, blk * c.width : (blk + 1) * c.width]
                all_ids.append(local_id)
                all_g.append(g)
                all_valid.append(valid)
            ids_cat = jnp.concatenate(all_ids)
            g_cat = jnp.concatenate(all_g)
            valid_cat = jnp.concatenate(all_valid)
            # per-slot grads ARE the cotangent here (identity seg): the
            # sorted dedup gathers them in run order and sums sorted —
            # no unsorted segment-sum, no rank-compaction scatter
            # (position layout; optimizer takes ids_sorted=False)
            grads[c.key] = dedup_rows_from_pooled(
                ids_cat,
                jnp.arange(ids_cat.shape[0], dtype=jnp.int32),
                g_cat,
                valid_cat,
                c.local_rows,
                compact=False,
            )
        return grads

    def apply_gradients_local(
        self,
        params: Params,
        opt_states: Dict[str, Dict[str, jnp.ndarray]],
        optimizer: EmbeddingOptimizer,
        kjt: KeyedJaggedTensor,
        cot: Dict[str, jnp.ndarray],
        lr=None,
    ) -> Tuple[Params, Dict[str, Dict[str, jnp.ndarray]]]:
        """Fused sparse update on local blobs (inside shard_map)."""
        axis = self._env.shard_axis
        d = jax.lax.axis_index(axis)
        kjt_s, b, f, slot_feature = self._slot_arrays(kjt)
        values = kjt_s.values()
        valid_slot = kjt_s.valid_mask()
        new_params = dict(params)
        new_states = dict(opt_states)
        for c in self._classes:
            id_lo = jnp.asarray(c.id_lo)[d]
            id_hi = jnp.asarray(c.id_hi)[d]
            blob_off = jnp.asarray(c.blob_off)[d]
            vf_pos = jnp.asarray(c.vf_pos)
            g_stream = cot[c.key]  # [cap, MB*width]
            all_ids, all_g, all_valid = [], [], []
            for blk in range(c.max_blocks):
                lo = jnp.take(id_lo[:, blk], slot_feature)
                hi = jnp.take(id_hi[:, blk], slot_feature)
                off = jnp.take(blob_off[:, blk], slot_feature)
                pos = jnp.take(vf_pos[:, blk], slot_feature)
                valid = (pos >= 0) & (values >= lo) & (values < hi) & valid_slot
                all_ids.append(jnp.clip(values - lo + off, 0, c.local_rows - 1))
                all_g.append(g_stream[:, blk * c.width : (blk + 1) * c.width])
                all_valid.append(valid)
            ids_cat = jnp.concatenate(all_ids)
            g_cat = jnp.concatenate(all_g)
            valid_cat = jnp.concatenate(all_valid)
            blob = params[c.key]
            blob2 = blob.reshape(blob.shape[-2], blob.shape[-1])
            state = {
                k: v.reshape(v.shape[1:]) for k, v in opt_states[c.key].items()
            }
            # sequence slot grads ARE the cotangent (identity seg): the
            # shared fast tier consumes them as the pooled-grad source
            fast = self._class_fast_update(
                c, blob2, state, optimizer, ids_cat,
                jnp.arange(ids_cat.shape[0], dtype=jnp.int32), valid_cat,
                None, g_cat, d, lr,
            )
            if fast is None:
                uids, ugrads = dedup_rows_from_pooled(
                    ids_cat,
                    jnp.arange(ids_cat.shape[0], dtype=jnp.int32),
                    g_cat,
                    valid_cat,
                    c.local_rows,
                    compact=False,
                )
                new_blob, new_state = self._class_generic_update(
                    c, blob2, state, optimizer, uids, ugrads, lr
                )
            else:
                new_blob, new_state = fast
            new_params[c.key] = new_blob[None]
            new_states[c.key] = {k: v[None] for k, v in new_state.items()}
        if self._dp is not None and "dp" in cot:
            kjt_sel, b, f_all, slot_feature = self._slot_arrays(kjt)
            values = kjt_sel.values()
            valid_slot = kjt_sel.valid_mask()
            from torchrec_tpu.ops.lookup import accumulate_dense

            for g in self._dp.groups:
                roff = np.zeros(f_all + 1, np.int32)
                member = np.zeros(f_all + 1, np.bool_)
                for gi_name, off in zip(g.table_names, g.row_offsets):
                    for fi, name in enumerate(self._feature_names):
                        t = self._ec._tables[self._ec._feature_table[fi]]
                        if t.name == gi_name:
                            roff[fi] = off
                            member[fi] = True
                ids_g = values + jnp.take(jnp.asarray(roff), slot_feature)
                valid = jnp.take(jnp.asarray(member), slot_feature) & valid_slot
                gr = cot["dp"][:, : g.dim]
                acc, touched = accumulate_dense(
                    jnp.clip(ids_g, 0, g.total_rows - 1), gr, valid, g.total_rows
                )
                # DP forward is replicated compute, so per-device cotangents
                # are identical: update without psum keeps replicas in sync
                new_t, new_s = optimizer.dense_update(
                    params[f"dp_{g.key}"],
                    opt_states[f"dp_{g.key}"],
                    acc,
                    touched,
                    lr=lr,
                )
                new_params[f"dp_{g.key}"] = new_t
                new_states[f"dp_{g.key}"] = new_s
        return new_params, new_states

    # ------------------------------------------- bucketized input dist path
    # Reference: RW sequence sharding (rw_sequence_sharding.py:57-284) —
    # bucketized ids to owners, per-id rows back via the transpose exchange
    # (SequenceEmbeddingsAllToAll, dist_data.py:1974). Per-device work is
    # O(global ids / world); outputs are the LOCAL batch's row streams
    # (batch-sharded), unlike the replicated-psum path above.

    def _bucketized_streams(self, kjt_local: KeyedJaggedTensor, a2a_factor):
        from torchrec_tpu.distributed.input_dist import (
            bucketize_sequence_for_class,
            default_exchange_mode,
            exchange,
        )

        w = self._env.world_size
        kjt, b, f, slot_feature = self._slot_arrays(kjt_local)
        values = kjt.values()
        valid = slot_feature < f
        mode = self._exchange_mode or default_exchange_mode()
        streams = {}
        for c in self._classes:
            cap = values.shape[0] * c.max_blocks
            recv_cap = -(-max(int(a2a_factor * cap), w) // w) * w
            owner, rows_send, pos_send = bucketize_sequence_for_class(
                c, values, slot_feature, valid, w
            )
            recvd, rvalid, dropped, route = exchange(
                (owner, rows_send), recv_cap, self._env.shard_axis, w, mode
            )
            streams[c.key] = (
                owner, pos_send, recvd[0], rvalid, dropped, route,
            )
        return kjt, streams

    def apply_local_bucketized(
        self,
        params: Params,
        values: jnp.ndarray,  # [cap_local] this device's slot stream
        lengths: jnp.ndarray,  # [F, B_local]
        a2a_factor: float = 2.0,
    ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
        """Bucketized sequence forward (inside shard_map): LOCAL slot
        streams in, LOCAL per-class row streams out
        (``{class key: [cap_local, max_blocks*width]}``), plus the a2a
        overflow count. Dropped slots produce zero rows."""
        from torchrec_tpu.distributed.input_dist import reverse_exchange

        axis = self._env.shard_axis
        w = self._env.world_size
        kjt_local = KeyedJaggedTensor(
            keys=self._feature_names, values=values, lengths=lengths
        )
        kjt, streams = self._bucketized_streams(kjt_local, a2a_factor)
        cap = kjt.values().shape[0]
        out: Dict[str, jnp.ndarray] = {}
        dropped = jnp.zeros((), jnp.int32)
        for c in self._classes:
            owner, pos_send, rows_l, rvalid, drp, route = streams[c.key]
            dropped = dropped + drp
            blob = params[c.key]
            blob = blob.reshape(blob.shape[-2], blob.shape[-1])
            rows = self._depermute_pooled(
                c,
                self._class_gather(
                    c, blob, jnp.clip(rows_l, 0, c.local_rows - 1)
                ),
            )
            rows = jnp.where(rvalid[:, None], rows, 0.0)
            back = reverse_exchange(route, rows, axis, w)  # sorted order
            # unsort to stream order, then split blocks along the dim axis
            stream = jnp.zeros((cap * c.max_blocks, c.width), jnp.float32)
            stream = stream.at[pos_send].set(back, unique_indices=True)
            out[c.key] = jnp.concatenate(
                [
                    stream[blk * cap : (blk + 1) * cap]
                    for blk in range(c.max_blocks)
                ],
                axis=1,
            )  # [cap_local, MB*width]
        if self._dp is not None:
            dp_params = {g.key: params[f"dp_{g.key}"] for g in self._dp.groups}
            out["dp"] = self._dp_rows(dp_params, kjt)
        return out, jax.lax.psum(dropped, axis)

    def apply_gradients_local_bucketized(
        self,
        params: Params,
        opt_states: Dict[str, Dict[str, jnp.ndarray]],
        optimizer: EmbeddingOptimizer,
        values: jnp.ndarray,
        lengths: jnp.ndarray,
        cot: Dict[str, jnp.ndarray],  # LOCAL stream cotangents
        lr=None,
        a2a_factor: float = 2.0,
    ) -> Tuple[Params, Dict[str, Dict[str, jnp.ndarray]]]:
        """Bucketized sequence backward: cotangent rows travel the forward
        exchange (transpose of the reverse), dedup + fused update run on the
        O(ids/world) received stream."""
        from torchrec_tpu.distributed.input_dist import exchange

        axis = self._env.shard_axis
        w = self._env.world_size
        kjt_local = KeyedJaggedTensor(
            keys=self._feature_names, values=values, lengths=lengths
        )
        kjt, streams = self._bucketized_streams(kjt_local, a2a_factor)
        cap = kjt.values().shape[0]
        from torchrec_tpu.distributed.input_dist import default_exchange_mode

        mode = self._exchange_mode or default_exchange_mode()
        new_params = dict(params)
        new_states = dict(opt_states)
        for c in self._classes:
            owner, pos_send, rows_l, rvalid, _drp, route = streams[c.key]
            g_stream = cot[c.key]  # [cap, MB*width]
            g_cat = jnp.concatenate(
                [
                    g_stream[:, blk * c.width : (blk + 1) * c.width]
                    for blk in range(c.max_blocks)
                ],
                axis=0,
            )  # [cap*MB, width]
            g_sorted = jnp.take(g_cat, pos_send, axis=0)
            recv_cap = rows_l.shape[0]
            (g_recv,), _rv, _dr, _rt = exchange(
                (owner, g_sorted), recv_cap, axis, w, mode
            )
            blob = params[c.key]
            blob2 = blob.reshape(blob.shape[-2], blob.shape[-1])
            state = {
                k: v.reshape(v.shape[1:])
                for k, v in opt_states[c.key].items()
            }
            d = jax.lax.axis_index(axis)
            fast = self._class_fast_update(
                c, blob2, state, optimizer, rows_l,
                jnp.arange(recv_cap, dtype=jnp.int32), rvalid, None,
                g_recv, d, lr,
            )
            if fast is None:
                uids, ugrads = dedup_rows_from_pooled(
                    rows_l,
                    jnp.arange(recv_cap, dtype=jnp.int32),
                    g_recv,
                    rvalid,
                    c.local_rows,
                    compact=False,
                )
                new_blob, new_state = self._class_generic_update(
                    c, blob2, state, optimizer, uids, ugrads, lr
                )
            else:
                new_blob, new_state = fast
            new_params[c.key] = new_blob[None]
            new_states[c.key] = {k: v[None] for k, v in new_state.items()}
        if self._dp is not None and "dp" in cot:
            from torchrec_tpu.ops.lookup import accumulate_dense

            kjt_sel, b, f_all, slot_feature = self._slot_arrays(kjt_local)
            values_s = kjt_sel.values()
            valid_slot = kjt_sel.valid_mask()
            for g in self._dp.groups:
                roff = np.zeros(f_all + 1, np.int32)
                member = np.zeros(f_all + 1, np.bool_)
                for gi_name, off in zip(g.table_names, g.row_offsets):
                    for fi, name in enumerate(self._feature_names):
                        t = self._ec._tables[self._ec._feature_table[fi]]
                        if t.name == gi_name:
                            roff[fi] = off
                            member[fi] = True
                ids_g = values_s + jnp.take(jnp.asarray(roff), slot_feature)
                valid = (
                    jnp.take(jnp.asarray(member), slot_feature) & valid_slot
                )
                gr = cot["dp"][:, : g.dim]
                acc, touched = accumulate_dense(
                    jnp.clip(ids_g, 0, g.total_rows - 1), gr, valid,
                    g.total_rows,
                )
                # unlike the replicated path, local batches DIFFER per
                # device — combine before the replicated update
                acc = jax.lax.psum(acc, axis)
                touched = jax.lax.psum(touched.astype(jnp.int32), axis) > 0
                new_t, new_s = optimizer.dense_update(
                    params[f"dp_{g.key}"],
                    opt_states[f"dp_{g.key}"],
                    acc,
                    touched,
                    lr=lr,
                )
                new_params[f"dp_{g.key}"] = new_t
                new_states[f"dp_{g.key}"] = new_s
        return new_params, new_states

    def apply_bucketized(
        self, params: Params, kjt: KeyedJaggedTensor
    ) -> Dict[str, JaggedTensor]:
        """Standalone bucketized sequence forward: host-splits the KJT,
        runs the a2a path, and reassembles global per-feature JaggedTensors
        (oracle-comparable with the unsharded EmbeddingCollection)."""
        from jax import shard_map

        from torchrec_tpu.distributed.input_dist import shard_kjt_arrays

        mesh = self._env.mesh
        axis = self._env.shard_axis
        w = self._env.world_size
        P = jax.sharding.PartitionSpec
        param_specs = self._param_specs()
        kjt_mat = kjt.select_keys(self._feature_names).materialize()
        vals, lens, _wts, pos = shard_kjt_arrays(
            kjt_mat, w, return_positions=True
        )

        def body(p, v, l):
            streams, dropped = self.apply_local_bucketized(
                p, v.reshape(v.shape[1:]), l.reshape(l.shape[1:]),
                a2a_factor=float(w),
            )
            return streams, dropped

        out_specs = (
            {
                **{c.key: P(axis) for c in self._classes},
                **({"dp": P(axis)} if self._dp is not None else {}),
            },
            P(),
        )
        fn = shard_map(
            body, mesh=mesh, in_specs=(param_specs, P(axis), P(axis)),
            out_specs=out_specs, check_vma=False,
        )
        streams, _dropped = jax.jit(fn)(params, vals, lens)
        # host reassembly: local slot (dev, j) -> materialized stream pos
        cap_local = vals.shape[1]
        per_feature_local = {}
        for c in self._classes:
            arr = np.asarray(jax.device_get(streams[c.key]))
            per_feature_local[c.key] = arr.reshape(w, cap_local, -1)
        if self._dp is not None:
            arr = np.asarray(jax.device_get(streams["dp"]))
            per_feature_local["dp"] = arr.reshape(w, cap_local, -1)
        pos_np = np.asarray(pos)
        cap_g = kjt_mat.capacity
        full: Dict[str, np.ndarray] = {}
        for key, arr in per_feature_local.items():
            stream = np.zeros((cap_g, arr.shape[-1]), np.float32)
            for dvc in range(w):
                ok = pos_np[dvc] >= 0
                stream[pos_np[dvc][ok]] = arr[dvc][ok]
            full[key] = stream
        # per-feature views (same slicing as rows_per_feature)
        rows: List[Optional[np.ndarray]] = [None] * len(self._feature_names)
        for c in self._classes:
            for i, fi in enumerate(c.vf_feature):
                if rows[fi] is None:
                    rows[fi] = full[c.key][:, : self._dims[fi]]
        if self._dp is not None:
            for name in self._dp.feature_names():
                fi = self._feature_names.index(name)
                rows[fi] = full["dp"][:, : self._dims[fi]]
        offsets_pk = kjt_mat.offset_per_key()
        lengths_g = kjt_mat.lengths()
        out: Dict[str, JaggedTensor] = {}
        for fi, name in enumerate(self._feature_names):
            start = offsets_pk[fi]
            out[name] = JaggedTensor(
                values=_roll_rows(jnp.asarray(rows[fi]), start),
                lengths=lengths_g[fi],
            )
        return out

    # -------------------------------------------------- standalone wrappers
    def apply(
        self, params: Params, kjt: KeyedJaggedTensor
    ) -> Dict[str, JaggedTensor]:
        """Standalone sharded forward: Dict[str, JaggedTensor] like the
        unsharded EmbeddingCollection (values replicated)."""
        from jax import shard_map

        mesh = self._env.mesh
        P = jax.sharding.PartitionSpec
        param_specs = self._param_specs()
        kjt_mat = kjt.select_keys(self._feature_names).materialize()

        @jax.jit
        def run(params, kjt):
            fn = shard_map(
                lambda p, k: self.apply_local(p, k),
                mesh=mesh,
                in_specs=(param_specs, P()),
                out_specs={
                    **{c.key: P() for c in self._classes},
                    **({"dp": P()} if self._dp is not None else {}),
                },
                check_vma=False,
            )
            return fn(params, kjt)

        streams = run(params, kjt_mat)
        rows = self.rows_per_feature(streams)
        offsets_pk = kjt_mat.offset_per_key()
        lengths = kjt_mat.lengths()
        w = kjt_mat.weights_or_none()
        out: Dict[str, JaggedTensor] = {}
        for fi, name in enumerate(self._feature_names):
            start = offsets_pk[fi]
            out[name] = JaggedTensor(
                values=_roll_rows(rows[fi], start),
                lengths=lengths[fi],
                weights=_roll_rows(w, start) if w is not None else None,
            )
        return out



