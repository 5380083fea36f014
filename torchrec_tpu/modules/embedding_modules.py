"""EmbeddingBagCollection / EmbeddingCollection — the authoring modules.

Capability parity with torchrec/modules/embedding_modules.py
(EmbeddingBagCollection:129 — forward(KJT) -> KeyedTensor;
EmbeddingCollection:367 — forward(KJT) -> Dict[str, JaggedTensor]).

TPU-first design differences from the reference:

* **Functional**: ``init(key) -> params`` / ``apply(params, kjt)``. Params
  are a flat dict of arrays, directly shardable/checkpointable.

* **Table-batched from day one**: tables of the same (dim, dtype) are
  stacked into one ``[sum_rows, dim]`` group buffer at init — the layout
  FBGEMM TBE uses *after* sharding (batched_embedding_kernel.py:3725) is
  our native unsharded layout too, so the single-chip path already runs one
  fused gather+pool per group instead of one kernel per table (the 13-23x
  gap measured in reference benchmarks/README.md:44).

* **No input permute kernels**: the module reorders the incoming KJT to its
  feature order with a zero-copy key-selection view; per-slot destination
  offsets/segments are computed from static metadata + the KJT's lengths.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from torchrec_tpu.ops.lookup import roll_rows as _roll_rows
import numpy as np

from torchrec_tpu.modules.embedding_configs import (
    BaseEmbeddingConfig,
    EmbeddingBagConfig,
    EmbeddingConfig,
)
from torchrec_tpu.ops.fused_optim import EmbeddingOptimizer
from torchrec_tpu.ops.lookup import (
    accumulate_dense,
    dedup_rows,
    dedup_rows_from_pooled,
    dedup_rows_from_sorted,
    grad_rows,
    pooled_lookup,
    sequence_lookup,
    sorted_window,
)

def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


# tables with at most this many rows take the sort-free dense-gradient
# update path (scatters into small targets are ~5x faster on TPU than into
# multi-million-row tables, and a whole-table fp32 accumulator of 16k x dim
# is only a few MB)
DENSE_GRAD_ROWS_THRESHOLD = 16384
from torchrec_tpu.sparse import JaggedTensor, KeyedJaggedTensor, KeyedTensor
from torchrec_tpu.types import DataType, PoolingType

__all__ = [
    "EmbeddingBagCollection",
    "EmbeddingCollection",
    "TableGroup",
]

Params = Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class TableGroup:
    """Static layout of one stacked same-(dim,dtype) table group.

    Small tables (rows <= DENSE_GRAD_ROWS_THRESHOLD) are packed FIRST in
    the stack; ``small_rows`` marks the boundary. The forward is one fused
    gather+pool pass over the whole stack; the backward splits at the
    boundary — rows below it take the sort-free dense-accumulator update,
    rows above take sort/dedup + sorted-unique scatter.
    """

    key: str  # param-dict key
    dim: int
    data_type: DataType
    table_names: Tuple[str, ...]
    table_rows: Tuple[int, ...]  # rows per table, stacking order
    row_offsets: Tuple[int, ...]  # start row of each table in the stack
    small_rows: int = 0  # rows [0, small_rows) take the dense-update path
    # dead rows appended to the physical blob so the branch-free Pallas
    # write kernel can park dedup sentinels (always in
    # [total_rows, total_rows + window)) at real addresses instead of
    # branching per row. Zero-initialized but NOT guaranteed to stay zero:
    # the _REUSE_FWD_ROWS backward writes old_row(+delta) copies at
    # sentinel positions, so the tail holds batch-dependent garbage. It is
    # never READ (all lookups/updates address logical rows; state_dict
    # export slices [:total_rows]) — never treat it as a zeros source.
    scratch_rows: int = 0
    # colocated rowwise-optimizer state (EBC colocate_rowwise_state):
    # nonzero means flat-small + INTERLEAVED-large storage — the blob is
    # [small + 2*(padded - small), dim]: small rows stay flat (the dense
    # path reads/writes them unchanged), each LARGE logical row r lives
    # at physical pair (base: weights, base+1: state) with base =
    # small + 2*(r - small); the accumulator (stored as a delta from
    # initial_accumulator_value) sits in lane 0 of the state row — the
    # rest padding, since Mosaic DMA slicing permits nothing narrower
    # than a 128-lane row. Logical views de-interleave the large region.
    state_lanes: int = 0
    # TILE-ROW storage for wide fp32 tables (dim > 128, dim % 128 == 0,
    # large region present): the blob is [padded * row_tiles, 128] with
    # logical row r at physical rows r*nt .. r*nt + nt - 1 — the only
    # DMA-sliceable layout for wide rows (Mosaic permits only full-minor
    # [n, 128] slices); the fused backward writes each row as one
    # [nt, 128] DMA. row_tiles == 1 is the plain [padded, dim] blob.
    row_tiles: int = 1

    @property
    def total_rows(self) -> int:
        """LOGICAL rows (sum of member tables) — sentinel/OOB boundary."""
        return self.row_offsets[-1] + self.table_rows[-1]

    @property
    def padded_rows(self) -> int:
        """PHYSICAL blob rows (logical + write-kernel scratch tail)."""
        return self.total_rows + self.scratch_rows


class _EmbeddingCollectionBase:
    """Shared grouping/layout logic for EBC and EC."""

    def __init__(
        self,
        tables: Sequence[BaseEmbeddingConfig],
        scratch_window: Optional[int] = None,
    ):
        if not tables:
            raise ValueError("at least one table config required")
        seen = set()
        for t in tables:
            if not t.name:
                raise ValueError("every table needs a name")
            if t.name in seen:
                raise ValueError(f"duplicate table name {t.name!r}")
            seen.add(t.name)
        self._tables: List[BaseEmbeddingConfig] = list(tables)

        # feature order = concatenation of each table's feature_names
        # (reference embedding_modules.py construction order)
        self._feature_names: List[str] = []
        self._feature_table: List[int] = []  # feature -> table idx
        for ti, t in enumerate(tables):
            for f in t.feature_names:
                if f in self._feature_names:
                    raise ValueError(f"duplicate feature name {f!r}")
                self._feature_names.append(f)
                self._feature_table.append(ti)

        # group tables by (dim, data_type); small tables packed first so the
        # backward can split at a static row boundary (see TableGroup)
        group_map: Dict[Tuple[int, DataType], List[int]] = {}
        for ti, t in enumerate(tables):
            group_map.setdefault((t.embedding_dim, t.data_type), []).append(ti)
        self._groups: List[TableGroup] = []
        self._table_group: Dict[int, Tuple[int, int]] = {}  # table idx -> (group idx, row off)
        for (dim, dt), tids in sorted(
            group_map.items(), key=lambda kv: (kv[0][0], kv[0][1].value)
        ):
            tids = sorted(
                tids, key=lambda ti: tables[ti].num_embeddings > DENSE_GRAD_ROWS_THRESHOLD
            )
            offsets, rows = [], []
            off = 0
            small_rows = 0
            for ti in tids:
                offsets.append(off)
                rows.append(tables[ti].num_embeddings)
                off += tables[ti].num_embeddings
                if tables[ti].num_embeddings <= DENSE_GRAD_ROWS_THRESHOLD:
                    small_rows = off
            # scratch tail for the branch-free write kernel: only groups
            # with a large region take the sort/dedup + Pallas-scatter
            # backward, and only a bounded window (scratch_window =
            # max_unique_gradient_rows) produces sentinels. Rounding to the
            # kernel chunk leaves exactly the kernel's chunk-padding rows
            # free past the sentinel range (pad == round_up(u, c) - u), so
            # parking targets and pad targets never collide.
            scratch = 0
            lanes = (
                128
                if (
                    getattr(self, "_colocate_rowwise_state", False)
                    and dt == DataType.FP32
                    and dim == 128
                    and small_rows < off
                )
                else 0
            )
            tiles = (
                dim // 128
                if (
                    self._TILE_WIDE
                    and dt == DataType.FP32
                    and dim > 128
                    and dim % 128 == 0
                    and small_rows < off
                    and lanes == 0
                )
                else 1
            )
            pack = self._PACK_BF16 and dt == DataType.BF16
            if scratch_window is not None and small_rows < off:
                from torchrec_tpu.ops.tbe_pallas import _CHUNK as _wc

                scratch = -(-scratch_window // _wc) * _wc
                if pack:
                    # pair-granular kernel: sentinels are PAIR indices,
                    # so the tail needs 2x the rows
                    scratch *= 2
            if pack:
                # pair-packed u32 storage needs an EVEN blob row count
                scratch += (off + scratch) % 2
            g = TableGroup(
                key=f"group_d{dim}_{dt.value.lower()}",
                dim=dim,
                data_type=dt,
                table_names=tuple(tables[ti].name for ti in tids),
                table_rows=tuple(rows),
                row_offsets=tuple(offsets),
                small_rows=small_rows,
                scratch_rows=scratch,
                state_lanes=lanes,
                row_tiles=tiles,
            )
            gi = len(self._groups)
            self._groups.append(g)
            for ti, row_off in zip(tids, offsets):
                self._table_group[ti] = (gi, row_off)

        # per-group static per-feature metadata (as numpy; becomes jit consts)
        f_count = len(self._feature_names)
        self._group_feature_pos: List[np.ndarray] = []  # [F+1]: pos in group or -1
        self._group_row_offset: List[np.ndarray] = []  # [F+1]: stack row offset
        self._group_features: List[List[int]] = []  # logical feature idxs per group
        for gi in range(len(self._groups)):
            pos = np.full(f_count + 1, -1, dtype=np.int32)
            roff = np.zeros(f_count + 1, dtype=np.int32)
            feats: List[int] = []
            for fi in range(f_count):
                g_of_table, row_off = self._table_group[self._feature_table[fi]]
                if g_of_table == gi:
                    pos[fi] = len(feats)
                    roff[fi] = row_off
                    feats.append(fi)
            self._group_feature_pos.append(pos)
            self._group_row_offset.append(roff)
            self._group_features.append(feats)

        # per-feature position WITHIN its table's feature list (for the
        # count-matrix fast path: column = local_feature * B + batch)
        self._feat_local = np.zeros(f_count + 1, dtype=np.int32)
        table_feats: Dict[int, int] = {}
        for fi in range(f_count):
            ti = self._feature_table[fi]
            self._feat_local[fi] = table_feats.get(ti, 0)
            table_feats[ti] = self._feat_local[fi] + 1
        self._max_feats_per_table = max(table_feats.values()) if table_feats else 1

    # bf16 group blobs are STORED pair-packed as u32 [padded/2, dim]
    # (tbe_pallas pair-storage section; same "packed at a higher layer"
    # convention as int4/int2 — XLA-level bf16<->u32 views re-tile and
    # copy the whole table on TPU, so the packed form IS the format).
    # EBC-only: EC keeps logical bf16 (its consumers may differentiate
    # through apply, and integer leaves take no AD cotangent).
    _PACK_BF16 = False
    # tile-row storage for wide fp32 groups (TableGroup.row_tiles) —
    # EBC-only, like packing: EC reads blobs directly in its sequence
    # lookup and keeps the plain [padded, dim] layout
    _TILE_WIDE = False

    def _pack_group(self, g: TableGroup) -> bool:
        return self._PACK_BF16 and g.data_type == DataType.BF16

    def _table_f32(self, gi: int, params: "Params"):
        """Lazy logical-f32 view of the group blob (built at most once
        per trace). Pair-packed groups pay a FULL unpack — fallback paths
        only; the v3 fast paths consume pair words directly."""
        g = self._groups[gi]
        cell: List[jnp.ndarray] = []

        def get():
            if not cell:
                blob = params[g.key]
                if self._pack_group(g):
                    from torchrec_tpu.ops.tbe_pallas import (
                        unpack_pair_blob,
                    )

                    cell.append(unpack_pair_blob(blob))
                elif g.data_type != DataType.FP32:
                    cell.append(blob.astype(jnp.float32))
                elif g.state_lanes:
                    cell.append(
                        self._colo_logical(blob, g.small_rows, g.dim)
                    )
                elif g.row_tiles > 1:
                    cell.append(blob.reshape(-1, g.dim))
                else:
                    cell.append(blob)
            return cell[0]

        return get

    @staticmethod
    def _colo_pair_gather(blob, base, dim: int):
        """Colocated blob: fetch (weights, state) pairs at PHYSICAL
        pair-base rows ``base`` as [u, 2*dim] — columns [:dim] =
        weights, [dim] = accumulator delta. Two single-row gathers
        (XLA's row-gather fast path; a (2, dim)-slice gather lowers to
        a slow sequential form on TPU)."""
        w = jnp.take(blob, base, axis=0, indices_are_sorted=True)
        st = jnp.take(blob, base + 1, axis=0, indices_are_sorted=True)
        return jnp.concatenate([w, st], axis=1)

    @staticmethod
    def _tile_row_gather(blob, ids, nt: int):
        """Tile-row blob [R*nt, 128]: fetch logical rows as [u, nt*128]
        via nt single-row gathers (XLA's row-gather fast path)."""
        return jnp.concatenate(
            [
                jnp.take(
                    blob, ids * nt + t, axis=0, indices_are_sorted=True
                )
                for t in range(nt)
            ],
            axis=1,
        )

    @staticmethod
    def _colo_logical(blob, small: int, dim: int):
        """Colocated blob -> logical [rows, dim] weight view (export /
        fallback paths; a strided-copy of the large region)."""
        return jnp.concatenate([blob[:small], blob[small::2]])

    def _small_f32(self, gi: int, params: "Params") -> jnp.ndarray:
        """Logical-f32 rows covering the SMALL region (possibly one spare
        row past it for pair-packed groups with an odd small boundary) —
        keeps the per-step small-path unpack O(small), not O(table)."""
        g = self._groups[gi]
        if g.state_lanes:
            # the colocated layout keeps the small region FLAT
            return params[g.key][: g.small_rows]
        if g.row_tiles > 1:
            return params[g.key][
                : g.small_rows * g.row_tiles
            ].reshape(g.small_rows, g.dim)
        if not self._pack_group(g):
            return self._table_f32(gi, params)()
        from torchrec_tpu.ops.tbe_pallas import unpack_pair_blob

        ps = (g.small_rows + 1) // 2
        return unpack_pair_blob(params[g.key][:ps])

    # -- public structural accessors (reference parity) -----------------------
    def feature_names(self) -> List[str]:
        return list(self._feature_names)

    @property
    def groups(self) -> List[TableGroup]:
        return list(self._groups)

    def init(self, key: jax.Array) -> Params:
        """Initialize group-stacked table params.

        Each table's rows are initialized with its own init_fn on its own
        PRNG fold, so grouping does not change numerics vs per-table init.
        """
        params: Params = {}
        for g in self._groups:
            dtype = g.data_type.as_jnp()
            parts = []
            for tname, rows in zip(g.table_names, g.table_rows):
                t = next(t for t in self._tables if t.name == tname)
                # stable fold: python's str hash is salted per process, so
                # hash(tname) would give each host/run DIFFERENT weights
                # from the same seed (multi-host replicated init diverges)
                import zlib

                sub = jax.random.fold_in(
                    key, zlib.crc32(tname.encode()) % (2**31)
                )
                parts.append(t.get_weight_init_fn()(sub, (rows, g.dim), dtype))
            if g.scratch_rows:
                parts.append(jnp.zeros((g.scratch_rows, g.dim), dtype))
            blob = jnp.concatenate(parts, axis=0)
            if self._pack_group(g):
                from torchrec_tpu.ops.tbe_pallas import pack_pair_blob

                blob = pack_pair_blob(blob)
            if g.state_lanes:
                # flat small region + interleaved zero state rows for
                # the large region (see TableGroup.state_lanes)
                lg = blob[g.small_rows:]
                blob = jnp.concatenate([
                    blob[: g.small_rows],
                    jnp.concatenate(
                        [lg, jnp.zeros_like(lg)], axis=1
                    ).reshape(2 * lg.shape[0], g.dim),
                ])
            if g.row_tiles > 1:
                blob = blob.reshape(-1, 128)
            params[g.key] = blob
        return params

    def table_slice(self, params: Params, table_name: str) -> jnp.ndarray:
        """View of one table's rows inside its group stack (for state_dict
        naming / checkpoint parity with per-table FQNs)."""
        for gi, g in enumerate(self._groups):
            if table_name in g.table_names:
                i = g.table_names.index(table_name)
                off, rows = g.row_offsets[i], g.table_rows[i]
                blob = params[g.key]
                if self._pack_group(g):
                    from torchrec_tpu.ops.tbe_pallas import (
                        unpack_pair_blob,
                    )

                    blob = unpack_pair_blob(blob).astype(
                        g.data_type.as_jnp()
                    )
                if g.state_lanes:
                    blob = self._colo_logical(blob, g.small_rows, g.dim)
                if g.row_tiles > 1:
                    blob = blob.reshape(-1, g.dim)
                return blob[off : off + rows]
        raise KeyError(table_name)

    def split_params(self, params: Params) -> Dict[str, jnp.ndarray]:
        """Per-table FQN -> weight views (state_dict analog)."""
        return {t.name: self.table_slice(params, t.name) for t in self._tables}

    def params_from_tables(
        self, per_table: Dict[str, np.ndarray]
    ) -> Params:
        """Inverse of :meth:`split_params`: assemble the group-stacked
        param pytree from per-table full weight arrays (state_dict load —
        reference load_state_dict semantics). Every table must be present
        with its exact [rows, dim] shape; scratch tails are zeroed."""
        params: Params = {}
        for g in self._groups:
            dtype = g.data_type.as_jnp()
            parts = []
            for tname, rows in zip(g.table_names, g.table_rows):
                if tname not in per_table:
                    raise KeyError(f"missing table {tname!r}")
                w = np.asarray(per_table[tname])
                if w.shape != (rows, g.dim):
                    raise ValueError(
                        f"table {tname!r}: expected {(rows, g.dim)}, "
                        f"got {w.shape}"
                    )
                parts.append(jnp.asarray(w, dtype))
            if g.scratch_rows:
                parts.append(jnp.zeros((g.scratch_rows, g.dim), dtype))
            blob = jnp.concatenate(parts, axis=0)
            if self._pack_group(g):
                from torchrec_tpu.ops.tbe_pallas import pack_pair_blob

                blob = pack_pair_blob(blob)
            if g.state_lanes:
                # flat small region + interleaved zero state rows for
                # the large region (see TableGroup.state_lanes)
                lg = blob[g.small_rows:]
                blob = jnp.concatenate([
                    blob[: g.small_rows],
                    jnp.concatenate(
                        [lg, jnp.zeros_like(lg)], axis=1
                    ).reshape(2 * lg.shape[0], g.dim),
                ])
            if g.row_tiles > 1:
                blob = blob.reshape(-1, 128)
            params[g.key] = blob
        return params

    def init_optimizer(
        self, params: Params, optimizer: "EmbeddingOptimizer"
    ) -> Dict[str, Dict[str, jnp.ndarray]]:
        """Per-group fused optimizer state (TBE-internal state analog,
        batched_embedding_kernel.py:1215). State covers LOGICAL rows only —
        the write-kernel scratch tail carries no optimizer state (sentinel
        scatters drop against the logical bound)."""
        # every optimizer init reads only shape/dtype, so a LOGICAL dummy
        # serves every storage layout (pair-packed u32 rows would halve
        # row counts and break the bf16 stochastic-rounding dtype check;
        # compile-only AOT clients hand in ShapeDtypeStructs that cannot
        # be sliced)
        return {
            g.key: optimizer.init(
                jnp.zeros((g.total_rows, g.dim), g.data_type.as_jnp())
            )
            for g in self._groups
        }

    def materialize_optimizer_state(
        self, params: Params, opt_states, optimizer: "EmbeddingOptimizer"
    ) -> Dict[str, Dict[str, np.ndarray]]:
        """Per-table LOGICAL optimizer-state views for EVERY storage
        layout — the reference exposes each kernel's internal state as
        KeyedOptimizer-visible views
        (torchrec/distributed/batched_embedding_kernel.py:1215); this is
        the export half for layouts whose state does not live in plain
        logical arrays. Returns ``{table: {state key: np.ndarray}}``
        covering row-shaped state; colocated layouts
        (``colocate_rowwise_state``) read the large-region accumulator
        from the blob's state-lane rows (stored as a delta from
        ``initial_accumulator_value``). Scalar state (the stochastic-
        rounding counter) is module-global and round-trips through the
        raw pytree instead."""
        out: Dict[str, Dict[str, np.ndarray]] = {
            t.name: {} for t in self._tables
        }
        for g in self._groups:
            st = opt_states[g.key]
            logical: Dict[str, np.ndarray] = {}
            for k, v in st.items():
                v = np.asarray(jax.device_get(v))
                if not v.ndim or v.shape[0] != g.total_rows:
                    continue  # scalar / non-row state
                if g.state_lanes and k == "momentum":
                    blob = np.asarray(jax.device_get(params[g.key]))
                    iav = float(
                        getattr(optimizer, "initial_accumulator_value", 0.0)
                    )
                    large = (
                        iav
                        + blob[g.small_rows + 1 :: 2, 0][
                            : g.total_rows - g.small_rows
                        ]
                    )
                    v = np.concatenate([v[: g.small_rows], large])
                logical[k] = v
            for name, off, rows in zip(
                g.table_names, g.row_offsets, g.table_rows
            ):
                for k, v in logical.items():
                    out[name][k] = np.asarray(v[off : off + rows])
        return out

    def optimizer_state_from_tables(
        self,
        params: Params,
        optimizer: "EmbeddingOptimizer",
        per_table: Dict[str, Dict[str, np.ndarray]],
        opt_states=None,
    ):
        """Inverse of :meth:`materialize_optimizer_state`: rebuild the
        group state pytrees (AND, for colocated layouts, the blob's
        state-lane rows) from per-table logical state arrays. Returns
        ``(params, opt_states)`` — params change only for colocated
        groups. Tables/keys missing from ``per_table`` keep fresh-init
        state. This is the supported way to restore a colocated module
        from a reference-format checkpoint: rebuilding from weights
        alone resets every large-region accumulator to its initial
        value."""
        if opt_states is None:
            opt_states = self.init_optimizer(params, optimizer)
        new_params = dict(params)
        new_states = {k: dict(v) for k, v in opt_states.items()}
        for g in self._groups:
            st = new_states[g.key]
            keys = {
                k
                for k, v in st.items()
                if getattr(v, "ndim", 0) and v.shape[0] == g.total_rows
            }
            for k in keys:
                parts = []
                for name, rows in zip(g.table_names, g.table_rows):
                    tp = per_table.get(name, {})
                    if k not in tp:
                        parts = None
                        break
                    arr = np.asarray(tp[k])
                    if arr.shape[0] != rows:
                        raise ValueError(
                            f"state {k!r} for table {name!r}: expected "
                            f"{rows} rows, got {arr.shape[0]}"
                        )
                    parts.append(arr)
                if parts is None:
                    continue
                full = np.concatenate(parts, axis=0)
                if g.state_lanes and k == "momentum":
                    iav = float(
                        getattr(optimizer, "initial_accumulator_value", 0.0)
                    )
                    blob = np.array(
                        jax.device_get(new_params[g.key]), copy=True
                    )
                    n_large = g.total_rows - g.small_rows
                    idx = g.small_rows + 1 + 2 * np.arange(n_large)
                    blob[idx, 0] = full[g.small_rows :] - iav
                    new_params[g.key] = jnp.asarray(blob)
                st[k] = jnp.asarray(full, st[k].dtype)
        return new_params, new_states

    def _prep(self, kjt: KeyedJaggedTensor):
        """Align the KJT to this module's feature order; compute shared
        slot-level index arrays."""
        kjt = kjt.select_keys(self._feature_names)
        b = kjt.stride()
        f = len(self._feature_names)
        seg = kjt.segment_ids()  # [cap], OOB = f*b
        slot_feature = jnp.minimum(seg // b, f)  # [cap], pad -> f
        slot_batch = seg % jnp.int32(b)
        return kjt, b, f, seg, slot_feature, slot_batch

    def _group_indices(self, gi, values, seg, slot_feature, slot_batch, b):
        """Per-slot (ids, segments) for group gi; non-member slots -> OOB."""
        n_gf = len(self._group_features[gi])
        pos = jnp.asarray(self._group_feature_pos[gi])  # [F+1]
        roff = jnp.asarray(self._group_row_offset[gi])  # [F+1]
        slot_pos = jnp.take(pos, slot_feature)  # [cap]
        in_group = slot_pos >= 0
        ids_g = values + jnp.take(roff, slot_feature)
        seg_g = jnp.where(in_group, slot_pos * b + slot_batch, n_gf * b)
        return ids_g, seg_g, in_group, n_gf


class EmbeddingBagCollection(_EmbeddingCollectionBase):
    """Pooled lookups: ``apply(params, KJT) -> KeyedTensor``.

    Reference: torchrec/modules/embedding_modules.py:129. Weighted EBCs
    (per-id weights, e.g. from feature processors) require a weighted KJT
    and force SUM pooling, matching nn.EmbeddingBag semantics.

    bf16 groups store their blob PAIR-PACKED as u32 [padded/2, dim]
    (see tbe_pallas pair-storage section — Mosaic cannot DMA 256-byte
    rows, so the packed form is the only layout with a fast sparse
    backward); :meth:`table_slice`/:meth:`split_params` present logical
    bf16 views.
    """

    _PACK_BF16 = True
    _TILE_WIDE = True

    def __init__(
        self,
        tables: Sequence[EmbeddingBagConfig],
        is_weighted: bool = False,
        max_unique_gradient_rows: Optional[int] = None,
        colocate_rowwise_state: bool = False,
    ):
        """``max_unique_gradient_rows``: optional perf hint — an upper bound
        on large-table value SLOTS per step (sum over large tables of
        batch*pooling_factor, plus margin; always >= distinct touched rows).
        The backward sorts ids and then runs ALL row-width work on this
        bound instead of the full padded stream. UNCHECKED: if exceeded,
        excess slots' gradients are dropped (like the reference trusting
        ParameterConstraints.pooling_factors).

        ``colocate_rowwise_state``: fp32 groups with a large region carry
        a 128-lane state block on the blob; a rowwise optimizer's
        accumulator for LARGE-region rows rides the table-row DMAs (no
        scalar state passes in the fused backward — FBGEMM's momentum1
        co-location, at 512 B/row of HBM since lane tiling forbids
        narrower slices). Small-region rows keep using the state-dict
        accumulator (the dense path); large-region entries of that dict
        are unused. Requires an optimizer with
        ``supports_colocated_state`` (RowWiseAdagrad, fp32, no SR)."""
        self._colocate_rowwise_state = colocate_rowwise_state
        super().__init__(tables, scratch_window=max_unique_gradient_rows)
        self._is_weighted = is_weighted
        self._max_unique = max_unique_gradient_rows
        self._poolings: List[PoolingType] = [
            tables[self._feature_table[fi]].pooling
            for fi in range(len(self._feature_names))
        ]

    def is_weighted(self) -> bool:
        return self._is_weighted

    def embedding_bag_configs(self) -> List[EmbeddingBagConfig]:
        return list(self._tables)  # type: ignore[return-value]

    def embedding_dims(self) -> List[int]:
        return [
            self._tables[self._feature_table[fi]].embedding_dim
            for fi in range(len(self._feature_names))
        ]

    # ------------------------------------------------------ count-matrix path
    def _group_small_feats(self, gi: int) -> List[int]:
        """Logical feature ids of this group whose table is in the small
        (count-matmul) region, in group order."""
        return [
            fi for fi in self._group_features[gi]
            if self._tables[self._feature_table[fi]].num_embeddings
            <= DENSE_GRAD_ROWS_THRESHOLD
        ]

    def _use_count_matmul(self, gi: int, b: int) -> bool:
        """Small-table fast path gate: pooling AND gradient accumulation for
        small tables run as size-bucketed batched matmuls against ONE
        per-batch count tensor (built by a single scalar scatter, CSE-shared
        by forward and backward). XLA's per-slot gather/segment-sum path is
        issue-rate bound (~45 ns per scattered row on v5e); the count
        scatter costs ~5 ns per slot and the MXU does the rest."""
        g = self._groups[gi]
        if g.small_rows == 0 or not self._group_small_feats(gi):
            return False
        plan = self._small_plan(gi)
        return plan["flat_size"] * b * 4 <= 96 * 2**20

    def _small_plan(self, gi: int) -> Dict:
        """Static bucketed layout of this group's small tables: tables pad
        to the next power of two rows and stack into per-bucket [n_t, R_pad]
        tensors (FLOP waste <= 2x, and the MXU has FLOPs to burn)."""
        cache = getattr(self, "_small_plan_cache", None)
        if cache is None:
            cache = self._small_plan_cache = {}
        if gi in cache:
            return cache[gi]
        g = self._groups[gi]
        k = self._max_feats_per_table
        # small tables in group order
        smalls = [
            (i, name, off, rows)
            for i, (name, off, rows) in enumerate(
                zip(g.table_names, g.row_offsets, g.table_rows)
            )
            if off < g.small_rows
        ]
        buckets: Dict[int, List] = {}
        for i, name, off, rows in smalls:
            rpad = 1 << max(int(np.ceil(np.log2(max(rows, 1)))), 3)
            buckets.setdefault(rpad, []).append((i, name, off, rows))
        bucket_list = []
        # per-feature scatter base (flat index, excluding row/batch terms)
        f_count = len(self._feature_names)
        feat_base = np.full(f_count + 1, -1, np.int64)
        feat_roff = np.zeros(f_count + 1, np.int64)
        flat_off = 0  # in units of k (column j) — multiplied by b at use
        out_blocks = []  # (feature fi, flat column start) for routing
        for rpad in sorted(buckets):
            tabs = buckets[rpad]
            # gather indices building Tb [n_t * rpad] from group blob rows
            tb_idx = np.full(len(tabs) * rpad, -1, np.int64)
            for pos, (ti_g, name, off, rows) in enumerate(tabs):
                tb_idx[pos * rpad : pos * rpad + rows] = np.arange(off, off + rows)
                tbl_idx = next(
                    ii for ii, t in enumerate(self._tables) if t.name == name
                )
                for fi in [
                    ii for ii, t in enumerate(self._feature_table)
                    if t == tbl_idx
                ]:
                    j = int(self._feat_local[fi])
                    feat_base[fi] = flat_off + (pos * rpad) * k + j
                    feat_roff[fi] = off
                    out_blocks.append((fi, flat_off + pos * (rpad * k) + j))
            bucket_list.append(
                {
                    "rpad": rpad,
                    "n_t": len(tabs),
                    "tb_idx": tb_idx,
                    "flat_off": flat_off,
                    "tabs": tabs,
                }
            )
            flat_off += len(tabs) * rpad * k
        # acc routing in ROW units: small row -> (bucket, pos, local row)
        # position within the concatenated [sum n_t*rpad] acc rows
        total_rows_flat = sum(bk["n_t"] * bk["rpad"] for bk in bucket_list)
        acc_src = np.full(g.small_rows, total_rows_flat, np.int64)
        row_off = 0
        for bk in bucket_list:
            for pos, (ti_g, name, off, rows) in enumerate(bk["tabs"]):
                acc_src[off : off + rows] = (
                    row_off + pos * bk["rpad"] + np.arange(rows)
                )
            row_off += bk["n_t"] * bk["rpad"]
        plan = {
            "buckets": bucket_list,
            "feat_base": feat_base,
            "feat_roff": feat_roff,
            "acc_src": acc_src,
            "flat_size": flat_off,
            "k": k,
        }
        cache[gi] = plan
        return plan

    def _count_tensor(
        self, gi: int, ids_g, slot_feature, slot_batch, in_group, weights,
        b: int,
    ) -> jnp.ndarray:
        """Flat count tensor C [flat_size * b] (bucketed layout; see
        _small_plan): one scalar scatter over the whole slot stream."""
        g = self._groups[gi]
        plan = self._small_plan(gi)
        k = plan["k"]
        base = jnp.take(jnp.asarray(plan["feat_base"]), slot_feature)
        roff = jnp.take(jnp.asarray(plan["feat_roff"]), slot_feature)
        valid = in_group & (ids_g < g.small_rows) & (base >= 0)
        local_row = (ids_g - roff).astype(jnp.int64)
        flat = jnp.where(
            valid,
            (base + local_row * k) * b + slot_batch,
            plan["flat_size"] * b,
        )
        w = (
            weights.astype(jnp.float32)
            if weights is not None
            else jnp.ones(flat.shape, jnp.float32)
        )
        return jnp.zeros((plan["flat_size"] * b,), jnp.float32).at[flat].add(
            jnp.where(valid, w, 0.0), mode="drop"
        )

    def _count_matrix_v1(
        self, gi: int, ids_g, slot_feature, slot_batch, in_group, weights,
        b: int,
    ) -> jnp.ndarray:
        """Compact count matrix C [small_rows, k*B] (columns = feature
        position WITHIN the table x batch); consumed by per-table matmuls.
        Smaller than the bucketed tensor (5 MB vs 20 MB at the headline
        shapes) at the cost of one tiny matmul per small table."""
        g = self._groups[gi]
        k = self._max_feats_per_table
        local = jnp.take(jnp.asarray(self._feat_local), slot_feature)
        col = local * b + slot_batch
        valid = in_group & (ids_g < g.small_rows)
        flat = jnp.where(valid, ids_g * (k * b) + col, g.small_rows * k * b)
        w = (
            weights.astype(jnp.float32)
            if weights is not None
            else jnp.ones(flat.shape, jnp.float32)
        )
        C = jnp.zeros((g.small_rows * k * b,), jnp.float32).at[flat].add(
            jnp.where(valid, w, 0.0), mode="drop"
        )
        return C.reshape(g.small_rows, k * b)

    def _count_matrix_v2(
        self, gi: int, ids_g, slot_feature, slot_batch, in_group, weights,
        b: int,
    ) -> jnp.ndarray:
        """Same C as _count_matrix_v1, built ROW-granular: one-hot column
        vectors [N, k*B] segment-summed by small-row id. XLA's 2D scatter-add
        issues per ROW (~2.5 ns, like the forward pooling segment_sum) vs
        ~9.6 ns per SCALAR for the flat .at[].add path — and the one-hot
        construction fuses into the scatter's update computation."""
        g = self._groups[gi]
        k = self._max_feats_per_table
        local = jnp.take(jnp.asarray(self._feat_local), slot_feature)
        col = local * b + slot_batch  # [N] in [0, k*b)
        valid = in_group & (ids_g < g.small_rows)
        w = (
            weights.astype(jnp.float32)
            if weights is not None
            else jnp.ones(col.shape, jnp.float32)
        )
        w = jnp.where(valid, w, 0.0)
        onehot = (
            col[:, None] == jnp.arange(k * b, dtype=col.dtype)[None, :]
        ).astype(jnp.float32) * w[:, None]
        seg = jnp.where(valid, ids_g, g.small_rows)
        return jax.ops.segment_sum(
            onehot, seg, num_segments=g.small_rows + 1
        )[: g.small_rows]

    def _small_pool_matmul_v1(self, gi, C, table_f32, b):
        g = self._groups[gi]
        k = self._max_feats_per_table
        n_gf = len(self._group_features[gi])
        gpos = self._group_feature_pos[gi]
        pooled = jnp.zeros((n_gf * b, g.dim), jnp.float32)
        for ti_name, off, rows in zip(
            g.table_names, g.row_offsets, g.table_rows
        ):
            if off >= g.small_rows:
                continue
            pool_all = jnp.dot(
                C[off : off + rows].T, table_f32[off : off + rows],
                preferred_element_type=jnp.float32,
            )  # [k*B, dim]
            tbl_idx = next(
                ii for ii, t in enumerate(self._tables) if t.name == ti_name
            )
            for fi in [
                ii for ii, t in enumerate(self._feature_table) if t == tbl_idx
            ]:
                p = int(gpos[fi])
                j = int(self._feat_local[fi])
                pooled = pooled.at[p * b : (p + 1) * b].set(
                    pool_all[j * b : (j + 1) * b]
                )
        return pooled

    def _small_pool_matmul_v1_packed(self, gi, C, blob, b):
        """Packed-bf16 sibling of :meth:`_small_pool_matmul_v1`: pools
        straight from the u32 PAIR blob — parity-split count rows (a
        cheap [small, kb] -> [ps, 2, kb] reshape) matmul against the
        contiguous-half unpacked even/odd tables, so the small region is
        never unpacked to logical layout (the ~66 us/step
        unpack_pair_blob this replaces was the forward's share of the
        bf16 small-path cost)."""
        from torchrec_tpu.ops.tbe_pallas import (
            _half_inv_perm,
            _unpack_pair_half,
        )

        g = self._groups[gi]
        small = g.small_rows
        ps = (small + 1) // 2
        d2 = g.dim // 2
        n_gf = len(self._group_features[gi])
        gpos = self._group_feature_pos[gi]
        E = _unpack_pair_half(blob[:ps, :d2])  # [ps, dim] half lanes, even
        O = _unpack_pair_half(blob[:ps, d2:])  # odd rows
        pad = 2 * ps - C.shape[0]
        Cp = (
            jnp.concatenate([C, jnp.zeros((pad, C.shape[1]), C.dtype)])
            if pad > 0 else C[: 2 * ps]
        )
        Cr = Cp.reshape(ps, 2, C.shape[1])
        Ce, Co = Cr[:, 0], Cr[:, 1]
        inv = jnp.asarray(_half_inv_perm(g.dim))
        pooled = jnp.zeros((n_gf * b, g.dim), jnp.float32)
        for ti_name, off, rows in zip(
            g.table_names, g.row_offsets, g.table_rows
        ):
            if off >= small:
                continue
            p_lo, p_hi = off // 2, (off + rows + 1) // 2
            # mask boundary pairs' rows that belong to NEIGHBOR tables
            # (their counts alias this table's shared kb columns)
            r_idx = 2 * np.arange(p_lo, p_hi)
            m_e = jnp.asarray(
                ((r_idx >= off) & (r_idx < off + rows)).astype(np.float32)
            )[:, None]
            m_o = jnp.asarray(
                (((r_idx + 1) >= off) & ((r_idx + 1) < off + rows)).astype(
                    np.float32
                )
            )[:, None]
            pool_half = jnp.dot(
                (Ce[p_lo:p_hi] * m_e).T, E[p_lo:p_hi],
                preferred_element_type=jnp.float32,
            ) + jnp.dot(
                (Co[p_lo:p_hi] * m_o).T, O[p_lo:p_hi],
                preferred_element_type=jnp.float32,
            )  # [k*B, dim] half lanes
            tbl_idx = next(
                ii for ii, t in enumerate(self._tables) if t.name == ti_name
            )
            for fi in [
                ii for ii, t in enumerate(self._feature_table) if t == tbl_idx
            ]:
                p = int(gpos[fi])
                j = int(self._feat_local[fi])
                pooled = pooled.at[p * b : (p + 1) * b].set(
                    jnp.take(
                        pool_half[j * b : (j + 1) * b], inv, axis=1
                    )
                )
        return pooled

    def _small_acc_matmul_v1_packed(self, gi, C, pooled_grad, b):
        """Packed-bf16 backward sibling: returns ``(acc_eo [2ps, dim]
        HALF lanes — even rows then odd rows — plus touched [small])``
        for :meth:`_packed_small_dense_update_half`; the gradient source
        is the TINY pooled_grad permuted to half lanes once."""
        from torchrec_tpu.ops.tbe_pallas import _half_fwd_perm

        g = self._groups[gi]
        small = g.small_rows
        ps = (small + 1) // 2
        k = self._max_feats_per_table
        gpos = self._group_feature_pos[gi]
        pg_h = jnp.take(
            pooled_grad, jnp.asarray(_half_fwd_perm(g.dim)), axis=1
        )
        pad = 2 * ps - C.shape[0]
        Cp = (
            jnp.concatenate([C, jnp.zeros((pad, C.shape[1]), C.dtype)])
            if pad > 0 else C[: 2 * ps]
        )
        Cr = Cp.reshape(ps, 2, C.shape[1])
        Ce, Co = Cr[:, 0], Cr[:, 1]
        acc_e = jnp.zeros((ps, g.dim), jnp.float32)
        acc_o = jnp.zeros((ps, g.dim), jnp.float32)
        for ti_name, off, rows in zip(
            g.table_names, g.row_offsets, g.table_rows
        ):
            if off >= small:
                continue
            tbl_idx = next(
                ii for ii, t in enumerate(self._tables) if t.name == ti_name
            )
            G_t = jnp.zeros((k * b, g.dim), jnp.float32)
            for fi in [
                ii for ii, t in enumerate(self._feature_table) if t == tbl_idx
            ]:
                p = int(gpos[fi])
                j = int(self._feat_local[fi])
                G_t = jax.lax.dynamic_update_slice(
                    G_t, pg_h[p * b : (p + 1) * b], (j * b, 0)
                )
            p_lo, p_hi = off // 2, (off + rows + 1) // 2
            r_idx = 2 * np.arange(p_lo, p_hi)
            m_e = jnp.asarray(
                ((r_idx >= off) & (r_idx < off + rows)).astype(np.float32)
            )[:, None]
            m_o = jnp.asarray(
                (((r_idx + 1) >= off) & ((r_idx + 1) < off + rows)).astype(
                    np.float32
                )
            )[:, None]
            acc_e = jax.lax.dynamic_update_slice(
                acc_e,
                acc_e[p_lo:p_hi]
                + m_e
                * jnp.dot(
                    Ce[p_lo:p_hi], G_t, preferred_element_type=jnp.float32
                ),
                (p_lo, 0),
            )
            acc_o = jax.lax.dynamic_update_slice(
                acc_o,
                acc_o[p_lo:p_hi]
                + m_o
                * jnp.dot(
                    Co[p_lo:p_hi], G_t, preferred_element_type=jnp.float32
                ),
                (p_lo, 0),
            )
        touched = jnp.sum(jnp.abs(C[:small]), axis=1) > 0
        return jnp.concatenate([acc_e, acc_o], axis=0), touched

    def _small_acc_matmul_v1(self, gi, C, pooled_grad, b):
        g = self._groups[gi]
        k = self._max_feats_per_table
        gpos = self._group_feature_pos[gi]
        acc = jnp.zeros((g.small_rows, g.dim), jnp.float32)
        for ti_name, off, rows in zip(
            g.table_names, g.row_offsets, g.table_rows
        ):
            if off >= g.small_rows:
                continue
            tbl_idx = next(
                ii for ii, t in enumerate(self._tables) if t.name == ti_name
            )
            G_t = jnp.zeros((k * b, g.dim), jnp.float32)
            for fi in [
                ii for ii, t in enumerate(self._feature_table) if t == tbl_idx
            ]:
                p = int(gpos[fi])
                j = int(self._feat_local[fi])
                G_t = jax.lax.dynamic_update_slice(
                    G_t, pooled_grad[p * b : (p + 1) * b], (j * b, 0)
                )
            acc = jax.lax.dynamic_update_slice(
                acc,
                jnp.dot(C[off : off + rows], G_t,
                        preferred_element_type=jnp.float32),
                (off, 0),
            )
        touched = jnp.sum(jnp.abs(C), axis=1) > 0
        return acc, touched

    # which count-matrix builder to use for the small-table matmul path:
    #   "v3": shared group-wide sort + Pallas block-diagonal one-hot
    #         count-matmul (ops/tbe_pallas.py::sorted_count_matrix, ~115 us
    #         at the DLRM headline shapes vs ~770 us for the v2 scatter);
    #         requires TPU (or _CM_FORCE_V3 for interpret-mode tests) and
    #         max_unique set — otherwise falls back to v2 per group.
    #         Weighted KJTs co-sort weights as a payload (two-limb bf16
    #         count matmul); multi-feature tables co-sort the count column
    #         (feat_local * b + batch) as a payload.
    #   "v2": row-granular one-hot segment-sum (~2.5 ns/slot).
    #   "v1": flat scalar scatter-add (~9.6 ns/slot).
    _CM_IMPL = "v3"
    _CM_FORCE_V3 = False
    # hand the v3 backward the forward's gathered window rows as the
    # optimizer's old_rows (CSE removes one 20.5k-row gather); A/B gate
    _REUSE_FWD_ROWS = True
    # ONE-launch fused small-path matmul kernels (vs per-table XLA loops);
    # A/B gate, auto-falls-back when the pooled block exceeds VMEM.
    # Real-TPU in-context A/B (v5e, all three headline scales): ON wins
    # 1.314->1.281 / 1.398->1.383 / 1.559->1.551 ms/step; CPU-mesh
    # equivalence in tests/test_small_fused.py.
    _SMALL_MM_FUSED = True
    _CM_PACKED_SORT = True  # single-u32 packed sort when (key, seg) fit  # tests: run v3 with interpret kernels off-TPU
    # A/B gates for the bf16 small-path forms (parity-split matmuls off
    # the raw pair blob vs unpack + plain matmuls): measured separately
    # on v5e — see CLAUDE.md perf notes
    _PACKED_SMALL_MM = False  # measured 1.285 vs 1.241 ms/step: per-table
    # matmul-loop overhead doubles and eats the unpack savings
    _PACKED_SMALL_HALF_BWD = False  # measured 1.282 vs 1.241: same story
    # ONE-launch fused small-path kernels for PAIR-PACKED bf16 blobs
    # (in-kernel pair unpack + parity-split one-hot matmuls; the XLA
    # forms above lost to per-table loop overhead — the kernels keep the
    # single launch)
    _PACKED_SMALL_FUSED = True
    # fused backward tail (run segsum + optimizer + write in ONE Pallas
    # pass, tbe_pallas.row_scatter_write_segscan[_rowwise]) when the
    # optimizer supports it (SGD and RowWiseAdagrad on lane-aligned fp32
    # OR bf16 tables, with or without stochastic rounding — see
    # supports_segscan_update); A/B gate
    _FUSED_BWD_SEGSCAN = True

    def _cm_impl(self, gi: int, weights) -> str:
        impl = self._CM_IMPL
        if impl != "v3":
            return impl
        if self._max_unique is None:
            return "v2"
        if self._CM_FORCE_V3:
            return "v3"
        try:
            on_tpu = jax.devices()[0].platform == "tpu"
        except Exception:  # pragma: no cover - no backend at trace time
            on_tpu = False
        return "v3" if on_tpu else "v2"

    def _sorted_stream_v3(
        self, gi, ids_g, seg_g, in_group, weights, b,
        slot_feature=None, slot_batch=None,
    ):
        """ONE ascending sort of the whole group slot stream by stacked row
        id (small tables first by layout, then large, then invalid
        sentinels). Forward compact gather, backward dedup, and the count
        kernel all consume it; identical expressions here and in the
        backward make XLA CSE the sort across the step.

        Returns ``(sk, ss, sw, scol, n_small)``. ``scol`` (multi-feature
        tables only, else None) is the count-matrix column of each slot —
        ``feat_local * b + batch`` — carried through the sort as a payload
        (the slot->feature map is jagged, so it cannot be reconstructed
        from the sorted stream)."""
        g = self._groups[gi]
        total = g.total_rows
        n_gf = len(self._group_features[gi])
        key = jnp.where(in_group, ids_g, total)
        seg = jnp.where(in_group, seg_g, n_gf * b)
        payloads = []
        col = None
        if self._max_feats_per_table > 1:
            local = jnp.take(
                jnp.asarray(self._feat_local), slot_feature
            )
            col = (local * b + slot_batch).astype(jnp.int32)
            payloads.append(col)
        if weights is not None:
            payloads.append(weights)
        seg_bits = max((n_gf * b + 1).bit_length(), 1)
        if self._CM_PACKED_SORT and (total + 1) < (1 << (32 - seg_bits)):
            # pack (key, seg) into ONE uint32 sort operand: (key << bits) |
            # seg sorts by key first (seg co-sorts inside ties, harmless);
            # one fewer payload through the sort network
            packed = (
                key.astype(jnp.uint32) << seg_bits
            ) | seg.astype(jnp.uint32)
            # is_stable=False everywhere: XLA lowers STABLE sorts with an
            # extra iota tie-breaker payload through the whole sort
            # network. Every consumer of this stream (count kernel, window
            # segment-sum, dedup run structure, run-sum backward) is
            # order-invariant within equal keys, and payload operands stay
            # PAIRED with their key either way — only within-tie order
            # (hence float summation order) changes.
            sp, *sorted_payloads = jax.lax.sort(
                (packed, *payloads), num_keys=1, is_stable=False
            )
            sk = (sp >> seg_bits).astype(jnp.int32)
            ss = (sp & jnp.uint32((1 << seg_bits) - 1)).astype(jnp.int32)
        else:
            sk, ss, *sorted_payloads = jax.lax.sort(
                (key, seg, *payloads), num_keys=1, is_stable=False
            )
        scol = sorted_payloads.pop(0) if col is not None else None
        sw = sorted_payloads.pop(0) if weights is not None else None
        n_small = jnp.sum((key < g.small_rows).astype(jnp.int32))
        return sk, ss, sw, scol, n_small

    def _count_matrix_v3(
        self, gi: int, sk, ss, b: int, sw=None, scol=None,
        pad_rows: bool = False
    ) -> jnp.ndarray:
        """C from the sorted stream — zero scatters (Pallas MXU kernel).
        Columns are ``feat_local * b + batch`` (``k * b`` wide); with one
        feature per table that is just the batch slot ``ss % b``, otherwise
        the co-sorted ``scol`` payload carries it. ``sw``: co-sorted
        per-slot weights (weighted EBCs — two-limb bf16 matmul in the
        kernel). ``pad_rows`` keeps the kernel's block-padded row layout
        (fused small-path form)."""
        from torchrec_tpu.ops.tbe_pallas import sorted_count_matrix

        g = self._groups[gi]
        k = self._max_feats_per_table
        col = ss % jnp.int32(b) if scol is None else scol
        return sorted_count_matrix(
            sk, col, g.small_rows, k * b, sorted_w=sw,
            interpret=self._CM_FORCE_V3, pad_rows=pad_rows,
        )

    def _small_fused_mode(self, gi: int, b: int) -> str:
        """Which ONE-launch fused small-path kernel applies: ``"fused"``
        (raw fp32 rows), ``"packed"`` (pair-packed bf16 blobs — in-kernel
        pair unpack + parity-split count matmuls), or ``"none"`` (the
        per-table XLA matmul path)."""
        if self._use_small_fused(gi, b):
            return "fused"
        g = self._groups[gi]
        if (
            self._pack_group(g)
            and self._PACKED_SMALL_FUSED
            and self._SMALL_MM_FUSED
            and b > 0
            and self._max_feats_per_table == 1
            and len(self._group_features[gi]) * b * g.dim * 4 <= 4 * 2**20
        ):
            return "packed"
        return "none"

    def _use_small_fused(self, gi: int, b: int) -> bool:
        """Gate for the ONE-launch fused small-path matmul kernels: the
        whole [n_gf, B, dim] pooled block must sit in VMEM. Multi-feature
        tables take the per-table XLA matmul path instead (the fused plan's
        per-block entries carry one feature per table)."""
        if not self._SMALL_MM_FUSED or b == 0:
            return False
        if self._max_feats_per_table != 1:
            return False
        g = self._groups[gi]
        if self._pack_group(g) or g.state_lanes or g.row_tiles > 1:
            # the fused kernels read raw blob rows; restructured layouts
            # (pair-packed / colocated / tile-row) take the per-table
            # matmul path on the sliced/unpacked small region
            return False
        n_gf = len(self._group_features[gi])
        return n_gf * b * g.dim * 4 <= 4 * 2**20

    def _small_fused_plan(self, gi: int):
        """Static per-512-row-block table entries for the fused kernels:
        (feat [NB, S], lo [NB, S], hi [NB, S]) int32 numpy arrays. ``feat``
        is the group-feature position owning the rows (-1 pad); lo/hi are
        the block-local row range. Cached as NUMPY (not jnp: inside a trace
        jnp.asarray yields a tracer, and caching a tracer leaks it); object
        identity stays stable across traces for constant caching."""
        cache = getattr(self, "_small_fused_plan_cache", None)
        if cache is None:
            cache = self._small_fused_plan_cache = {}
        if gi in cache:
            return cache[gi]
        from torchrec_tpu.ops.tbe_pallas import _CM_RB as rb

        g = self._groups[gi]
        gpos = self._group_feature_pos[gi]
        nb = max(-(-g.small_rows // rb), 1)
        entries: List[List] = [[] for _ in range(nb)]
        for name, off, rows in zip(
            g.table_names, g.row_offsets, g.table_rows
        ):
            if off >= g.small_rows:
                continue
            tbl_idx = next(
                ii for ii, t in enumerate(self._tables) if t.name == name
            )
            fis = [
                ii for ii, t in enumerate(self._feature_table) if t == tbl_idx
            ]
            p = int(gpos[fis[0]])  # v3 gate: exactly one feature per table
            for j in range(off // rb, -(-(off + rows) // rb)):
                lo = max(off - j * rb, 0)
                hi = min(off + rows - j * rb, rb)
                entries[j].append((p, lo, hi))
        s_max = max(1, max(len(e) for e in entries))
        feat = np.full((nb, s_max), -1, np.int32)
        lo_a = np.zeros((nb, s_max), np.int32)
        hi_a = np.zeros((nb, s_max), np.int32)
        for j, e in enumerate(entries):
            for s, (p, lo, hi) in enumerate(e):
                feat[j, s], lo_a[j, s], hi_a[j, s] = p, lo, hi
        cache[gi] = (feat, lo_a, hi_a)
        return cache[gi]

    def _small_pool_matmul(
        self, gi: int, C_flat: jnp.ndarray, table_f32: jnp.ndarray, b: int
    ) -> jnp.ndarray:
        """Forward small-table pooling: per-bucket batched matmuls.
        Returns [n_gf*b, dim] contributions (zero rows for large features)."""
        g = self._groups[gi]
        plan = self._small_plan(gi)
        k = plan["k"]
        n_gf = len(self._group_features[gi])
        outs = []  # per bucket: [n_t, k*b, dim]
        for bk in plan["buckets"]:
            Tb = jnp.take(
                table_f32, jnp.asarray(np.maximum(bk["tb_idx"], 0)), axis=0
            ) * jnp.asarray(bk["tb_idx"] >= 0, jnp.float32)[:, None]
            Tb = Tb.reshape(bk["n_t"], bk["rpad"], g.dim)
            Cb = C_flat[
                bk["flat_off"] * b : (bk["flat_off"] + bk["n_t"] * bk["rpad"] * k) * b
            ].reshape(bk["n_t"], bk["rpad"], k * b)
            outs.append(
                jnp.einsum(
                    "trc,trd->tcd", Cb, Tb,
                    preferred_element_type=jnp.float32,
                ).reshape(bk["n_t"] * k * b, g.dim)
            )
        out_flat = jnp.concatenate(outs + [jnp.zeros((1, g.dim), jnp.float32)])
        # static routing: group row p*b+batch -> out_flat row
        gpos = self._group_feature_pos[gi]
        src = np.full(n_gf * b, out_flat.shape[0] - 1, np.int64)
        pos_in_flat = {}
        cursor = 0
        for bk in plan["buckets"]:
            for pos, (ti_g, name, off, rows) in enumerate(bk["tabs"]):
                tbl_idx = next(
                    ii for ii, t in enumerate(self._tables) if t.name == name
                )
                for fi in [
                    ii for ii, t in enumerate(self._feature_table)
                    if t == tbl_idx
                ]:
                    j = int(self._feat_local[fi])
                    p = int(gpos[fi])
                    start = cursor + (pos * k + j) * b
                    src[p * b : (p + 1) * b] = np.arange(start, start + b)
            cursor += bk["n_t"] * k * b
        return jnp.take(out_flat, jnp.asarray(src), axis=0)

    def _small_acc_matmul(
        self, gi: int, C_flat: jnp.ndarray, pooled_grad: jnp.ndarray, b: int
    ):
        """Backward small-table accumulation: acc [small_rows, dim] and
        touched [small_rows] via per-bucket batched matmuls."""
        g = self._groups[gi]
        plan = self._small_plan(gi)
        k = plan["k"]
        gpos = self._group_feature_pos[gi]
        accs = []
        for bk in plan["buckets"]:
            # G [n_t, k*b, dim]: each table's features' pooled grads
            g_src = np.full(bk["n_t"] * k * b, pooled_grad.shape[0], np.int64)
            for pos, (ti_g, name, off, rows) in enumerate(bk["tabs"]):
                tbl_idx = next(
                    ii for ii, t in enumerate(self._tables) if t.name == name
                )
                for fi in [
                    ii for ii, t in enumerate(self._feature_table)
                    if t == tbl_idx
                ]:
                    j = int(self._feat_local[fi])
                    p = int(gpos[fi])
                    st = (pos * k + j) * b
                    g_src[st : st + b] = np.arange(p * b, (p + 1) * b)
            padded = jnp.concatenate(
                [pooled_grad, jnp.zeros((1, g.dim), pooled_grad.dtype)]
            )
            G = jnp.take(padded, jnp.asarray(g_src), axis=0).reshape(
                bk["n_t"], k * b, g.dim
            )
            Cb = C_flat[
                bk["flat_off"] * b : (bk["flat_off"] + bk["n_t"] * bk["rpad"] * k) * b
            ].reshape(bk["n_t"], bk["rpad"], k * b)
            accs.append(
                jnp.einsum(
                    "trc,tcd->trd", Cb, G,
                    preferred_element_type=jnp.float32,
                ).reshape(bk["n_t"] * bk["rpad"], g.dim)
            )
        acc_flat = jnp.concatenate(accs + [jnp.zeros((1, g.dim), jnp.float32)])
        src = jnp.asarray(
            np.minimum(plan["acc_src"], acc_flat.shape[0] - 1)
        )
        acc = jnp.take(acc_flat, src, axis=0)
        # touched: per (table, row) sum of counts over (k features, batch)
        row_sums = []
        for bk in plan["buckets"]:
            cb = C_flat[
                bk["flat_off"] * b : (bk["flat_off"] + bk["n_t"] * bk["rpad"] * k) * b
            ].reshape(bk["n_t"] * bk["rpad"], k * b)
            row_sums.append(jnp.sum(jnp.abs(cb), axis=1))
        rs = jnp.concatenate(row_sums + [jnp.zeros((1,), jnp.float32)])
        touched = jnp.take(rs, jnp.minimum(src, rs.shape[0] - 1)) > 0
        return acc, touched

    def apply(self, params: Params, kjt: KeyedJaggedTensor) -> KeyedTensor:
        kjt, b, f, seg, slot_feature, slot_batch = self._prep(kjt)
        values = kjt.values()
        weights = kjt.weights() if self._is_weighted else None
        lengths = kjt.lengths()  # [F, B]

        # one fused gather+pool per group
        per_feature: List[Optional[jnp.ndarray]] = [None] * f
        for gi, g in enumerate(self._groups):
            ids_g, seg_g, in_group, n_gf = self._group_indices(
                gi, values, seg, slot_feature, slot_batch, b
            )
            if n_gf == 0:
                continue
            use_cm = self._use_count_matmul(gi, b)
            impl = self._cm_impl(gi, weights)
            packed = self._pack_group(g)
            table_f32 = self._table_f32(gi, params)
            C = None
            if use_cm and impl == "v3":
                # shared-sort path: one sort feeds the compact large-table
                # forward AND the count kernel (and the backward, via CSE)
                total = g.total_rows
                small = g.small_rows
                N = ids_g.shape[0]
                u = min(self._max_unique, N)
                sk, ss, sw, scol, n_small = self._sorted_stream_v3(
                    gi, ids_g, seg_g, in_group, weights, b,
                    slot_feature, slot_batch,
                )
                if small == total:
                    # ALL-small group (e.g. the sharded collections' DP
                    # small-table pack): every slot pools through the
                    # count matmul below — the large-window gather would
                    # fetch u garbage rows from a sentinel-only window
                    sf_mode = self._small_fused_mode(gi, b)
                    C = self._count_matrix_v3(
                        gi, sk, ss, b, sw, scol,
                        pad_rows=sf_mode != "none",
                    )
                    pooled = jnp.zeros((n_gf * b, g.dim), jnp.float32)
                    # falls through to the shared count-matmul pooling +
                    # per-feature routing below
                else:
                    sids = jax.lax.dynamic_slice(sk, (n_small,), (u,))
                    sseg = jax.lax.dynamic_slice(ss, (n_small,), (u,))
                    in_range = (sids >= small) & (sids < total)
                    if packed:
                        # pair-packed blob: ONE pair-row gather (the identical
                        # expression in the backward CSEs it), select the
                        # slot's half by id parity, unpack to HALF-LAYOUT f32;
                        # the pooled block is de-permuted to logical lanes
                        # after the (layout-blind) segment-sum
                        from torchrec_tpu.ops.tbe_pallas import (
                            _half_inv_perm,
                            _unpack_pair_half,
                        )

                        pv = params[g.key]
                        d2v = g.dim // 2
                        w_pair = jnp.take(
                            pv, jnp.minimum(sids >> 1, pv.shape[0] - 1),
                            axis=0, indices_are_sorted=True,
                        )
                        half = jnp.where(
                            (sids & 1)[:, None].astype(bool),
                            w_pair[:, d2v:], w_pair[:, :d2v],
                        )
                        rows = _unpack_pair_half(half)
                    elif g.state_lanes:
                        # pair gather at physical base rows (the identical
                        # expression in the backward CSEs with it); pooling
                        # reads the weight half only
                        base = small + 2 * (
                            jnp.clip(sids, small, total - 1) - small
                        )
                        rows = self._colo_pair_gather(
                            params[g.key], base, g.dim
                        )[:, : g.dim]
                    elif g.row_tiles > 1:
                        rows = self._tile_row_gather(
                            params[g.key],
                            jnp.minimum(sids, total - 1),
                            g.row_tiles,
                        )
                    else:
                        rows = jnp.take(
                            table_f32(), jnp.minimum(sids, total - 1), axis=0,
                            indices_are_sorted=True,
                        )
                    if sw is not None:
                        sw_u = jax.lax.dynamic_slice(sw, (n_small,), (u,))
                        rows = rows * sw_u[:, None].astype(rows.dtype)
                    rows = jnp.where(in_range[:, None], rows, 0.0)
                    pooled = jax.ops.segment_sum(
                        rows,
                        jnp.where(in_range, sseg, n_gf * b),
                        num_segments=n_gf * b,
                    )
                    if packed:
                        pooled = jnp.take(
                            pooled,
                            jnp.asarray(_half_inv_perm(g.dim)),
                            axis=1,
                        )
                    sf_mode = self._small_fused_mode(gi, b)
                    C = self._count_matrix_v3(
                        gi, sk, ss, b, sw, scol,
                        pad_rows=sf_mode != "none",
                    )
            elif use_cm and self._max_unique is not None:
                # COMPACT forward for the large-table slots: rank-compact
                # the stream to the slot bound (the identical compaction the
                # backward performs — XLA CSEs it), gather only those rows
                # (8x less gather traffic at the DLRM headline shapes), and
                # pool with one small segment-sum. Small-table slots are
                # handled entirely by the count matmul below.
                total = g.total_rows
                u = min(self._max_unique, ids_g.shape[0])
                valid_l = in_group & (ids_g >= g.small_rows)
                # shared sorted window (lookup.sorted_window: packed-u32
                # sort when (id, seg) fit) — the identical expression in
                # dedup_rows_from_pooled makes XLA CSE the two sorts
                sids, sseg, w_s = sorted_window(
                    ids_g, seg_g, valid_l, total, n_gf * b,
                    unique_bound=self._max_unique, weights=weights,
                )
                rows = jnp.take(
                    table_f32(), jnp.minimum(sids, total - 1), axis=0,
                    indices_are_sorted=True,
                )
                if w_s is not None:
                    rows = rows * w_s[:, None].astype(rows.dtype)
                rows = jnp.where((sids < total)[:, None], rows, 0.0)
                pooled = jax.ops.segment_sum(
                    rows, sseg, num_segments=n_gf * b
                )
            else:
                if use_cm:
                    # small-table slots leave the gather path (their pooling
                    # comes from the count matmul below)
                    seg_g = jnp.where(
                        in_group & (ids_g < g.small_rows), n_gf * b, seg_g
                    )
                # segments are non-decreasing when the stream is
                # feature-major in module order and this group covers every
                # feature (common case) — but NOT after the use_cm remap
                # above, which parks small-table slots at the OOB segment
                # MID-stream (hints must stay honest: XLA's sorted-scatter
                # lowering can corrupt on violated hints)
                sorted_ok = (
                    not use_cm
                    and kjt._sel == tuple(range(len(kjt._keys)))
                    and len(self._group_features[gi]) == f
                )
                pooled = pooled_lookup(
                    table_f32(),
                    ids_g,
                    seg_g,
                    n_gf * b,
                    weights,
                    indices_are_sorted=sorted_ok,
                )  # [n_gf*B, dim]
            if use_cm:
                if C is not None:  # v3: built from the shared sort above
                    if sf_mode == "fused":
                        from torchrec_tpu.ops.tbe_pallas import (
                            small_pool_from_counts,
                        )

                        meta = self._small_fused_plan(gi)
                        pooled = pooled + small_pool_from_counts(
                            C, params[g.key], *meta, n_gf,
                            interpret=self._CM_FORCE_V3,
                        )
                    elif sf_mode == "packed":
                        # ONE-launch packed kernel: in-kernel pair unpack
                        # + parity-split count matmuls off the u32 blob
                        from torchrec_tpu.ops.tbe_pallas import (
                            small_pool_from_counts_packed,
                        )

                        meta = self._small_fused_plan(gi)
                        pooled = pooled + small_pool_from_counts_packed(
                            C, params[g.key], *meta, n_gf,
                            interpret=self._CM_FORCE_V3,
                        )
                    elif packed and self._PACKED_SMALL_MM:
                        # parity-split count matmuls straight off the u32
                        # pair blob — no small-region unpack
                        pooled = pooled + self._small_pool_matmul_v1_packed(
                            gi, C, params[g.key], b
                        )
                    else:
                        pooled = pooled + self._small_pool_matmul_v1(
                            gi, C, self._small_f32(gi, params), b
                        )
                elif impl in ("v1", "v2"):
                    cm = (self._count_matrix_v2 if impl == "v2"
                          else self._count_matrix_v1)
                    C = cm(
                        gi, ids_g, slot_feature, slot_batch, in_group,
                        weights, b,
                    )
                    pooled = pooled + self._small_pool_matmul_v1(
                        gi, C, self._small_f32(gi, params), b
                    )
                else:
                    C = self._count_tensor(
                        gi, ids_g, slot_feature, slot_batch, in_group,
                        weights, b,
                    )
                    pooled = pooled + self._small_pool_matmul(
                        gi, C, self._small_f32(gi, params), b
                    )
            pooled = pooled.reshape(n_gf, b, g.dim)
            for local, fi in enumerate(self._group_features[gi]):
                out = pooled[local]
                if self._poolings[fi] == PoolingType.MEAN and not self._is_weighted:
                    denom = jnp.maximum(lengths[fi].astype(out.dtype), 1.0)
                    out = out / denom[:, None]
                per_feature[fi] = out

        dims = self.embedding_dims()
        if kjt.variable_stride_per_key():
            # VBE: expand each key's deduplicated pooled rows to the global
            # batch via its inverse indices (reference embeddingbag.py VBE
            # path with inverse-indices permute)
            inv = kjt.inverse_indices()  # [F, B_out]
            per_feature = [
                jnp.take(per_feature[fi], inv[fi], axis=0)
                for fi in range(f)
            ]
        vals = jnp.concatenate(
            [per_feature[fi] for fi in range(f)], axis=1
        )
        return KeyedTensor(
            keys=self._feature_names, length_per_key=dims, values=vals
        )

    # -- fused in-backward optimizer path -------------------------------------
    def _group_pooled_grads(self, kjt: KeyedJaggedTensor, kt_grad: jnp.ndarray):
        """Per-group pooled-output cotangents (shared backward prefix):
        yields (group, ids_g, seg_g, pooled_grad [n_gf*B, dim], in_group,
        weights). Gradient rows are NOT expanded here — consumers gather
        from the small pooled buffer in whatever order is cheapest."""
        kjt, b, f, seg, slot_feature, slot_batch = self._prep(kjt)
        values = kjt.values()
        weights = kjt.weights() if self._is_weighted else None
        lengths = kjt.lengths()
        dims = self.embedding_dims()
        dim_offsets = np.concatenate([[0], np.cumsum(dims)])
        for gi, g in enumerate(self._groups):
            feats = self._group_features[gi]
            if not feats:
                continue
            ids_g, seg_g, in_group, n_gf = self._group_indices(
                gi, values, seg, slot_feature, slot_batch, b
            )
            inv = (
                kjt.inverse_indices()
                if kjt.variable_stride_per_key()
                else None
            )
            parts = []
            for fi in feats:
                gslice = kt_grad[:, dim_offsets[fi] : dim_offsets[fi + 1]]
                if inv is not None:
                    # VBE transpose: sum global-batch cotangents back onto
                    # each key's deduplicated examples
                    gslice = jax.ops.segment_sum(
                        gslice, inv[fi], num_segments=b
                    )
                if self._poolings[fi] == PoolingType.MEAN and not self._is_weighted:
                    denom = jnp.maximum(lengths[fi].astype(gslice.dtype), 1.0)
                    gslice = gslice / denom[:, None]
                parts.append(gslice)
            pooled_grad = jnp.concatenate(parts, axis=0)  # [n_gf*B, dim]
            ctx = (gi, slot_feature, slot_batch, b)
            yield g, ids_g, seg_g, pooled_grad, in_group, weights, ctx

    def _group_slot_grads(self, kjt: KeyedJaggedTensor, kt_grad: jnp.ndarray):
        """Per-group per-value-slot gradient rows (slot-order expansion):
        yields (group, ids_g, g_slots, in_group)."""
        for g, ids_g, seg_g, pooled_grad, in_group, weights, _ctx in (
            self._group_pooled_grads(kjt, kt_grad)
        ):
            n_gf_b = pooled_grad.shape[0]
            g_slots = grad_rows(pooled_grad, seg_g, n_gf_b, weights)
            yield g, ids_g, g_slots, in_group

    def sparse_grads(
        self, kjt: KeyedJaggedTensor, kt_grad: jnp.ndarray
    ) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
        """Transpose of :meth:`apply`: cotangent of the KeyedTensor values
        ``[B, sum(dims)]`` -> per-group deduped sparse row gradients
        ``{group_key: (unique_ids, unique_grads)}``.

        This is the reference's TBE backward (a2a'd gradient -> exact
        per-row gradient) without ever materializing a dense table grad.
        """
        return {
            g.key: dedup_rows(ids_g, g_slots, in_group, g.total_rows)
            for g, ids_g, g_slots, in_group in self._group_slot_grads(
                kjt, kt_grad
            )
        }

    def dense_grads(
        self, kjt: KeyedJaggedTensor, kt_grad: jnp.ndarray
    ) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
        """Whole-group-blob gradient accumulators (sort-free path):
        {group_key: (grad [rows, dim], touched [rows])}."""
        return {
            g.key: accumulate_dense(ids_g, g_slots, in_group, g.total_rows)
            for g, ids_g, g_slots, in_group in self._group_slot_grads(
                kjt, kt_grad
            )
        }

    def _packed_small_dense_update_half(
        self,
        g: TableGroup,
        tbl: jnp.ndarray,
        st: Dict[str, jnp.ndarray],
        optimizer: EmbeddingOptimizer,
        acc_h: jnp.ndarray,  # [small, dim] HALF-LAYOUT accumulator
        touched: jnp.ndarray,
        lr,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """bf16 small-region dense update entirely in PAIR-HALF space —
        the ~150 us/step unpack/repack trim (SURVEY round-5 queue): the
        accumulator arrives half-layout (the caller permutes the TINY
        pooled-grad before the acc matmul, so the MXU emits acc in half
        lanes for free), the region unpacks with contiguous-half
        shift+bitcast only (no lane takes, no [P,2D]->[2P,D] interleave
        reshape), rows are processed evens-then-odds (dense_update is
        row-independent), and the repack is two contiguous-half ORs.
        Only valid for rowwise-state optimizers (1-D row state reorders
        cheaply); callers gate on supports_segscan_update."""
        from torchrec_tpu.ops.tbe_pallas import (
            _unpack_pair_half,
            pack_pair_half_exact,
        )

        small, dim = g.small_rows, g.dim
        ps = (small + 1) // 2
        d2 = dim // 2
        pad = 2 * ps - small
        blob_s = tbl[:ps]
        region = jnp.concatenate(
            [
                _unpack_pair_half(blob_s[:, :d2]),
                _unpack_pair_half(blob_s[:, d2:]),
            ],
            axis=0,
        ).astype(g.data_type.as_jnp())  # [2ps, dim]: even rows | odd rows
        acc_eo = acc_h  # [2ps, dim] half lanes, evens|odds (see caller)
        if pad:
            touched = jnp.concatenate(
                [touched, jnp.zeros((pad,), touched.dtype)]
            )
        tchv = touched.reshape(ps, 2)
        tch_eo = jnp.concatenate([tchv[:, 0], tchv[:, 1]])
        st_eo = {}
        row_keys = []
        for k, v in st.items():
            if v.ndim == 1 and v.shape[0] == g.total_rows:
                vv = v[: 2 * ps].reshape(ps, 2)
                st_eo[k] = jnp.concatenate([vv[:, 0], vv[:, 1]])
                row_keys.append(k)
            else:
                st_eo[k] = v
        new_region, st_eo = optimizer.dense_update(
            region, st_eo, acc_eo, tch_eo, lr=lr
        )
        blob_new = jnp.concatenate(
            [
                pack_pair_half_exact(new_region[:ps]),
                pack_pair_half_exact(new_region[ps:]),
            ],
            axis=1,
        )
        tbl = jax.lax.dynamic_update_slice(tbl, blob_new, (0, 0))
        new_st = dict(st)
        for k, v in st_eo.items():
            if k in row_keys:
                inter = jnp.stack([v[:ps], v[ps:]], axis=1).reshape(-1)
                new_st[k] = jax.lax.dynamic_update_slice(
                    st[k], inter[: 2 * ps - pad], (0,)
                )
            else:
                new_st[k] = v
        return tbl, new_st

    def group_dense_update(
        self,
        g: TableGroup,
        blob: jnp.ndarray,
        state: Dict[str, jnp.ndarray],
        optimizer: EmbeddingOptimizer,
        acc: jnp.ndarray,
        touched: jnp.ndarray,
        lr=None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """``optimizer.dense_update`` over a group's whole LOGICAL region,
        storage-aware (pair-packed / tile-row blobs unpack the region,
        update, and write back; the scratch tail never moves). Consumers:
        the sharded collections' DATA_PARALLEL update after the psum."""
        total = g.total_rows
        if self._pack_group(g):
            from torchrec_tpu.ops.tbe_pallas import (
                pack_pair_blob,
                unpack_pair_blob,
            )

            ps = (total + 1) // 2
            region = unpack_pair_blob(blob[:ps]).astype(
                g.data_type.as_jnp()
            )
            tbl_s, state = optimizer.dense_update(
                region[:total], state, acc, touched, lr=lr
            )
            merged = jnp.concatenate([tbl_s, region[total:]], axis=0)
            return (
                jax.lax.dynamic_update_slice(
                    blob, pack_pair_blob(merged), (0, 0)
                ),
                state,
            )
        if g.row_tiles > 1:
            nt = g.row_tiles
            region = blob[: total * nt].reshape(total, g.dim)
            tbl_s, state = optimizer.dense_update(
                region, state, acc, touched, lr=lr
            )
            return (
                jax.lax.dynamic_update_slice(
                    blob, tbl_s.reshape(total * nt, 128), (0, 0)
                ),
                state,
            )
        tbl_s, state = optimizer.dense_update(
            blob[:total], state, acc, touched, lr=lr
        )
        return jax.lax.dynamic_update_slice(blob, tbl_s, (0, 0)), state

    def dense_accumulators(
        self, kjt: KeyedJaggedTensor, kt_grad: jnp.ndarray
    ) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
        """:meth:`dense_grads` with the count-matmul fast path: for
        all-small groups under the count gate, the accumulator comes from
        ONE MXU matmul against the (forward-CSE'd) count matrix instead
        of a slot-order [N, D] gradient expansion + scatter. Consumers:
        the sharded collections' DATA_PARALLEL backward (accumulate ->
        psum -> replicated dense_update, reference dp_sharding.py), where
        small tables are best placed.
        """
        out: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        for g, ids_g, seg_g, pooled_grad, in_group, weights, ctx in (
            self._group_pooled_grads(kjt, kt_grad)
        ):
            gi, slot_feature, slot_batch, b = ctx
            small, total = g.small_rows, g.total_rows
            use_cm = (
                small == total
                and ids_g.shape[0] > 0
                and self._use_count_matmul(gi, b)
            )
            if not use_cm:
                g_slots = grad_rows(
                    pooled_grad, seg_g, pooled_grad.shape[0], weights
                )
                out[g.key] = accumulate_dense(
                    ids_g, g_slots, in_group, total
                )
                continue
            impl = self._cm_impl(gi, weights)
            if impl == "v3":
                sk, ss, sw, scol, _n_small = self._sorted_stream_v3(
                    gi, ids_g, seg_g, in_group, weights, b,
                    slot_feature, slot_batch,
                )
                fused = self._use_small_fused(gi, b)
                C = self._count_matrix_v3(
                    gi, sk, ss, b, sw, scol, pad_rows=fused
                )
                if fused:
                    from torchrec_tpu.ops.tbe_pallas import (
                        small_acc_from_counts,
                    )

                    meta = self._small_fused_plan(gi)
                    acc = small_acc_from_counts(
                        C, pooled_grad, *meta,
                        interpret=self._CM_FORCE_V3,
                    )[:small]
                    touched = jnp.sum(jnp.abs(C[:small]), axis=1) > 0
                else:
                    acc, touched = self._small_acc_matmul_v1(
                        gi, C, pooled_grad, b
                    )
            elif impl in ("v1", "v2"):
                cm = (
                    self._count_matrix_v2 if impl == "v2"
                    else self._count_matrix_v1
                )
                C = cm(
                    gi, ids_g, slot_feature, slot_batch, in_group,
                    weights, b,
                )
                acc, touched = self._small_acc_matmul_v1(
                    gi, C, pooled_grad, b
                )
            else:
                C = self._count_tensor(
                    gi, ids_g, slot_feature, slot_batch, in_group,
                    weights, b,
                )
                acc, touched = self._small_acc_matmul(
                    gi, C, pooled_grad, b
                )
            out[g.key] = (acc, touched)
        return out

    def apply_gradients(
        self,
        params: Params,
        opt_states: Dict[str, Dict[str, jnp.ndarray]],
        optimizer: EmbeddingOptimizer,
        kjt: KeyedJaggedTensor,
        kt_grad: jnp.ndarray,
        lr: Optional[jnp.ndarray] = None,
    ) -> Tuple[Params, Dict[str, Dict[str, jnp.ndarray]]]:
        """Fused backward + optimizer step on the touched rows only.

        Under ``jit`` with ``params``/``opt_states`` donated this updates the
        tables in-place in HBM — the reference's
        apply_optimizer_in_backward + TBE fused update
        (examples/golden_training/train_dlrm.py:114-118).

        Small-table groups take the sort-free dense-accumulator path; large
        groups take sort/dedup + sorted-unique scatter. Same math either way.
        """
        new_params = dict(params)
        new_states = dict(opt_states)
        for g, ids_g, seg_g, pooled_grad, in_group, weights, ctx in (
            self._group_pooled_grads(kjt, kt_grad)
        ):
            gi, slot_feature, slot_batch, b = ctx
            small, total = g.small_rows, g.total_rows
            tbl, st = params[g.key], opt_states[g.key]
            use_cm = self._use_count_matmul(gi, b)
            impl = self._cm_impl(gi, weights)
            v3 = use_cm and impl == "v3"
            if v3:
                # identical expression to the forward's -> XLA CSEs the
                # sort (and the count kernel) across the whole train step
                sk, ss, sw, scol, n_small = self._sorted_stream_v3(
                    gi, ids_g, seg_g, in_group, weights, b,
                    slot_feature, slot_batch,
                )
            # v3's position-layout ids need the branch-free scratch-tail
            # write kernel; the fused segscan path needs it too
            packed = self._pack_group(g)
            colo = g.state_lanes > 0
            in_bounds = g.scratch_rows > 0 and tbl.shape[0] == (
                g.padded_rows // 2
                if packed
                else (
                    2 * g.padded_rows - g.small_rows
                    if colo
                    else g.padded_rows * g.row_tiles
                )
            )
            use_scan = (
                v3
                and in_bounds
                and self._FUSED_BWD_SEGSCAN
                and ids_g.shape[0] > 0
                and min(self._max_unique, ids_g.shape[0]) > 0
                and (
                    getattr(optimizer, "supports_colocated_state", False)
                    and not optimizer.stochastic_rounding
                    if colo
                    else optimizer.supports_segscan_update(tbl)
                )
            )
            if colo and small < total and not use_scan and (
                ids_g.shape[0] > 0
            ):
                raise ValueError(
                    "colocate_rowwise_state requires the fused segscan "
                    "path for large-region updates: v3 count-matmul "
                    "gates on, _FUSED_BWD_SEGSCAN=True, and an optimizer "
                    "with supports_colocated_state (RowWiseAdagrad, "
                    "fp32, no stochastic rounding)"
                )
            if small < total and ids_g.shape[0] > 0 and use_scan:
                # fused backward tail: the run segment-sum, optimizer math,
                # and scattered write happen INSIDE one Pallas pass
                # (row_scatter_write_segscan) — saves the ~156 us XLA
                # position-layout segment-sum at the headline shapes. Run
                # sums land at run-END positions (forward chunk order), so
                # targets carry the run's id at its LAST slot and distinct
                # scratch-tail sentinels elsewhere.
                u = min(self._max_unique, ids_g.shape[0])
                sids_u = jax.lax.dynamic_slice(sk, (n_small,), (u,))
                sseg_u = jax.lax.dynamic_slice(ss, (n_small,), (u,))
                s = pooled_grad.shape[0]
                in_range = (sids_u >= small) & (sids_u < total)
                seg_m = jnp.where(
                    in_range, jnp.minimum(sseg_u, s), s
                )
                pairs = packed
                padded = jnp.concatenate(
                    [
                        pooled_grad,
                        jnp.zeros((1, pooled_grad.shape[1]),
                                  pooled_grad.dtype),
                    ]
                )
                if pairs:
                    # bf16 pair mode (tbe_pallas pair kernels): runs are
                    # keyed by PAIR id; grads go in HALF-LAYOUT (col j <
                    # dim/2 = lane 2j) — the column permute happens on the
                    # TINY pooled-grad array, before the expand gather
                    padded = jnp.concatenate(
                        [padded[:, 0::2], padded[:, 1::2]], axis=1
                    )
                    pp_total = (total + 1) // 2
                    key_m = jnp.where(in_range, sids_u >> 1, pp_total)
                    invalid_key = pp_total
                else:
                    key_m = jnp.where(in_range, sids_u, total)
                    invalid_key = total
                g_sorted = jnp.take(padded, seg_m, axis=0)
                if sw is not None:
                    sw_u = jax.lax.dynamic_slice(sw, (n_small,), (u,))
                    g_sorted = g_sorted * sw_u[:, None].astype(g_sorted.dtype)
                diff = key_m[1:] != key_m[:-1]
                heads = jnp.concatenate(
                    [jnp.ones((1,), jnp.float32), diff.astype(jnp.float32)]
                )[:, None]
                is_end = jnp.concatenate([diff, jnp.ones((1,), jnp.bool_)])
                pos = jnp.arange(u, dtype=jnp.int32)
                real_end = is_end & in_range
                rows_end = jnp.where(real_end, key_m, invalid_key + pos)
                ends = real_end.astype(jnp.float32)[:, None]
                if pairs:
                    parity = (sids_u & 1).astype(jnp.float32)[:, None]
                    # IDENTICAL expression to the forward's pair-row
                    # gather -> XLA CSEs it across the step
                    old_rows = jnp.take(
                        tbl, jnp.minimum(sids_u >> 1, tbl.shape[0] - 1),
                        axis=0, indices_are_sorted=True,
                    )
                elif colo:
                    parity = None
                    # IDENTICAL expression to the forward's pair gather
                    # -> XLA CSEs it across the step; the kernel takes
                    # PHYSICAL pair-base targets
                    base = small + 2 * (
                        jnp.clip(sids_u, small, total - 1) - small
                    )
                    old_rows = self._colo_pair_gather(tbl, base, g.dim)
                    rows_end = small + 2 * (rows_end - small)
                elif g.row_tiles > 1:
                    parity = None
                    # IDENTICAL expression to the forward's tile-row
                    # gather -> XLA CSEs it; the kernel scales targets
                    # by the (inferred) tile count itself
                    old_rows = self._tile_row_gather(
                        tbl, jnp.minimum(sids_u, total - 1), g.row_tiles
                    )
                else:
                    parity = None
                    # IDENTICAL expression to the forward's compact window
                    # gather -> XLA CSEs it across the step
                    old_rows = jnp.take(
                        tbl, jnp.minimum(sids_u, total - 1), axis=0,
                        indices_are_sorted=True,
                    )
                if colo:
                    # old_rows is the FULL-width gather (weights + state
                    # lanes); the accumulator update rides the row DMA
                    tbl, st = optimizer.segscan_update_colocated(
                        tbl, st, rows_end, heads, ends, g_sorted,
                        old_rows, lr=lr, interpret=self._CM_FORCE_V3,
                    )
                else:
                    tbl, st = optimizer.segscan_update(
                        tbl, st, rows_end, heads, ends, g_sorted,
                        old_rows, lr=lr, interpret=self._CM_FORCE_V3,
                        parity=parity, sorted_ids=sids_u,
                    )
            elif small < total and ids_g.shape[0] > 0:
                # large rows: sort/dedup + sparse scatter (zero-capacity
                # batches have no slots -> nothing to update)
                old_rows = None
                if v3:
                    u = min(self._max_unique, ids_g.shape[0])
                    sids_u = jax.lax.dynamic_slice(sk, (n_small,), (u,))
                    uids, ugrads = dedup_rows_from_sorted(
                        sids_u,
                        jax.lax.dynamic_slice(ss, (n_small,), (u,)),
                        pooled_grad, total, lo_row=small,
                        w_sorted=(
                            None if sw is None
                            else jax.lax.dynamic_slice(sw, (n_small,), (u,))
                        ),
                    )
                    if self._REUSE_FWD_ROWS and not packed and (
                        g.row_tiles == 1
                    ):
                        # the IDENTICAL expression to the forward's compact
                        # window gather -> XLA CSEs it across the step, so
                        # the optimizer's own table[uids] gather disappears
                        # (~0.09 ms at the headline shapes). Position layout
                        # makes this valid: at run starts uids == sids_u, and
                        # every other position is an OOB sentinel whose write
                        # is dropped / parked in the scratch tail.
                        table_f32 = (
                            tbl.astype(jnp.float32)
                            if g.data_type != DataType.FP32
                            else tbl
                        )
                        old_rows = jnp.take(
                            table_f32, jnp.minimum(sids_u, total - 1),
                            axis=0, indices_are_sorted=True,
                        )
                else:
                    valid_l = in_group & (ids_g >= small)
                    uids, ugrads = dedup_rows_from_pooled(
                        ids_g, seg_g, pooled_grad, valid_l, total,
                        unique_bound=self._max_unique, weights=weights,
                    )
                # v3's position-layout ids interleave OOB sentinels with
                # real rows — not ascending. When the blob carries a scratch
                # tail, every sentinel (always < total + u <= padded_rows -
                # chunk pad) is a real address — the write kernel runs
                # branch-free with one aggregated wait per chunk
                if packed:
                    # slow-but-correct fallback for optimizers without a
                    # pair segscan: unpack the whole blob, update the
                    # logical bf16 table, repack (two full passes)
                    from torchrec_tpu.ops.tbe_pallas import (
                        pack_pair_blob,
                        unpack_pair_blob,
                    )

                    logical = unpack_pair_blob(tbl).astype(
                        g.data_type.as_jnp()
                    )
                    logical, st = optimizer.update(
                        logical, st, uids, ugrads, lr=lr,
                        ids_sorted=not v3, ids_in_bounds=False,
                        old_rows=old_rows,
                    )
                    tbl = pack_pair_blob(logical)
                elif g.row_tiles > 1:
                    # tile-row fallback: reshape to logical, update via
                    # the XLA scatter, reshape back (relayout copies —
                    # correct-but-slow; the segscan path above is the
                    # fast form)
                    logical = tbl.reshape(-1, g.dim)
                    logical, st = optimizer.update(
                        logical, st, uids, ugrads, lr=lr,
                        ids_sorted=not v3, ids_in_bounds=False,
                        old_rows=old_rows,
                    )
                    tbl = logical.reshape(-1, 128)
                else:
                    tbl, st = optimizer.update(
                        tbl, st, uids, ugrads, lr=lr, ids_sorted=not v3,
                        ids_in_bounds=in_bounds, old_rows=old_rows,
                    )
            if small > 0 and use_cm:
                # count-matmul fast path (C is CSE-shared with the forward)
                half_path = False
                if v3:
                    sf_mode = self._small_fused_mode(gi, b)
                    C = self._count_matrix_v3(
                        gi, sk, ss, b, sw, scol,
                        pad_rows=sf_mode != "none",
                    )
                    # bf16 pair-half dense path: the packed acc kernel
                    # emits per-pair even/odd accumulators in half lanes
                    # and the whole small update runs in pair-half space
                    # — no unpack/repack of the region
                    half_path = (
                        sf_mode == "packed"
                        and optimizer.supports_segscan_update(tbl)
                    ) or (
                        packed
                        and self._PACKED_SMALL_HALF_BWD
                        and optimizer.supports_segscan_update(tbl)
                    )
                    if sf_mode == "packed" and getattr(
                        optimizer, "supports_dense_pair_update", False
                    ):
                        # fully fused pair-space small path: packed acc
                        # kernel -> ONE-pass dense pair-update kernel
                        from torchrec_tpu.ops.tbe_pallas import (
                            small_acc_from_counts_packed,
                        )

                        meta = self._small_fused_plan(gi)
                        ps_g = (small + 1) // 2
                        acc_e, acc_o = small_acc_from_counts_packed(
                            C, pooled_grad, *meta,
                            interpret=self._CM_FORCE_V3,
                        )
                        new_small, st = optimizer.dense_pair_update(
                            tbl[: acc_e.shape[0]], acc_e, acc_o, st,
                            lr=lr, interpret=self._CM_FORCE_V3,
                        )
                        tbl = jax.lax.dynamic_update_slice(
                            tbl, new_small[:ps_g], (0, 0)
                        )
                        new_params[g.key], new_states[g.key] = tbl, st
                        continue
                    if sf_mode == "packed" and half_path:
                        from torchrec_tpu.ops.tbe_pallas import (
                            small_acc_from_counts_packed,
                        )

                        meta = self._small_fused_plan(gi)
                        ps_g = (small + 1) // 2
                        acc_e, acc_o = small_acc_from_counts_packed(
                            C, pooled_grad, *meta,
                            interpret=self._CM_FORCE_V3,
                        )
                        acc = jnp.concatenate(
                            [acc_e[:ps_g], acc_o[:ps_g]], axis=0
                        )
                        touched = jnp.sum(jnp.abs(C[:small]), axis=1) > 0
                    elif half_path:
                        acc, touched = self._small_acc_matmul_v1_packed(
                            gi, C, pooled_grad, b
                        )
                    elif sf_mode == "fused":
                        from torchrec_tpu.ops.tbe_pallas import (
                            small_acc_from_counts,
                        )

                        meta = self._small_fused_plan(gi)
                        acc = small_acc_from_counts(
                            C, pooled_grad, *meta,
                            interpret=self._CM_FORCE_V3,
                        )[:small]
                        # abs: weighted counts can cancel across columns
                        # for a touched row (negative weights)
                        touched = jnp.sum(jnp.abs(C[:small]), axis=1) > 0
                    else:
                        acc, touched = self._small_acc_matmul_v1(
                            gi, C, pooled_grad, b
                        )
                elif impl in ("v1", "v2"):
                    cm = (self._count_matrix_v2 if impl == "v2"
                          else self._count_matrix_v1)
                    C = cm(
                        gi, ids_g, slot_feature, slot_batch, in_group,
                        weights, b,
                    )
                    acc, touched = self._small_acc_matmul_v1(
                        gi, C, pooled_grad, b
                    )
                else:
                    C = self._count_tensor(
                        gi, ids_g, slot_feature, slot_batch, in_group,
                        weights, b,
                    )
                    acc, touched = self._small_acc_matmul(
                        gi, C, pooled_grad, b
                    )
                if half_path:
                    # acc above is HALF-LAYOUT; the whole small update
                    # runs in pair-half space (state handled inside)
                    tbl, st = self._packed_small_dense_update_half(
                        g, tbl, st, optimizer, acc, touched, lr
                    )
                    new_params[g.key], new_states[g.key] = tbl, st
                    continue
                # row-shaped state slices to the small region; scalar
                # state (e.g. the stochastic-rounding counter) passes whole
                st_s = {
                    k: v[:small] if v.ndim and v.shape[0] == total else v
                    for k, v in st.items()
                }
                if packed:
                    # unpack the small REGION (O(small)), update the
                    # logical bf16 rows, repack; an odd small boundary
                    # carries the straddling pair's large-row bits through
                    from torchrec_tpu.ops.tbe_pallas import (
                        pack_pair_blob,
                        unpack_pair_blob,
                    )

                    ps = (small + 1) // 2
                    region = unpack_pair_blob(tbl[:ps]).astype(
                        g.data_type.as_jnp()
                    )
                    tbl_s, st_s = optimizer.dense_update(
                        region[:small], st_s, acc, touched, lr=lr
                    )
                    merged = jnp.concatenate(
                        [tbl_s, region[small:]], axis=0
                    )
                    tbl = jax.lax.dynamic_update_slice(
                        tbl, pack_pair_blob(merged), (0, 0)
                    )
                elif g.row_tiles > 1:
                    nt = g.row_tiles
                    region = tbl[: small * nt].reshape(small, g.dim)
                    tbl_s, st_s = optimizer.dense_update(
                        region, st_s, acc, touched, lr=lr
                    )
                    tbl = jax.lax.dynamic_update_slice(
                        tbl, tbl_s.reshape(small * nt, 128), (0, 0)
                    )
                else:
                    # NOTE colocated layouts keep the small region FLAT,
                    # so the plain path below covers them too
                    tbl_s, st_s = optimizer.dense_update(
                        tbl[:small], st_s, acc, touched, lr=lr
                    )
                    tbl = jax.lax.dynamic_update_slice(tbl, tbl_s, (0, 0))
                st = {
                    k: jax.lax.dynamic_update_slice(
                        st[k], st_s[k], (0,) * st[k].ndim
                    )
                    for k in st
                }
            elif small > 0:  # large batch: sort-free dense accumulator
                valid_s = in_group & (ids_g < small)
                g_slots = grad_rows(
                    pooled_grad, seg_g, pooled_grad.shape[0], weights
                )
                acc, touched = accumulate_dense(ids_g, g_slots, valid_s, small)
                # row-shaped state slices to the small region; scalar
                # state (e.g. the stochastic-rounding counter) passes whole
                st_s = {
                    k: v[:small] if v.ndim and v.shape[0] == total else v
                    for k, v in st.items()
                }
                if packed:
                    # unpack the small REGION (O(small)), update the
                    # logical bf16 rows, repack; an odd small boundary
                    # carries the straddling pair's large-row bits through
                    from torchrec_tpu.ops.tbe_pallas import (
                        pack_pair_blob,
                        unpack_pair_blob,
                    )

                    ps = (small + 1) // 2
                    region = unpack_pair_blob(tbl[:ps]).astype(
                        g.data_type.as_jnp()
                    )
                    tbl_s, st_s = optimizer.dense_update(
                        region[:small], st_s, acc, touched, lr=lr
                    )
                    merged = jnp.concatenate(
                        [tbl_s, region[small:]], axis=0
                    )
                    tbl = jax.lax.dynamic_update_slice(
                        tbl, pack_pair_blob(merged), (0, 0)
                    )
                elif g.row_tiles > 1:
                    nt = g.row_tiles
                    region = tbl[: small * nt].reshape(small, g.dim)
                    tbl_s, st_s = optimizer.dense_update(
                        region, st_s, acc, touched, lr=lr
                    )
                    tbl = jax.lax.dynamic_update_slice(
                        tbl, tbl_s.reshape(small * nt, 128), (0, 0)
                    )
                else:
                    # NOTE colocated layouts keep the small region FLAT,
                    # so the plain path below covers them too
                    tbl_s, st_s = optimizer.dense_update(
                        tbl[:small], st_s, acc, touched, lr=lr
                    )
                    tbl = jax.lax.dynamic_update_slice(tbl, tbl_s, (0, 0))
                st = {
                    k: jax.lax.dynamic_update_slice(
                        st[k], st_s[k], (0,) * st[k].ndim
                    )
                    for k in st
                }
            new_params[g.key], new_states[g.key] = tbl, st
        return new_params, new_states

    def gradient_overflow(self, kjt: KeyedJaggedTensor) -> jnp.ndarray:
        """Large-table slots whose gradients the windowed backward DROPS
        this step (int32 scalar, jit-safe, ~free: one masked count per
        group — no sort).

        ``max_unique_gradient_rows`` bounds the sorted large-table window;
        when a batch exceeds it the excess slots silently lose their
        updates (class docstring contract). Surface this through the train
        step aux ("emb_grad_overflow") / metrics stack so production runs
        see the violation instead of training wrong silently (the
        reference's analog is FBGEMM TBE's uvm-cache/bounds-check
        counters, fbgemm_gpu bounds_check_indices).
        """
        if self._max_unique is None:
            return jnp.zeros((), jnp.int32)
        kjt, b, f, seg, slot_feature, slot_batch = self._prep(kjt)
        values = kjt.values()
        total = jnp.zeros((), jnp.int32)
        for gi, g in enumerate(self._groups):
            if g.small_rows >= g.total_rows:
                continue  # no windowed (large) region in this group
            ids_g, seg_g, in_group, n_gf = self._group_indices(
                gi, values, seg, slot_feature, slot_batch, b
            )
            if n_gf == 0 or ids_g.shape[0] == 0:
                continue
            u = min(self._max_unique, ids_g.shape[0])
            n_large = jnp.sum(
                (in_group & (ids_g >= g.small_rows)).astype(jnp.int32)
            )
            total = total + jnp.maximum(n_large - jnp.int32(u), 0)
        return total


class EmbeddingCollection(_EmbeddingCollectionBase):
    """Unpooled lookups: ``apply(params, KJT) -> Dict[str, JaggedTensor]``
    of per-id embedding rows.

    Reference: torchrec/modules/embedding_modules.py:367.
    """

    def __init__(
        self,
        tables: Sequence[EmbeddingConfig],
        max_unique_gradient_rows: Optional[int] = None,
    ):
        """``max_unique_gradient_rows``: bound on large-table slots per
        step — enables the fused Pallas backward tier in the SHARDED
        collection (ShardedEmbeddingCollection: segscan backward,
        tile-row / pair-packed storage). The single-chip EC itself keeps
        LOGICAL blob storage regardless: its ``apply`` is differentiable
        (consumers take gradients through the returned rows), and packed
        u32 / tile-row leaves would break that contract — sequence
        training at scale goes through the sharded module, reference
        torchrec/distributed/embedding_lookup.py:209."""
        super().__init__(tables, scratch_window=max_unique_gradient_rows)
        self._max_unique = max_unique_gradient_rows

    def embedding_configs(self) -> List[EmbeddingConfig]:
        return list(self._tables)  # type: ignore[return-value]

    def embedding_dim(self) -> int:
        dims = {t.embedding_dim for t in self._tables}
        if len(dims) != 1:
            raise ValueError("mixed dims; use embedding_dims()")
        return next(iter(dims))

    def apply(
        self, params: Params, kjt: KeyedJaggedTensor
    ) -> Dict[str, JaggedTensor]:
        kjt, b, f, _, _, _ = self._prep(kjt)
        kjt_mat = kjt.materialize()  # per-key contiguity for the output JTs
        offsets_pk = kjt_mat.offset_per_key()
        lengths = kjt_mat.lengths()

        # [cap, dim] embedding rows aligned with the (materialized) stream
        out: Dict[str, JaggedTensor] = {}
        for gi, g in enumerate(self._groups):
            ids_g, seg_g, in_group, n_gf = self._group_indices(
                gi,
                kjt_mat.values(),
                kjt_mat.segment_ids(),
                jnp.minimum(kjt_mat.segment_ids() // b, f),
                kjt_mat.segment_ids() % jnp.int32(b),
                b,
            )
            if n_gf == 0:
                continue
            emb = sequence_lookup(
                params[g.key].astype(jnp.float32)
                if g.data_type != DataType.FP32
                else params[g.key],
                ids_g,
                valid=in_group & kjt_mat.valid_mask(),
            )  # [cap, dim]
            for fi in self._group_features[gi]:
                start = offsets_pk[fi]
                rolled = _roll_rows(emb, start)
                w = kjt_mat.weights_or_none()
                out[self._feature_names[fi]] = JaggedTensor(
                    values=rolled,
                    lengths=lengths[fi],
                    weights=_roll_rows(w, start) if w is not None else None,
                )
        return out



