"""Shared SPMD layout compiler for sharded embedding collections.

Both ShardedEmbeddingBagCollection (pooled) and ShardedEmbeddingCollection
(sequence) compile a sharding plan to the same uniform structure: each
(table, column-block) becomes a **virtual table** whose rows are
range-assigned to devices; virtual tables of one column width pack into one
per-device ``[local_rows, width]`` blob (the per-rank table pack FBGEMM TBE
uses, reference batched_embedding_kernel.py:3725). Placement lives in data
arrays ``id_lo/id_hi/blob_off[device, feature, block]`` indexed with
``lax.axis_index`` at runtime, so the compiled program is identical on every
device (SPMD) — only the data differs.

Reference parity: torchrec/distributed/embedding_sharding.py:556
(group_tables) + per-type sharding/*.py input/output dist composition.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.distributed.types import (
    EmbeddingModuleShardingPlan,
    ShardingEnv,
    device_put_global,
)
from torchrec_tpu.ops.fused_optim import EmbeddingOptimizer
from torchrec_tpu.types import DataType, ShardingType

Params = Dict[str, jnp.ndarray]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class WidthClass:
    """Static layout of one width class of virtual tables."""

    key: str
    width: int
    data_type: DataType
    max_blocks: int
    num_vf: int
    local_rows: int  # padded uniform per-device LOGICAL blob rows
    # static per-vf metadata
    vf_feature: Tuple[int, ...]  # logical feature index per vf
    vf_col_start: Tuple[int, ...]  # column start within the feature's dim
    # static [F+1, max_blocks]: vf position of (feature, block) or -1
    vf_pos: np.ndarray
    # data [W, F+1, max_blocks]
    id_lo: np.ndarray
    id_hi: np.ndarray
    blob_off: np.ndarray
    # per-device packing for (un)shard: list over devices of
    # (table_name, block_col_start, row_lo, row_hi, blob_row)
    packing: Tuple[Tuple[Tuple[str, int, int, int, int], ...], ...]
    # ---- fused-kernel storage tier (mirrors TableGroup in
    # modules/embedding_modules.py — the reference runs ONE TBE kernel
    # stack for every sharding type, batched_embedding_kernel.py:3725;
    # these fields port the same storage forms into the sharded blobs):
    # dead rows past local_rows so the branch-free Pallas write/segscan
    # kernels can park dedup sentinels at real addresses (0 = fast tier
    # off; storage is then exactly the plain [W, local_rows, width] blob)
    scratch_rows: int = 0
    # TILE-ROW storage for wide fp32 classes (width > 128, width % 128
    # == 0): physical blob [W, phys_rows * row_tiles, 128], logical row
    # r at physical rows r*nt .. r*nt+nt-1
    row_tiles: int = 1
    # pair-packed u32 storage for bf16 width-128 classes: physical blob
    # [W, phys_rows // 2, width] u32 (tbe_pallas pair layout)
    packed: bool = False
    # small-table region: shards of tables with <= DENSE_GRAD_ROWS_
    # THRESHOLD rows pack FIRST in each device blob so the backward can
    # split dense-path (prefix) vs sort/segscan (rest). Boundary is
    # per-device DATA ([W], 8-aligned); small_rows_max is the static
    # dense-accumulator size.
    small_rows_dev: Tuple[int, ...] = ()
    small_rows_max: int = 0

    @property
    def phys_rows(self) -> int:
        """Physical LOGICAL-UNIT rows per device (logical + scratch);
        the stored minor shape additionally depends on row_tiles/packed."""
        return self.local_rows + self.scratch_rows


def class_logical_blob(c: WidthClass, blob: np.ndarray) -> np.ndarray:
    """Host-side: storage-form blob -> logical [..., local_rows, width]
    fp32 (leading device axes preserved). Inverse of
    :func:`class_from_logical`."""
    blob = np.asarray(blob)
    lead = blob.shape[:-2]
    if c.packed:
        flat = blob.reshape((-1,) + blob.shape[-2:])
        out = np.stack([_unpack_pair_np(b) for b in flat])
        out = out.reshape(lead + (c.phys_rows, c.width))
    elif c.row_tiles > 1:
        out = blob.reshape(lead + (c.phys_rows, c.width)).astype(np.float32)
    else:
        out = blob.astype(np.float32)
    return out[..., : c.local_rows, :]


def class_from_logical(c: WidthClass, logical: np.ndarray) -> np.ndarray:
    """Host-side: logical [..., local_rows, width] fp32 -> storage form
    (scratch tail zero-filled)."""
    logical = np.asarray(logical, np.float32)
    lead = logical.shape[:-2]
    full = np.zeros(lead + (c.phys_rows, c.width), np.float32)
    full[..., : c.local_rows, :] = logical
    if c.packed:
        flat = full.reshape((-1,) + full.shape[-2:])
        out = np.stack([_pack_pair_np(b) for b in flat])
        return out.reshape(lead + (c.phys_rows // 2, c.width))
    if c.row_tiles > 1:
        return full.reshape(lead + (c.phys_rows * c.row_tiles, 128))
    return full.astype(c.data_type.as_jnp())


def class_logical_blob_jnp(c: WidthClass, blob: jnp.ndarray) -> jnp.ndarray:
    """Device-side: [W, ...] storage-form blob -> [W, local_rows, width]
    fp32 logical view (full-pass copies for packed/tile forms — boundary
    paths like resharding only)."""
    if c.packed:
        from torchrec_tpu.ops.tbe_pallas import unpack_pair_blob

        blob = jax.vmap(unpack_pair_blob)(blob)
    elif c.row_tiles > 1:
        blob = blob.reshape(blob.shape[0], -1, c.width)
    return blob[:, : c.local_rows].astype(jnp.float32)


def class_from_logical_jnp(c: WidthClass, logical: jnp.ndarray) -> jnp.ndarray:
    """Device-side inverse of :func:`class_logical_blob_jnp` (scratch
    tail zero-filled; bf16 rounds RN-even)."""
    w = logical.shape[0]
    logical = logical.astype(jnp.float32)
    if c.scratch_rows:
        logical = jnp.concatenate(
            [logical, jnp.zeros((w, c.scratch_rows, c.width), jnp.float32)],
            axis=1,
        )
    if c.packed:
        from torchrec_tpu.ops.tbe_pallas import pack_pair_blob

        return jax.vmap(pack_pair_blob)(logical)
    if c.row_tiles > 1:
        return logical.reshape(w, -1, 128)
    return logical.astype(c.data_type.as_jnp())


def _pack_pair_np(x: np.ndarray) -> np.ndarray:
    """numpy pair-pack: [R (even), D] float -> u32 [R/2, D] in the
    tbe_pallas pair layout (delegates to its exact host converter)."""
    import ml_dtypes

    from torchrec_tpu.ops.tbe_pallas import pack_pairs_host

    return pack_pairs_host(np.asarray(x).astype(ml_dtypes.bfloat16))


def _unpack_pair_np(blob: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_pack_pair_np`: u32 [P, D] -> fp32 [2P, D]."""
    import ml_dtypes

    from torchrec_tpu.ops.tbe_pallas import unpack_pairs_host

    return unpack_pairs_host(blob, ml_dtypes.bfloat16).astype(np.float32)


def build_width_classes(
    tables: Dict[str, "BaseEmbeddingConfig"],  # noqa: F821
    plan: EmbeddingModuleShardingPlan,
    feature_names: Sequence[str],
    feat_of_table: Dict[str, List[int]],
    world_size: int,
    fast_window: Optional[int] = None,
) -> List[WidthClass]:
    """Compile plan -> width classes (skips DATA_PARALLEL tables).

    ``fast_window`` (= the module's ``max_unique_gradient_rows``): when
    set, classes whose storage the fused Pallas kernel tier supports get
    a sentinel scratch tail, tile-row (wide fp32) or pair-packed (bf16)
    physical storage, and a small-first packing order with per-device
    dense-path boundaries — the sharded analog of the single-chip
    TableGroup fast layout (one kernel stack for every sharding type,
    reference batched_embedding_kernel.py:3725)."""
    w = world_size
    f_count = len(feature_names)
    class_specs: Dict[Tuple[int, DataType], Dict] = {}
    for name, ps in plan.items():
        if ps.sharding_type == ShardingType.DATA_PARALLEL:
            continue
        t = tables[name]
        blocks = sorted({(s.col_start, s.col_count) for s in ps.shards})
        for col_start, col_count in blocks:
            ck = (col_count, t.data_type)
            spec = class_specs.setdefault(ck, {"tables": []})
            row_shards = [
                s for s in ps.shards
                if s.col_start == col_start and s.col_count == col_count
            ]
            spec["tables"].append((name, col_start, row_shards))

    from torchrec_tpu.modules.embedding_modules import (
        DENSE_GRAD_ROWS_THRESHOLD,
    )

    classes: List[WidthClass] = []
    for (width, dt), spec in sorted(
        class_specs.items(), key=lambda kv: (kv[0][0], kv[0][1].value)
    ):
        vf_feature: List[int] = []
        vf_col_start: List[int] = []
        tbl_block_counter: Dict[str, int] = {}
        entries = []  # (table, class-block-idx, col_start, row_shards)
        # small tables first (stable within each region): their shards
        # pack at the front of every device blob, giving the backward a
        # dense-path prefix (mirrors _EmbeddingCollectionBase grouping)
        def _is_large(item):
            return tables[item[0]].num_embeddings > DENSE_GRAD_ROWS_THRESHOLD

        for name, col_start, row_shards in sorted(
            spec["tables"], key=_is_large
        ):
            bi = tbl_block_counter.get(name, 0)
            tbl_block_counter[name] = bi + 1
            entries.append((name, bi, col_start, row_shards))
        max_blocks = max(tbl_block_counter.values())
        vf_pos = np.full((f_count + 1, max_blocks), -1, dtype=np.int32)
        for name, bi, col_start, row_shards in entries:
            for fi in feat_of_table[name]:
                vf_pos[fi, bi] = len(vf_feature)
                vf_feature.append(fi)
                vf_col_start.append(col_start)

        id_lo = np.zeros((w, f_count + 1, max_blocks), np.int32)
        id_hi = np.zeros((w, f_count + 1, max_blocks), np.int32)
        blob_off = np.zeros((w, f_count + 1, max_blocks), np.int32)
        packing: List[List[Tuple[str, int, int, int, int]]] = [
            [] for _ in range(w)
        ]
        dev_rows = [0] * w
        small_rows_dev = [0] * w
        small_done = False
        for name, bi, col_start, row_shards in entries:
            if not small_done and _is_large((name, col_start, row_shards)):
                # first LARGE entry: freeze every device's small boundary,
                # 8-aligned (pad rows are dead) so the dense-path prefix
                # and the pair/tile alignments never straddle it
                small_rows_dev = [_round_up(r, 8) for r in dev_rows]
                dev_rows = list(small_rows_dev)
                small_done = True
            for s in row_shards:
                d = s.rank
                if d < 0 or d >= w:
                    raise ValueError(f"shard rank {d} outside world {w}")
                for fi in feat_of_table[name]:
                    # the (device, feature, block) placement cell holds ONE
                    # contiguous id range; a second row shard of the same
                    # column block on the same rank would silently clobber
                    # the first (its ids would look up as zeros)
                    if id_hi[d, fi, bi] > id_lo[d, fi, bi]:
                        raise ValueError(
                            f"table {name!r}: two row shards of column "
                            f"block {bi} placed on rank {d}; merge them "
                            "into one contiguous shard per rank"
                        )
                    id_lo[d, fi, bi] = s.row_start
                    id_hi[d, fi, bi] = s.row_start + s.row_count
                    blob_off[d, fi, bi] = dev_rows[d]
                packing[d].append(
                    (
                        name,
                        col_start,
                        s.row_start,
                        s.row_start + s.row_count,
                        dev_rows[d],
                    )
                )
                dev_rows[d] += s.row_count
        if not small_done:  # all tables small
            small_rows_dev = [_round_up(r, 8) for r in dev_rows]
        local_rows = _round_up(max(max(dev_rows), 1), 8)
        has_large = any(
            dev_rows[d] > small_rows_dev[d] for d in range(w)
        )

        # ---- fused-kernel storage tier gates (see docstring) ----
        scratch = 0
        tiles = 1
        packed = False
        if fast_window is not None and has_large:
            if dt == DataType.FP32 and width == 128:
                supported = True
            elif dt == DataType.FP32 and width > 128 and width % 128 == 0:
                supported = True
                tiles = width // 128
            elif dt == DataType.BF16 and width == 128:
                supported = True
                packed = True
            else:
                supported = False
            if supported:
                from torchrec_tpu.ops.tbe_pallas import _CHUNK as _wc

                scratch = _round_up(fast_window, _wc)
                if packed:
                    # pair-granular kernel: sentinels are PAIR indices,
                    # so the tail needs 2x the rows; local_rows is
                    # 8-aligned (even), so phys_rows stays even
                    scratch *= 2
        classes.append(
            WidthClass(
                key=f"shard_w{width}_{dt.value.lower()}",
                width=width,
                data_type=dt,
                max_blocks=max_blocks,
                num_vf=len(vf_feature),
                local_rows=local_rows,
                vf_feature=tuple(vf_feature),
                vf_col_start=tuple(vf_col_start),
                vf_pos=vf_pos,
                id_lo=id_lo,
                id_hi=id_hi,
                blob_off=blob_off,
                packing=tuple(tuple(p) for p in packing),
                scratch_rows=scratch,
                row_tiles=tiles,
                packed=packed,
                small_rows_dev=tuple(small_rows_dev),
                small_rows_max=max(small_rows_dev),
            )
        )
    return classes


class ShardedCollectionBase:
    """Shared param (un)packing + optimizer-state plumbing over width
    classes. Subclasses set ``self._classes``, ``self._env`` and optionally
    ``self._dp`` (an unsharded collection over the DATA_PARALLEL tables,
    whose group params are stored under ``dp_<group key>``)."""

    _classes: List[WidthClass]
    _env: ShardingEnv
    _dp = None  # Optional unsharded collection
    _all_tables: Sequence  # full table-config list

    @property
    def env(self) -> ShardingEnv:
        return self._env

    def _sharding(self, *spec) -> jax.sharding.NamedSharding:
        return jax.sharding.NamedSharding(
            self._env.mesh, jax.sharding.PartitionSpec(*spec)
        )

    def shard_params(self, unsharded: Params) -> Params:
        """Re-layout unsharded collection group params into per-device
        blobs (plus replicated DP groups)."""
        src = self._unsharded_collection()
        per_table = {
            t.name: np.asarray(src.table_slice(unsharded, t.name))
            for t in self._all_tables
        }
        return self.shard_from_tables(per_table)

    def shard_from_tables(self, per_table: Dict[str, np.ndarray]) -> Params:
        w = self._env.world_size
        params: Params = {}
        for c in self._classes:
            blob = np.zeros((w, c.local_rows, c.width), dtype=np.float32)
            for d in range(w):
                for name, col_start, row_lo, row_hi, brow in c.packing[d]:
                    blob[d, brow : brow + (row_hi - row_lo)] = per_table[name][
                        row_lo:row_hi, col_start : col_start + c.width
                    ]
            params[c.key] = device_put_global(
                class_from_logical(c, blob),
                self._sharding(self._env.shard_axis, None, None),
            )
        if self._dp is not None:
            # the DP collection owns its storage format (pair-packed
            # bf16, scratch tails, tile rows) — build through it
            dp_params = self._dp.params_from_tables(
                {
                    n: per_table[n]
                    for g in self._dp.groups
                    for n in g.table_names
                }
            )
            for k, v in dp_params.items():
                params[f"dp_{k}"] = device_put_global(v, self._sharding())
        return params

    def unshard_params(self, params: Params) -> Dict[str, np.ndarray]:
        """Gather per-table full weights (checkpoint/state_dict analog,
        reference embeddingbag.py:1231 ShardedTensor views)."""
        out: Dict[str, np.ndarray] = {}
        for t in self._all_tables:
            out[t.name] = np.zeros(
                (t.num_embeddings, t.embedding_dim), np.float32
            )
        for c in self._classes:
            blob = class_logical_blob(c, jax.device_get(params[c.key]))
            for d in range(self._env.world_size):
                for name, col_start, row_lo, row_hi, brow in c.packing[d]:
                    out[name][row_lo:row_hi, col_start : col_start + c.width] = (
                        blob[d, brow : brow + (row_hi - row_lo)]
                    )
        if self._dp is not None:
            dp_params = {
                g.key: params[f"dp_{g.key}"] for g in self._dp.groups
            }
            for name, w in self._dp.split_params(dp_params).items():
                out[name] = np.asarray(jax.device_get(w), np.float32)
        return out

    def init_optimizer(
        self, params: Params, optimizer: EmbeddingOptimizer
    ) -> Dict[str, Dict[str, jnp.ndarray]]:
        states: Dict[str, Dict[str, jnp.ndarray]] = {}
        for c in self._classes:
            # prototype carries the LOGICAL shape/dtype: optimizers key
            # behavior on it (stochastic rounding exists only for bf16);
            # pair-packed/tile-row storage forms keep logical-row state
            # (u32 pair rows would halve row counts and break momentum)
            proto = optimizer.init(
                jnp.zeros((c.local_rows, c.width), c.data_type.as_jnp())
            )
            w = self._env.world_size
            states[c.key] = {
                k: device_put_global(
                    jnp.broadcast_to(v[None], (w,) + v.shape),
                    self._sharding(self._env.shard_axis, *([None] * v.ndim)),
                )
                for k, v in proto.items()
            }
        if self._dp is not None:
            dp_params = {
                g.key: params[f"dp_{g.key}"] for g in self._dp.groups
            }
            dp_states = self._dp.init_optimizer(dp_params, optimizer)
            for k, sub in dp_states.items():
                states[f"dp_{k}"] = jax.tree_util.tree_map(
                    lambda v: device_put_global(v, self._sharding()), sub
                )
        return states

    def _param_specs(self):
        P = jax.sharding.PartitionSpec
        axis = self._env.shard_axis
        specs = {c.key: P(axis, None, None) for c in self._classes}
        if self._dp is not None:
            for g in self._dp.groups:
                specs[f"dp_{g.key}"] = P()
        return specs

    def _unsharded_collection(self):
        raise NotImplementedError
