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
    local_rows: int  # padded uniform per-device blob rows
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


def build_width_classes(
    tables: Dict[str, "BaseEmbeddingConfig"],  # noqa: F821
    plan: EmbeddingModuleShardingPlan,
    feature_names: Sequence[str],
    feat_of_table: Dict[str, List[int]],
    world_size: int,
) -> List[WidthClass]:
    """Compile plan -> width classes (skips DATA_PARALLEL tables)."""
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

    classes: List[WidthClass] = []
    for (width, dt), spec in sorted(
        class_specs.items(), key=lambda kv: (kv[0][0], kv[0][1].value)
    ):
        vf_feature: List[int] = []
        vf_col_start: List[int] = []
        tbl_block_counter: Dict[str, int] = {}
        entries = []  # (table, class-block-idx, col_start, row_shards)
        for name, col_start, row_shards in spec["tables"]:
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
        for name, bi, col_start, row_shards in entries:
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
        local_rows = _round_up(max(max(dev_rows), 1), 8)
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
                blob.astype(c.data_type.as_jnp()),
                self._sharding(self._env.shard_axis, None, None),
            )
        if self._dp is not None:
            for g in self._dp.groups:
                parts = [per_table[n] for n in g.table_names]
                params[f"dp_{g.key}"] = device_put_global(
                    np.concatenate(parts, axis=0).astype(g.data_type.as_jnp()),
                    self._sharding(),
                )
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
            blob = np.asarray(jax.device_get(params[c.key]), np.float32)
            for d in range(self._env.world_size):
                for name, col_start, row_lo, row_hi, brow in c.packing[d]:
                    out[name][row_lo:row_hi, col_start : col_start + c.width] = (
                        blob[d, brow : brow + (row_hi - row_lo)]
                    )
        if self._dp is not None:
            for g in self._dp.groups:
                stack = np.asarray(
                    jax.device_get(params[f"dp_{g.key}"]), np.float32
                )
                for name, off, rows in zip(
                    g.table_names, g.row_offsets, g.table_rows
                ):
                    out[name] = stack[off : off + rows]
        return out

    def init_optimizer(
        self, params: Params, optimizer: EmbeddingOptimizer
    ) -> Dict[str, Dict[str, jnp.ndarray]]:
        states: Dict[str, Dict[str, jnp.ndarray]] = {}
        for c in self._classes:
            # prototype must carry the BLOB's storage dtype: optimizers key
            # behavior on it (stochastic rounding exists only for bf16)
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
            for g in self._dp.groups:
                states[f"dp_{g.key}"] = jax.tree_util.tree_map(
                    lambda v: device_put_global(v, self._sharding()),
                    optimizer.init(params[f"dp_{g.key}"]),
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
