"""Table-wise sharded quantized inference — the distinct multi-device
"one-to-all input / all-to-one output" serving layout.

Capability parity with the reference's single-process multi-device
inference path (torchrec/distributed/quant_embeddingbag.py:171
ShardedQuantEmbeddingBagCollection; input via KJTOneToAll
dist_data.py:1242, output via EmbeddingsAllToOne dist_data.py:1630;
planned by shard_quant_model with TW defaults, inference/modules.py:490).

TPU-native shape: ONE SPMD program over a 1-axis ``serve`` mesh.

* Placement: whole tables greedy byte-balanced across devices (or a
  caller-provided table->device map, e.g. from the planner's TW pass).
* Storage: per (dim, quant-format) class, every device's tables pack into
  one row-stacked quant blob; the ``[W, rows_pad, D]`` stack is sharded on
  its leading axis, so each chip physically holds only its tables' bytes
  (unlike the replicated fast path in inference/modules.py).
* Input one-to-all: the KJT is replicated (free at trace level — the same
  host feeds every chip in single-process serving, exactly KJTOneToAll's
  role).
* Compute: each device looks up ONLY its local features (placement arrays
  ``row_off[device, feature]`` indexed with ``lax.axis_index``; non-local
  slots masked to zero rows) and pools locally.
* Output all-to-one: a single ``psum`` over ``serve`` materializes the full
  ``[B, sum(dims)]`` KeyedTensor; fetching any one replica is the
  EmbeddingsAllToOne hop (use ``out_device`` to pin it).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from torchrec_tpu.ops.lookup import roll_rows as _roll_rows
import numpy as np
from jax import shard_map

from torchrec_tpu.quant.embedding_modules import (
    QuantEmbeddingBagCollection,
    QuantParams,
    gather_dequant,
)
from torchrec_tpu.sparse import KeyedJaggedTensor, KeyedTensor
from torchrec_tpu.types import PoolingType

__all__ = [
    "ShardedQuantEmbeddingBagCollection",
    "ShardedQuantEmbeddingCollection",
    "balance_tables",
]

P = jax.sharding.PartitionSpec


def balance_tables(
    sizes: Dict[str, int], world_size: int
) -> Dict[str, int]:
    """Greedy byte-balanced table->device placement (largest first), the
    TW default shard_quant_model plans (reference inference/modules.py:490)."""
    load = [0] * world_size
    out: Dict[str, int] = {}
    for name in sorted(sizes, key=lambda n: -sizes[n]):
        d = int(np.argmin(load))
        out[name] = d
        load[d] += sizes[name]
    return out


@dataclasses.dataclass(frozen=True)
class _QuantClass:
    """One (dim, quant-format) class of table-wise placed tables."""

    key: str
    dim: int
    fmt: str  # "int8" | "int4" | "int2" | "fp8" | "fp16" | "bf16"
    feature_ids: Tuple[int, ...]  # global feature ids, class order
    # [W, F] local blob row offset of each feature's table (-1 = not local)
    row_off: np.ndarray
    rows_pad: int  # uniform per-device blob rows (max over devices)
    # host-side: table -> (device, row offset) for state assembly
    table_place: Dict[str, Tuple[int, int]]


class ShardedQuantEmbeddingBagCollection:
    """forward(KJT) -> KeyedTensor with physically table-wise quant params.

    ``shard_qparams`` turns single-blob :class:`QuantEmbeddingBagCollection`
    params into the sharded stacks; ``apply`` runs the SPMD program.
    """

    def __init__(
        self,
        qebc: QuantEmbeddingBagCollection,
        mesh: jax.sharding.Mesh,
        axis: str = "serve",
        placement: Optional[Dict[str, int]] = None,
    ):
        self._qebc = qebc
        self._ebc = qebc.unquantized
        self._mesh = mesh
        self._axis = axis
        w = int(mesh.shape[axis])
        self._w = w
        ebc = self._ebc
        fmt = {
            "INT8": "int8", "INT4": "int4", "INT2": "int2",
            "FP8": "fp8",
            "FP16": "fp16", "BF16": "bf16",
        }[qebc.data_type.value]
        self._fmt = fmt

        # tolerate EC-backed structure-only views (sequence serving)
        tables = list(
            ebc.embedding_bag_configs()
            if hasattr(ebc, "embedding_bag_configs")
            else ebc.embedding_configs()
        )
        if placement is None:
            elem = {
                "int8": 1.0, "int4": 0.5, "int2": 0.25, "fp8": 1.0,
                "fp16": 2.0, "bf16": 2.0,
            }[fmt]
            placement = balance_tables(
                {
                    t.name: int(t.num_embeddings * t.embedding_dim * elem)
                    for t in tables
                },
                w,
            )
        self.placement = dict(placement)

        feat_of_table: Dict[str, List[int]] = {}
        for i, ti in enumerate(ebc._feature_table):
            feat_of_table.setdefault(ebc._tables[ti].name, []).append(i)

        f = len(ebc.feature_names())
        classes: Dict[int, List] = {}
        for t in tables:
            classes.setdefault(t.embedding_dim, []).append(t)
        self._classes: List[_QuantClass] = []
        for dim, cls_tables in sorted(classes.items()):
            row_off = np.full((w, f), -1, np.int32)
            cursor = [0] * w
            place: Dict[str, Tuple[int, int]] = {}
            feats: List[int] = []
            for t in cls_tables:
                d = placement[t.name]
                place[t.name] = (d, cursor[d])
                for fi in feat_of_table.get(t.name, []):
                    row_off[d, fi] = cursor[d]
                    feats.append(fi)
                cursor[d] += t.num_embeddings
            self._classes.append(
                _QuantClass(
                    key=f"serve_d{dim}_{fmt}",
                    dim=dim,
                    fmt=fmt,
                    feature_ids=tuple(sorted(feats)),
                    row_off=row_off,
                    rows_pad=max(max(cursor), 1),
                    table_place=place,
                )
            )

    # ------------------------------------------------------------ params
    def shard_qparams(self, qparams: QuantParams) -> Dict[str, Dict[str, jnp.ndarray]]:
        """Single-blob quant params -> per-class ``[W, rows_pad, ...]``
        stacks, placed with the leading axis sharded over the serve mesh."""
        if any("remap" in qt for qt in qparams.values()):
            raise NotImplementedError(
                "pruned quant tables (remap) are unsharded-serving only: "
                "the sharded layout packs COMPACT rows but routes by "
                "ORIGINAL id ranges; prune-then-serve single-host, or "
                "shard without pruning"
            )
        ebc = self._ebc
        by_table: Dict[str, Dict[str, np.ndarray]] = {}
        for g in ebc.groups:
            qt = {k: np.asarray(v) for k, v in qparams[g.key].items()}
            for name, rows, off in zip(
                g.table_names, g.table_rows, g.row_offsets
            ):
                by_table[name] = {
                    k: v[off: off + rows] for k, v in qt.items()
                }
        out: Dict[str, Dict[str, jnp.ndarray]] = {}
        sh = jax.sharding.NamedSharding(self._mesh, P(self._axis))
        for c in self._classes:
            any_tbl = next(iter(c.table_place))
            parts = {
                k: np.zeros((self._w, c.rows_pad) + v.shape[1:], v.dtype)
                for k, v in by_table[any_tbl].items()
            }
            for name, (d, roff) in c.table_place.items():
                for k, v in by_table[name].items():
                    parts[k][d, roff: roff + v.shape[0]] = v
            out[c.key] = {
                k: jax.device_put(jnp.asarray(v), sh)
                for k, v in parts.items()
            }
        return out

    # ----------------------------------------------------------- forward
    def _forward_local(self, sharded_qparams, kjt: KeyedJaggedTensor):
        """Runs INSIDE shard_map: local lookups + psum all-to-one."""
        ebc = self._ebc
        kjt, b, f, seg, slot_feature, slot_batch = ebc._prep(kjt)
        values = kjt.values()
        weights = kjt.weights() if ebc.is_weighted() else None
        lengths = kjt.lengths()
        d = jax.lax.axis_index(self._axis)
        per_feature: List[Optional[jnp.ndarray]] = [None] * f
        for c in self._classes:
            n_cf = len(c.feature_ids)
            if n_cf == 0:
                continue
            # class-local feature index, -1 for other classes' features
            cf = np.full(f + 1, -1, np.int32)
            for j, fi in enumerate(c.feature_ids):
                cf[fi] = j
            cfeat = jnp.take(jnp.asarray(cf), slot_feature)  # [N]
            off_f = jnp.take(  # this device's row offsets, [F]
                jnp.asarray(c.row_off), d, axis=0
            )
            local_off = jnp.take(
                jnp.concatenate([off_f, jnp.array([-1], jnp.int32)]),
                slot_feature,
            )
            valid = (cfeat >= 0) & (local_off >= 0)
            rows_idx = jnp.where(valid, local_off + values, 0)
            qt = sharded_qparams[c.key]
            # ONE dequant-gather implementation for every format (the
            # sequence class below uses the same helper — keeping the
            # pooled path inline would mean two copies of the quant math)
            rows = gather_dequant(
                {k: v[0] for k, v in qt.items()}, rows_idx
            )
            if weights is not None:
                rows = rows * weights[:, None]
            rows = jnp.where(valid[:, None], rows, 0.0)
            seg_c = jnp.where(valid, cfeat * b + slot_batch, n_cf * b)
            pooled = jax.ops.segment_sum(
                rows, seg_c, num_segments=n_cf * b + 1
            )[: n_cf * b].reshape(n_cf, b, c.dim)
            # all-to-one: every feature's owner contributes its block
            pooled = jax.lax.psum(pooled, self._axis)
            for j, fi in enumerate(c.feature_ids):
                out = pooled[j]
                if (
                    ebc._poolings[fi] == PoolingType.MEAN
                    and not ebc.is_weighted()
                ):
                    denom = jnp.maximum(lengths[fi].astype(out.dtype), 1.0)
                    out = out / denom[:, None]
                per_feature[fi] = out
        vals = jnp.concatenate(per_feature, axis=1)
        return vals

    def apply(
        self, sharded_qparams, kjt: KeyedJaggedTensor
    ) -> KeyedTensor:
        ebc = self._ebc
        param_specs = jax.tree.map(lambda _: P(self._axis), sharded_qparams)
        kjt_specs = jax.tree.map(lambda _: P(), kjt)
        fn = shard_map(
            self._forward_local,
            mesh=self._mesh,
            in_specs=(param_specs, kjt_specs),
            out_specs=P(),
            check_vma=False,
        )
        vals = fn(sharded_qparams, kjt)
        return KeyedTensor(
            keys=ebc.feature_names(),
            length_per_key=ebc.embedding_dims(),
            values=vals,
        )


class ShardedQuantEmbeddingCollection:
    """Table-wise sharded quantized SEQUENCE serving: forward(KJT) ->
    Dict[str, JaggedTensor] with physically table-wise quant params.

    Reference: ShardedQuantEmbeddingCollection
    (torchrec/distributed/quant_embedding.py:597) — the unpooled serving
    layout (input one-to-all via replication, per-id rows assembled with
    one psum = SeqEmbeddingsAllToOne, dist_data.py:1685).

    Reuses the pooled module's placement compiler/param sharder: the
    class-blob layout is identical, only the compute (per-id rows instead
    of pooled sums) differs.
    """

    def __init__(
        self,
        qec,  # quant.embedding_modules.QuantEmbeddingCollection
        mesh: jax.sharding.Mesh,
        axis: str = "serve",
        placement: Optional[Dict[str, int]] = None,
    ):
        from torchrec_tpu.quant.embedding_modules import (
            QuantEmbeddingBagCollection,
        )

        self._qec = qec
        self._ec = qec.unquantized
        self._mesh = mesh
        self._axis = axis
        # piggyback on the pooled module's placement/layout compiler via a
        # bag-collection view of the same tables (structure-only: groups,
        # feature maps and table offsets are identical across EC/EBC)
        self._layout = ShardedQuantEmbeddingBagCollection.__new__(
            ShardedQuantEmbeddingBagCollection
        )
        ShardedQuantEmbeddingBagCollection.__init__(
            self._layout,
            _StructureOnlyQEBC(self._ec, qec.data_type),
            mesh,
            axis,
            placement,
        )
        self._classes = self._layout._classes
        self.placement = self._layout.placement

    def shard_qparams(self, qparams):
        if any("remap" in qt for qt in qparams.values()):
            raise NotImplementedError(
                "pruned quant tables (remap) are unsharded-serving only "
                "(see ShardedQuantEmbeddingBagCollection.shard_qparams)"
            )
        return self._layout.shard_qparams(qparams)

    def _forward_local(self, sharded_qparams, kjt: KeyedJaggedTensor):
        """INSIDE shard_map: local per-id rows + psum all-to-one. Returns
        the full ``[cap, dim]`` row stream per class."""
        ec = self._ec
        kjt = kjt.select_keys(ec._feature_names)
        b = kjt.stride()
        f = len(ec._feature_names)
        seg = kjt.segment_ids()
        slot_feature = jnp.minimum(seg // b, f)
        values = kjt.values()
        valid_slot = kjt.valid_mask()
        d = jax.lax.axis_index(self._axis)
        out = {}
        for c in self._classes:
            from torchrec_tpu.quant.embedding_modules import gather_dequant

            off_f = jnp.take(jnp.asarray(c.row_off), d, axis=0)  # [F]
            local_off = jnp.take(
                jnp.concatenate([off_f, jnp.array([-1], jnp.int32)]),
                slot_feature,
            )
            valid = (local_off >= 0) & valid_slot
            rows_idx = jnp.where(valid, local_off + values, 0)
            qt = {k: v[0] for k, v in sharded_qparams[c.key].items()}
            rows = gather_dequant(qt, rows_idx)
            rows = jnp.where(valid[:, None], rows, 0.0)
            # all-to-one: each slot's rows exist only on its table's owner
            out[c.key] = jax.lax.psum(rows, self._axis)
        return out

    def apply(
        self, sharded_qparams, kjt: KeyedJaggedTensor
    ) -> Dict[str, "JaggedTensor"]:
        from torchrec_tpu.sparse import JaggedTensor

        ec = self._ec
        kjt_mat = kjt.select_keys(ec._feature_names).materialize()
        param_specs = jax.tree.map(lambda _: P(self._axis), sharded_qparams)
        kjt_specs = jax.tree.map(lambda _: P(), kjt_mat)
        fn = shard_map(
            self._forward_local,
            mesh=self._mesh,
            in_specs=(param_specs, kjt_specs),
            out_specs=P(),
            check_vma=False,
        )
        streams = fn(sharded_qparams, kjt_mat)
        offsets_pk = kjt_mat.offset_per_key()
        lengths = kjt_mat.lengths()
        feat_class = {}
        for c in self._classes:
            for fi in c.feature_ids:
                feat_class[fi] = c.key
        out: Dict[str, JaggedTensor] = {}
        w = kjt_mat.weights_or_none()  # preserved like the unsharded module
        for fi, name in enumerate(ec._feature_names):
            start = offsets_pk[fi]
            stream = streams[feat_class[fi]]
            out[name] = JaggedTensor(
                values=_roll_rows(stream, start),
                lengths=lengths[fi],
                weights=_roll_rows(w, start) if w is not None else None,
            )
        return out


class _StructureOnlyQEBC:
    """Duck-typed QuantEmbeddingBagCollection carrying only the structural
    fields the sharded layout compiler reads (an EC has the same grouping
    metadata as an EBC — tables, features, groups)."""

    def __init__(self, collection, data_type):
        self._collection = collection
        self._data_type = data_type

    @property
    def data_type(self):
        return self._data_type

    @property
    def unquantized(self):
        return self._collection



