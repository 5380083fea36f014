"""Quantized embedding collections for inference.

Capability parity with torchrec/quant/embedding_modules.py
(QuantEmbeddingBagCollection:337, QuantEmbeddingCollection:739,
QuantManagedCollisionEmbeddingCollection:1054 — int8/int4/int2/fp8
table-batched inference modules converted from trained modules).

TPU-first: row-wise symmetric-range quantization — per-row fp32
(scale, zero) arrays beside an int8 (or fp8) value array; dequant fuses
into the gather+pool (XLA fuses the elementwise dequant into the
scatter-add consumer). int8 rows are also the layout the Pallas quant
lookup kernel consumes.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from torchrec_tpu.ops.lookup import roll_rows as _roll_rows

from torchrec_tpu.modules.embedding_configs import EmbeddingBagConfig
from torchrec_tpu.modules.embedding_modules import (
    EmbeddingBagCollection,
    EmbeddingCollection,
    TableGroup,
)
from torchrec_tpu.sparse import JaggedTensor, KeyedJaggedTensor, KeyedTensor
from torchrec_tpu.types import DataType, PoolingType

__all__ = [
    "prune_rows_by_norm",
    "QuantEmbeddingBagCollection",
    "QuantEmbeddingCollection",
    "QuantManagedCollisionEmbeddingCollection",
    "QuantManagedCollisionEmbeddingBagCollection",
    "quantize_table",
    "dequantize_table",
    "gather_dequant",
]

QuantParams = Dict[str, Dict[str, jnp.ndarray]]


def prune_rows_by_norm(
    collection, params: Dict[str, jnp.ndarray], rows_post: Dict[str, int]
) -> Dict[str, np.ndarray]:
    """Keep masks for magnitude pruning: per named table, keep the
    ``rows_post[name]`` rows with the largest L2 norm (the reference's
    set_pruning_data consumers compute rows-post-pruning the same way,
    inference/modules.py:353). Returns {table: bool mask} for
    ``quantize_from(..., pruning=...)``; unnamed tables keep all rows."""
    import numpy as np

    masks: Dict[str, np.ndarray] = {}
    base = collection  # EBC or EC
    for g in base.groups:
        blob = np.asarray(params[g.key][: g.total_rows], np.float32)
        for name, off, rows in zip(g.table_names, g.row_offsets, g.table_rows):
            if name not in rows_post:
                continue
            k = int(rows_post[name])
            if not 0 <= k <= rows:
                raise ValueError(f"{name}: rows_post {k} not in [0, {rows}]")
            norms = np.linalg.norm(blob[off : off + rows], axis=1)
            keep = np.zeros(rows, bool)
            keep[np.argsort(-norms, kind="stable")[:k]] = True
            masks[name] = keep
    return masks


def _quantize_groups(groups, params, data_type, pruning=None) -> QuantParams:
    """Per-group quantization with optional row pruning. ``pruning``:
    {table_name: bool keep-mask [rows] | int kept-row indices} — pruned
    rows are dropped from the stored blob and a group-level remap
    (original row -> compact row, -1 = pruned) rides in the qparams."""
    import numpy as np

    out: QuantParams = {}
    for g in groups:
        blob = params[g.key][: g.total_rows]
        if pruning and any(t in pruning for t in g.table_names):
            keep = np.ones(g.total_rows, bool)
            for name, off, rows in zip(
                g.table_names, g.row_offsets, g.table_rows
            ):
                if name not in pruning:
                    continue
                sel = np.asarray(pruning[name])
                mask = np.zeros(rows, bool)
                if sel.dtype == bool:
                    if sel.shape != (rows,):
                        raise ValueError(
                            f"{name}: keep mask shape {sel.shape} != ({rows},)"
                        )
                    mask = sel
                else:
                    mask[sel.astype(np.int64)] = True
                keep[off : off + rows] = mask
            remap = np.full(g.total_rows, -1, np.int32)
            remap[keep] = np.arange(int(keep.sum()), dtype=np.int32)
            qt = quantize_table(
                jnp.asarray(np.asarray(blob)[keep]), data_type
            )
            qt["remap"] = jnp.asarray(remap)
            out[g.key] = qt
        else:
            out[g.key] = quantize_table(blob, data_type)
    return out


def quantize_table(
    weights: jnp.ndarray, data_type: DataType
) -> Dict[str, jnp.ndarray]:
    """Row-wise quantization of a [R, D] fp table."""
    w = weights.astype(jnp.float32)
    if data_type == DataType.INT8:
        lo = jnp.min(w, axis=1, keepdims=True)
        hi = jnp.max(w, axis=1, keepdims=True)
        scale = jnp.maximum((hi - lo) / 255.0, 1e-12)
        # zero at q == 0 must sit 128 steps above lo so BOTH ends are
        # exact: q(lo) = -128, q(hi) = 127 (zero = lo + 127*scale would
        # saturate every row's max one full step low)
        zero = lo + 128.0 * scale
        q = jnp.clip(jnp.round((w - zero) / scale), -128, 127).astype(jnp.int8)
        return {"q": q, "scale": scale[:, 0], "zero": zero[:, 0]}
    if data_type == DataType.INT4:
        from torchrec_tpu.sparse.tensor_types import pack_int4

        lo = jnp.min(w, axis=1, keepdims=True)
        hi = jnp.max(w, axis=1, keepdims=True)
        scale = jnp.maximum((hi - lo) / 15.0, 1e-12)
        q = jnp.clip(jnp.round((w - lo) / scale), 0, 15)
        return {
            "q4": pack_int4(q),  # [R, D//2] uint8 — half the int8 bytes
            "scale": scale[:, 0],
            "zero": lo[:, 0],
        }
    if data_type == DataType.INT2:
        from torchrec_tpu.sparse.tensor_types import pack_int2

        lo = jnp.min(w, axis=1, keepdims=True)
        hi = jnp.max(w, axis=1, keepdims=True)
        scale = jnp.maximum((hi - lo) / 3.0, 1e-12)
        q = jnp.clip(jnp.round((w - lo) / scale), 0, 3)
        return {
            "q2": pack_int2(q),  # [R, D//4] uint8 — a quarter of int8
            "scale": scale[:, 0],
            "zero": lo[:, 0],
        }
    if data_type == DataType.FP8:
        return {"q": w.astype(jnp.float8_e4m3fn)}
    if data_type == DataType.FP16:
        return {"q": w.astype(jnp.float16)}
    if data_type == DataType.BF16:
        return {"q": w.astype(jnp.bfloat16)}
    raise NotImplementedError(f"quant dtype {data_type}")


def gather_dequant(
    qt: Dict[str, jnp.ndarray], ids: jnp.ndarray
) -> jnp.ndarray:
    """Gather rows from a quantized table and dequantize to fp32 — the
    fused dequant-in-lookup step of the reference's IntNBit TBE kernels
    (torchrec/distributed/quant_embedding_kernel.py).

    When the table was PRUNED at quantization ("remap" present), ids are
    first remapped into the compact row space; pruned ids return zero rows
    (the reference's pruned-TBE index remapping semantics,
    quant_embedding_kernel.py pruning_indices_remapping)."""
    if "remap" in qt:
        remap = qt["remap"]  # [original_rows] int32 -> compact row | -1
        r = jnp.take(remap, jnp.clip(ids, 0, remap.shape[0] - 1))
        inner = {k: v for k, v in qt.items() if k != "remap"}
        rows = gather_dequant(inner, jnp.maximum(r, 0))
        return jnp.where((r >= 0)[:, None], rows, 0.0)
    if "q4" in qt:  # int4: gather PACKED rows, unpack in registers
        from torchrec_tpu.sparse.tensor_types import unpack_int4

        packed = jnp.take(qt["q4"], ids, axis=0, mode="clip")
        rows = unpack_int4(packed).astype(jnp.float32)
        s = jnp.take(qt["scale"], ids, mode="clip")
        z = jnp.take(qt["zero"], ids, mode="clip")
        return rows * s[:, None] + z[:, None]
    if "q2" in qt:  # int2: gather PACKED rows, unpack in registers
        from torchrec_tpu.sparse.tensor_types import unpack_int2

        packed = jnp.take(qt["q2"], ids, axis=0, mode="clip")
        rows = unpack_int2(packed).astype(jnp.float32)
        s = jnp.take(qt["scale"], ids, mode="clip")
        z = jnp.take(qt["zero"], ids, mode="clip")
        return rows * s[:, None] + z[:, None]
    rows = jnp.take(qt["q"], ids, axis=0, mode="clip").astype(jnp.float32)
    if qt["q"].dtype == jnp.int8:
        s = jnp.take(qt["scale"], ids, mode="clip")
        z = jnp.take(qt["zero"], ids, mode="clip")
        rows = rows * s[:, None] + z[:, None]
    return rows


def dequantize_table(qt: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    if "q4" in qt:
        from torchrec_tpu.sparse.tensor_types import unpack_int4

        vals = unpack_int4(qt["q4"]).astype(jnp.float32)
        return vals * qt["scale"][:, None] + qt["zero"][:, None]
    if "q2" in qt:
        from torchrec_tpu.sparse.tensor_types import unpack_int2

        vals = unpack_int2(qt["q2"]).astype(jnp.float32)
        return vals * qt["scale"][:, None] + qt["zero"][:, None]
    q = qt["q"]
    if q.dtype == jnp.int8:
        return q.astype(jnp.float32) * qt["scale"][:, None] + qt["zero"][:, None]
    return q.astype(jnp.float32)


class QuantEmbeddingBagCollection:
    """Inference EBC over quantized group blobs: forward(KJT) -> KeyedTensor.

    Build from a trained EmbeddingBagCollection with :meth:`quantize_from`
    (the reference's ``QuantEmbeddingBagCollection.from_float`` path used by
    quantize_inference_model, inference/modules.py:372).
    """

    def __init__(
        self,
        ebc: EmbeddingBagCollection,
        data_type: DataType = DataType.INT8,
    ):
        self._ebc = ebc
        self._data_type = data_type

    @property
    def unquantized(self) -> EmbeddingBagCollection:
        return self._ebc

    @property
    def data_type(self) -> DataType:
        return self._data_type

    def feature_names(self) -> List[str]:
        return self._ebc.feature_names()

    def embedding_bag_configs(self) -> List[EmbeddingBagConfig]:
        return self._ebc.embedding_bag_configs()

    def quantize_from(
        self, params: Dict[str, jnp.ndarray], pruning=None
    ) -> QuantParams:
        """Trained fp params -> quantized params (logical rows only — the
        write-kernel scratch tail carries no weights). ``pruning``:
        {table: keep-mask | kept-row indices} drops rows from the stored
        blob (reference set_pruning_data + pruned-TBE remapping); pruned
        ids look up as zero rows."""
        return _quantize_groups(
            self._ebc.groups, params, self._data_type, pruning
        )

    def apply(self, qparams: QuantParams, kjt: KeyedJaggedTensor) -> KeyedTensor:
        ebc = self._ebc
        kjt, b, f, seg, slot_feature, slot_batch = ebc._prep(kjt)
        values = kjt.values()
        weights = kjt.weights() if ebc.is_weighted() else None
        lengths = kjt.lengths()
        per_feature = [None] * f
        for gi, g in enumerate(ebc.groups):
            n_gf = len(ebc._group_features[gi])
            if n_gf == 0:
                continue
            ids_g, seg_g, _, n_gf = ebc._group_indices(
                gi, values, seg, slot_feature, slot_batch, b
            )
            rows = gather_dequant(qparams[g.key], ids_g)
            if weights is not None:
                rows = rows * weights[:, None]
            pooled = jax.ops.segment_sum(
                rows, seg_g, num_segments=n_gf * b
            ).reshape(n_gf, b, g.dim)
            for local, fi in enumerate(ebc._group_features[gi]):
                out = pooled[local]
                if (
                    ebc._poolings[fi] == PoolingType.MEAN
                    and not ebc.is_weighted()
                ):
                    denom = jnp.maximum(lengths[fi].astype(out.dtype), 1.0)
                    out = out / denom[:, None]
                per_feature[fi] = out
        if kjt.variable_stride_per_key():
            # VBE: expand each key's deduplicated pooled rows to the global
            # batch via its inverse indices — same as the fp EBC forward
            inv = kjt.inverse_indices()
            per_feature = [
                jnp.take(per_feature[fi], inv[fi], axis=0) for fi in range(f)
            ]
        vals = jnp.concatenate(per_feature, axis=1)
        return KeyedTensor(
            keys=ebc.feature_names(),
            length_per_key=ebc.embedding_dims(),
            values=vals,
        )


class QuantEmbeddingCollection:
    """Sequence (unpooled) quantized inference: ``apply(qparams, KJT) ->
    Dict[str, JaggedTensor]`` of dequantized per-id rows.

    Reference: QuantEmbeddingCollection (quant/embedding_modules.py:739) —
    the unpooled half of quantized serving the pooled module can't cover
    (retrieval towers, sequence models).
    """

    def __init__(
        self,
        ec: EmbeddingCollection,
        data_type: DataType = DataType.INT8,
    ):
        self._ec = ec
        self._data_type = data_type

    @property
    def unquantized(self) -> EmbeddingCollection:
        return self._ec

    @property
    def data_type(self) -> DataType:
        return self._data_type

    def feature_names(self) -> List[str]:
        return self._ec.feature_names()

    def embedding_configs(self):
        return self._ec.embedding_configs()

    def quantize_from(
        self, params: Dict[str, jnp.ndarray], pruning=None
    ) -> QuantParams:
        """Trained fp params -> quantized params (keeps scratch tails out:
        quantization covers logical rows only). ``pruning`` as in
        QuantEmbeddingBagCollection.quantize_from."""
        return _quantize_groups(
            self._ec.groups, params, self._data_type, pruning
        )

    def apply(
        self, qparams: QuantParams, kjt: KeyedJaggedTensor
    ) -> Dict[str, JaggedTensor]:
        ec = self._ec
        kjt, b, f, _, _, _ = ec._prep(kjt)
        kjt_mat = kjt.materialize()
        offsets_pk = kjt_mat.offset_per_key()
        lengths = kjt_mat.lengths()
        seg = kjt_mat.segment_ids()
        slot_feature = jnp.minimum(seg // b, f)
        slot_batch = seg % jnp.int32(b)
        out: Dict[str, JaggedTensor] = {}
        for gi, g in enumerate(ec.groups):
            if not ec._group_features[gi]:
                continue
            ids_g, _seg_g, in_group, _n = ec._group_indices(
                gi, kjt_mat.values(), seg, slot_feature, slot_batch, b
            )
            rows = gather_dequant(qparams[g.key], ids_g)
            valid = in_group & kjt_mat.valid_mask()
            rows = jnp.where(valid[:, None], rows, 0.0)
            for fi in ec._group_features[gi]:
                start = offsets_pk[fi]
                w = kjt_mat.weights_or_none()
                out[ec._feature_names[fi]] = JaggedTensor(
                    values=_roll_rows(rows, start),
                    lengths=lengths[fi],
                    weights=_roll_rows(w, start) if w is not None else None,
                )
        return out


class QuantManagedCollisionEmbeddingCollection:
    """Managed-collision remap (frozen, inference mode) + quantized
    sequence lookup.

    Reference: QuantManagedCollisionEmbeddingCollection
    (quant/embedding_modules.py:1054) — serve a trained MC-EC: raw ids are
    remapped through the TRAINED collision state (no updates, no eviction)
    and looked up in the quantized bounded table.
    """

    def __init__(self, qec: QuantEmbeddingCollection, mcc):
        self._qec = qec
        self._mcc = mcc

    @property
    def quant_embedding_collection(self) -> QuantEmbeddingCollection:
        return self._qec

    def apply(
        self, qparams: QuantParams, mc_states, kjt: KeyedJaggedTensor
    ) -> Dict[str, JaggedTensor]:
        remapped, _ = self._mcc.forward(mc_states, kjt, train=False)
        return self._qec.apply(qparams, remapped)


class QuantManagedCollisionEmbeddingBagCollection:
    """Pooled form of the MC + quant composition (reference
    quant/embedding_modules.py:1207)."""

    def __init__(self, qebc: QuantEmbeddingBagCollection, mcc):
        self._qebc = qebc
        self._mcc = mcc

    @property
    def quant_embedding_bag_collection(self) -> QuantEmbeddingBagCollection:
        return self._qebc

    def apply(
        self, qparams: QuantParams, mc_states, kjt: KeyedJaggedTensor
    ) -> KeyedTensor:
        remapped, _ = self._mcc.forward(mc_states, kjt, train=False)
        return self._qebc.apply(qparams, remapped)
