"""Inference conversion + serving-side predictor.

Capability parity with torchrec/inference/modules.py
(quantize_inference_model:372, shard_quant_model:490, PredictModule:266,
PredictFactory:189).

TPU-native: conversion swaps the DLRM's EBC for a QuantEmbeddingBagCollection
and AOT-compiles a jitted predictor; "sharding" for single-host multi-device
serving = batch-sharded pjit over a mesh (each chip holds the full quantized
tables — the reference's TW default also replicates small quant models; true
TW quant serving reuses the training sharding layer).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.models.dlrm import DLRM
from torchrec_tpu.quant.embedding_modules import QuantEmbeddingBagCollection
from torchrec_tpu.sparse import KeyedJaggedTensor
from torchrec_tpu.types import DataType

__all__ = ["QuantPredictor", "quantize_inference_model", "shard_quant_model"]


@dataclasses.dataclass
class QuantPredictor:
    """AOT-compilable prediction module (PredictModule analog)."""

    model: DLRM
    quant_ebc: QuantEmbeddingBagCollection
    qparams: Dict[str, Any]
    dense_params: Dict[str, Any]

    def apply(
        self, dense_features: jnp.ndarray, sparse_features: KeyedJaggedTensor
    ) -> jnp.ndarray:
        """[B] CTR probabilities."""
        kt = self.quant_ebc.apply(self.qparams, sparse_features)
        logits = self.model.forward_dense(
            self.dense_params, dense_features, kt.values()
        )
        return jax.nn.sigmoid(logits)

    def jitted(self) -> Callable:
        qparams, dense = self.qparams, self.dense_params

        @jax.jit
        def predict(dense_features, sparse_features):
            kt = self.quant_ebc.apply(qparams, sparse_features)
            logits = self.model.forward_dense(
                dense, dense_features, kt.values()
            )
            return jax.nn.sigmoid(logits)

        return predict

    def compile_aot(self, example_dense, example_kjt):
        """AOT-lower + compile (the torch.package / TorchScript analog: a
        serialized executable independent of tracing)."""
        return self.jitted().lower(example_dense, example_kjt).compile()


def quantize_inference_model(
    model: DLRM,
    sparse_params: Dict[str, jnp.ndarray],
    dense_params: Dict[str, Any],
    data_type: DataType = DataType.INT8,
    pruning: Optional[Dict[str, Any]] = None,
) -> QuantPredictor:
    """Trained DLRM -> quantized predictor (reference inference/modules.py:372:
    quant EBC conversion; dense stays fp32/bf16). ``pruning``:
    {table: keep-mask | kept-row indices} drops rows at quantization
    (reference set_pruning_data:353 + pruned-TBE remapping); build masks
    with quant.prune_rows_by_norm."""
    qebc = QuantEmbeddingBagCollection(
        model.embedding_bag_collection, data_type
    )
    return QuantPredictor(
        model=model,
        quant_ebc=qebc,
        qparams=qebc.quantize_from(sparse_params, pruning=pruning),
        dense_params=dense_params,
    )


def shard_quant_model(
    predictor: QuantPredictor,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Tuple[QuantPredictor, Callable]:
    """Place the predictor for single-host multi-device serving: params
    replicated, request batch sharded over the devices
    (reference shard_quant_model:490 + KJTOneToAll/EmbeddingsAllToOne)."""
    devices = list(devices if devices is not None else jax.devices())
    mesh = jax.sharding.Mesh(np.array(devices), ("serve",))
    P = jax.sharding.PartitionSpec
    repl = jax.sharding.NamedSharding(mesh, P())
    batch_sh = jax.sharding.NamedSharding(mesh, P("serve"))
    predictor = dataclasses.replace(
        predictor,
        qparams=jax.device_put(predictor.qparams, repl),
        dense_params=jax.device_put(predictor.dense_params, repl),
    )

    jit_fn = predictor.jitted()

    def serve(dense_features, sparse_features):
        dense_features = jax.device_put(dense_features, batch_sh)
        # KJT buffers replicate; lengths drive per-example routing
        sparse_features = jax.device_put(sparse_features, repl)
        return jit_fn(dense_features, sparse_features)

    return predictor, serve
