"""DLRM predict module / factory / packager for serving.

Reference parity: torchrec/inference/dlrm_predict.py:52 (DLRMModelConfig),
:67 (DLRMPredictModule — batch-dict in, {"default": probabilities} out),
:145 (DLRMPredictFactory — build + quantize + shard + script) and
torchrec/inference/dlrm_packager.py:74 (CLI that serializes the factory).

TPU-native form: the predict module is a pure function over a flat batch
dict (the serving wire format: "float_features",
"id_list_features.values", "id_list_features.lengths"); the factory
quantizes with QuantEmbeddingBagCollection and packages via StableHLO
export (ir.save_predict_package) instead of fx-trace + TorchScript.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.models import DLRM
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.sparse import KeyedJaggedTensor
from torchrec_tpu.types import DataType

__all__ = [
    "DLRMModelConfig",
    "DLRMPredictModule",
    "DLRMPredictFactory",
    "package_dlrm_model",
]


@dataclasses.dataclass
class DLRMModelConfig:
    """Model config (reference dlrm_predict.py:52). ``num_embeddings``
    overrides per-feature sizes when set (the reference's semantics)."""

    dense_arch_layer_sizes: List[int]
    dense_in_features: int
    embedding_dim: int
    id_list_features_keys: List[str]
    num_embeddings_per_feature: List[int]
    over_arch_layer_sizes: List[int]
    num_embeddings: Optional[int] = None
    sample_batch_size: int = 8
    sample_pooling: int = 4


class DLRMPredictModule:
    """DLRM wrapped for serving (reference dlrm_predict.py:67): consumes
    the wire-format batch dict and returns ``{"default": [B] probs}``."""

    def __init__(
        self,
        embedding_bag_collection: EmbeddingBagCollection,
        dense_in_features: int,
        dense_arch_layer_sizes: Sequence[int],
        over_arch_layer_sizes: Sequence[int],
        id_list_features_keys: Sequence[str],
    ):
        self.model = DLRM(
            embedding_bag_collection=embedding_bag_collection,
            dense_in_features=dense_in_features,
            dense_arch_layer_sizes=tuple(dense_arch_layer_sizes),
            over_arch_layer_sizes=tuple(over_arch_layer_sizes),
        )
        self.id_list_features_keys = list(id_list_features_keys)

    def init(self, key: jax.Array):
        return self.model.init(key)

    def _kjt(self, batch: Dict[str, jnp.ndarray]) -> KeyedJaggedTensor:
        lengths = jnp.asarray(batch["id_list_features.lengths"])
        if lengths.ndim == 1:  # wire format ships the flat [F*B] form
            lengths = lengths.reshape(len(self.id_list_features_keys), -1)
        return KeyedJaggedTensor(
            keys=self.id_list_features_keys,
            values=jnp.asarray(batch["id_list_features.values"]),
            lengths=lengths,
        )

    def predict_forward(
        self, params, batch: Dict[str, jnp.ndarray]
    ) -> Dict[str, jnp.ndarray]:
        logits = self.model.apply(
            params, jnp.asarray(batch["float_features"]), self._kjt(batch)
        )
        return {"default": jax.nn.sigmoid(logits).reshape(-1)}


class DLRMPredictFactory:
    """Build a servable, quantized DLRM predict callable from a config
    (reference dlrm_predict.py:145). ``create_predict_module`` returns
    ``(predict, module)``: ``predict(batch_dict) -> {"default": probs}``
    jitted with int8 (by default) embedding tables; pass trained params to
    serve real weights, omit for randomly-initialized smoke serving."""

    def __init__(self, model_config: DLRMModelConfig):
        self.model_config = model_config

    def _tables(self) -> List[EmbeddingBagConfig]:
        mc = self.model_config
        return [
            EmbeddingBagConfig(
                name=f"t_{name}",
                embedding_dim=mc.embedding_dim,
                num_embeddings=(
                    mc.num_embeddings_per_feature[i]
                    if mc.num_embeddings is None
                    else mc.num_embeddings
                ),
                feature_names=[name],
            )
            for i, name in enumerate(mc.id_list_features_keys)
        ]

    def create_predict_module(
        self,
        params=None,
        data_type: DataType = DataType.INT8,
        key: Optional[jax.Array] = None,
    ):
        from torchrec_tpu.inference.modules import quantize_inference_model

        mc = self.model_config
        module = DLRMPredictModule(
            embedding_bag_collection=EmbeddingBagCollection(self._tables()),
            dense_in_features=mc.dense_in_features,
            dense_arch_layer_sizes=mc.dense_arch_layer_sizes,
            over_arch_layer_sizes=mc.over_arch_layer_sizes,
            id_list_features_keys=mc.id_list_features_keys,
        )
        if params is None:
            params = module.init(
                key if key is not None else jax.random.key(0)
            )
        predictor = quantize_inference_model(
            module.model, params["sparse"],
            {k: v for k, v in params.items() if k != "sparse"},
            data_type=data_type,
        )

        @jax.jit
        def predict(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
            probs = predictor.apply(
                jnp.asarray(batch["float_features"]), module._kjt(batch)
            )
            return {"default": probs.reshape(-1)}

        return predict, module

    def batching_metadata(self) -> Dict[str, str]:
        """Feature -> combiner type for the serving batcher (reference
        :219; consumed by cpp/inference/serving.cc's request combiner)."""
        return {"float_features": "dense", "id_list_features": "sparse"}

    def result_metadata(self) -> str:
        return "dict_of_tensor"

    def run_weights_independent_tranformations(self, predict_module):
        """Weights-independent graph transforms (reference :227). XLA owns
        fusion/layout on TPU — identity by design."""
        return predict_module

    def model_inputs_data(self) -> Dict[str, np.ndarray]:
        """Deterministic warmup batch in wire format (reference
        model_inputs_data; used to pre-trigger the jit compile)."""
        mc = self.model_config
        b, p = mc.sample_batch_size, mc.sample_pooling
        f = len(mc.id_list_features_keys)
        rng = np.random.default_rng(0)
        sizes = [
            mc.num_embeddings_per_feature[i]
            if mc.num_embeddings is None else mc.num_embeddings
            for i in range(f)
        ]
        values = np.concatenate(
            [rng.integers(0, sizes[i], b * p) for i in range(f)]
        ).astype(np.int32)
        return {
            "float_features": rng.normal(size=(b, mc.dense_in_features))
            .astype(np.float32),
            "id_list_features.values": values,
            "id_list_features.lengths": np.full((f * b,), p, np.int32),
        }


def package_dlrm_model(
    factory: DLRMPredictFactory,
    params,
    path: str,
    data_type: DataType = DataType.INT8,
) -> None:
    """Serialize a servable DLRM to ``path`` (reference dlrm_packager.py:74:
    the CLI that torch.packages a factory): StableHLO predict graph with
    quantized params baked, plus table configs — loadable with
    ``ir.load_predict_package`` in a fresh process with no model code."""
    from torchrec_tpu.inference.modules import quantize_inference_model
    from torchrec_tpu.ir import save_predict_package

    mc = factory.model_config
    module = DLRMPredictModule(
        embedding_bag_collection=EmbeddingBagCollection(factory._tables()),
        dense_in_features=mc.dense_in_features,
        dense_arch_layer_sizes=mc.dense_arch_layer_sizes,
        over_arch_layer_sizes=mc.over_arch_layer_sizes,
        id_list_features_keys=mc.id_list_features_keys,
    )
    predictor = quantize_inference_model(
        module.model, params["sparse"],
        {k: v for k, v in params.items() if k != "sparse"},
        data_type=data_type,
    )
    sample = factory.model_inputs_data()
    pk = {
        "qparams": predictor.qparams,
        "dense": predictor.dense_params,
    }

    def fn(p, dense, values, lengths):
        import dataclasses as _dc

        pred = _dc.replace(
            predictor, qparams=p["qparams"], dense_params=p["dense"]
        )
        return pred.apply(
            dense,
            module._kjt(
                {
                    "id_list_features.values": values,
                    "id_list_features.lengths": lengths,
                }
            ),
        )

    save_predict_package(
        path,
        fn,
        pk,
        (
            jnp.asarray(sample["float_features"]),
            jnp.asarray(sample["id_list_features.values"]),
            jnp.asarray(sample["id_list_features.lengths"]),
        ),
        configs=factory._tables(),
    )
