"""Inference conversion, sharded serving, and transports (reference torchrec/inference/__init__.py)."""
from torchrec_tpu.inference.dlrm_predict import (
    DLRMModelConfig,
    DLRMPredictFactory,
    DLRMPredictModule,
    package_dlrm_model,
)
from torchrec_tpu.inference.modules import (
    QuantPredictor,
    quantize_inference_model,
    shard_quant_model,
)
from torchrec_tpu.inference.sharded_quant import (
    ShardedQuantEmbeddingBagCollection,
    ShardedQuantEmbeddingCollection,
)

__all__ = [
    "DLRMModelConfig",
    "DLRMPredictFactory",
    "DLRMPredictModule",
    "package_dlrm_model",
    "QuantPredictor",
    "quantize_inference_model",
    "shard_quant_model",
    "ShardedQuantEmbeddingBagCollection",
    "ShardedQuantEmbeddingCollection",
    "PredictorServer",
    "PredictorClient",
]


def __getattr__(name):
    # grpc transport imports lazily: it shells out to protoc on first use.
    if name in ("PredictorServer", "PredictorClient"):
        from torchrec_tpu.inference import grpc_server

        return getattr(grpc_server, name)
    raise AttributeError(name)
