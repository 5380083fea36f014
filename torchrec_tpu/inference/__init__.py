from torchrec_tpu.inference.modules import (
    QuantPredictor,
    quantize_inference_model,
    shard_quant_model,
)

__all__ = [
    "QuantPredictor",
    "quantize_inference_model",
    "shard_quant_model",
]
