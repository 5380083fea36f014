"""Quantized inference modules (reference torchrec/quant/__init__.py)."""
from torchrec_tpu.quant.embedding_modules import (
    QuantEmbeddingBagCollection,
    dequantize_table,
    quantize_table,
)

__all__ = [
    "QuantEmbeddingBagCollection",
    "dequantize_table",
    "quantize_table",
]
