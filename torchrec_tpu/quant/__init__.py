"""Quantized inference modules (reference torchrec/quant/__init__.py)."""
from torchrec_tpu.quant.embedding_modules import (
    QuantEmbeddingBagCollection,
    QuantEmbeddingCollection,
    QuantManagedCollisionEmbeddingBagCollection,
    QuantManagedCollisionEmbeddingCollection,
    dequantize_table,
    prune_rows_by_norm,
    gather_dequant,
    quantize_table,
)

__all__ = [
    "QuantEmbeddingBagCollection",
    "QuantEmbeddingCollection",
    "QuantManagedCollisionEmbeddingBagCollection",
    "QuantManagedCollisionEmbeddingCollection",
    "dequantize_table",
    "prune_rows_by_norm",
    "gather_dequant",
    "quantize_table",
]
