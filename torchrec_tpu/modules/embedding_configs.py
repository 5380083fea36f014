"""Embedding table configuration.

Capability parity with torchrec/modules/embedding_configs.py
(BaseEmbeddingConfig:361, EmbeddingBagConfig:445, EmbeddingConfig:458,
PoolingType:33, dim/feature accessors). JAX-native: init functions take a
PRNG key; dtypes are jnp.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from torchrec_tpu.types import DataType, PoolingType

__all__ = [
    "BaseEmbeddingConfig",
    "EmbeddingBagConfig",
    "EmbeddingConfig",
    "pooling_type_to_str",
]


def _default_init(key: jax.Array, shape, dtype) -> jnp.ndarray:
    """uniform(-sqrt(1/rows), sqrt(1/rows)) — the reference's default table
    init (embedding_configs.py weight_init bounds)."""
    rows = shape[0]
    bound = math.sqrt(1.0 / rows)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-bound, maxval=bound)


@dataclasses.dataclass
class BaseEmbeddingConfig:
    """Shared table config (reference embedding_configs.py:361)."""

    num_embeddings: int
    embedding_dim: int
    name: str = ""
    data_type: DataType = DataType.FP32
    feature_names: List[str] = dataclasses.field(default_factory=list)
    weight_init_max: Optional[float] = None
    weight_init_min: Optional[float] = None
    init_fn: Optional[Callable[[jax.Array, tuple, jnp.dtype], jnp.ndarray]] = None
    # virtual-table / managed-collision hooks (reference :181-359)
    use_virtual_table: bool = False

    def get_weight_init_fn(self):
        if self.init_fn is not None:
            return self.init_fn
        if self.weight_init_max is not None or self.weight_init_min is not None:
            lo = self.weight_init_min if self.weight_init_min is not None else 0.0
            hi = self.weight_init_max if self.weight_init_max is not None else 1.0

            def _init(key, shape, dtype):
                return jax.random.uniform(key, shape, dtype, minval=lo, maxval=hi)

            return _init
        return _default_init

    def num_features(self) -> int:
        return len(self.feature_names)

    def __post_init__(self):
        if not self.feature_names:
            self.feature_names = [self.name]


@dataclasses.dataclass
class EmbeddingBagConfig(BaseEmbeddingConfig):
    """Pooled-table config (reference embedding_configs.py:445)."""

    pooling: PoolingType = PoolingType.SUM


@dataclasses.dataclass
class EmbeddingConfig(BaseEmbeddingConfig):
    """Unpooled (sequence) table config (reference embedding_configs.py:458)."""


def pooling_type_to_str(p: PoolingType) -> str:
    return p.value.lower()
