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
    "VirtualTableEvictionPolicy",
    "NoEvictionPolicy",
    "CountBasedEvictionPolicy",
    "TimestampBasedEvictionPolicy",
    "CountTimestampMixedEvictionPolicy",
    "FeatureL2NormBasedEvictionPolicy",
    "FeatureScoreBasedEvictionPolicy",
]


# --------------------------------------------------------------------------
# Virtual-table eviction policies (reference embedding_configs.py:181-359).
# The reference packs eviction metadata into a 16-byte per-row header inside
# the FBGEMM KV tensor; here the metadata lives as explicit host-side arrays
# beside the cache (modules/virtual_table_eviction.py), so the configs carry
# only the fields that drive eviction decisions.


@dataclasses.dataclass
class VirtualTableEvictionPolicy:
    """Base eviction policy for virtual (unbounded-id) tables.

    ``training_id_eviction_trigger_count``: rows-in-use level that arms
    eviction (0 = always armed)."""

    training_id_eviction_trigger_count: int = 0


@dataclasses.dataclass
class NoEvictionPolicy(VirtualTableEvictionPolicy):
    """Rows are never policy-evicted (capacity pressure may still spill)."""


@dataclasses.dataclass
class CountBasedEvictionPolicy(VirtualTableEvictionPolicy):
    """Evict rows whose decayed access count falls below the threshold
    (reference CountBasedEvictionPolicy, embedding_configs.py:209)."""

    eviction_threshold: int = 15  # 0 = no eviction
    decay_rate: float = 0.99  # applied per eviction round
    inference_eviction_threshold: Optional[int] = None

    def __post_init__(self):
        if self.inference_eviction_threshold is None:
            self.inference_eviction_threshold = self.eviction_threshold


@dataclasses.dataclass
class TimestampBasedEvictionPolicy(VirtualTableEvictionPolicy):
    """Evict rows unseen for ``eviction_ttl_mins`` (reference
    TimestampBasedEvictionPolicy, embedding_configs.py:283)."""

    eviction_ttl_mins: int = 24 * 60  # 0 = no eviction
    inference_eviction_ttl_mins: Optional[int] = None
    max_inference_id_num_per_rank: int = 0  # 0 = TTL only, no hard cap

    def __post_init__(self):
        if self.inference_eviction_ttl_mins is None:
            self.inference_eviction_ttl_mins = self.eviction_ttl_mins


@dataclasses.dataclass
class CountTimestampMixedEvictionPolicy(VirtualTableEvictionPolicy):
    """Evict rows failing EITHER the count or the TTL test (reference
    CountTimestampMixedEvictionPolicy, embedding_configs.py:305)."""

    eviction_threshold: int = 15  # 0 = count test disabled
    decay_rate: float = 0.99
    eviction_ttl_mins: int = 24 * 60  # 0 = TTL test disabled
    inference_eviction_threshold: Optional[int] = None
    inference_eviction_ttl_mins: Optional[int] = None

    def __post_init__(self):
        if self.inference_eviction_threshold is None:
            self.inference_eviction_threshold = self.eviction_threshold
        if self.inference_eviction_ttl_mins is None:
            self.inference_eviction_ttl_mins = self.eviction_ttl_mins


@dataclasses.dataclass
class FeatureL2NormBasedEvictionPolicy(VirtualTableEvictionPolicy):
    """Evict rows whose embedding L2 norm falls below the threshold
    (reference FeatureL2NormBasedEvictionPolicy, embedding_configs.py:335)."""

    eviction_threshold: float = 0.0  # 0.0 = no eviction
    inference_eviction_threshold: Optional[float] = None

    def __post_init__(self):
        if self.inference_eviction_threshold is None:
            self.inference_eviction_threshold = self.eviction_threshold


@dataclasses.dataclass
class FeatureScoreBasedEvictionPolicy(VirtualTableEvictionPolicy):
    """Keep the top-``training_id_keep_count`` rows by decayed feature
    score; optional TTL override (reference FeatureScoreBasedEvictionPolicy,
    embedding_configs.py:232)."""

    decay_rate: float = 0.99
    training_id_keep_count: int = 0  # 0 = no score-based cap
    eviction_ttl_mins: int = 0  # if set, TTL applies instead of score
    feature_score_mapping: Optional[Dict[str, float]] = None
    feature_score_default_value: float = 1.0
    enable_eviction: bool = True

    def __post_init__(self):
        if self.feature_score_mapping is None:
            self.feature_score_mapping = {}


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
    virtual_table_eviction_policy: Optional["VirtualTableEvictionPolicy"] = None

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
