"""DeepFM blocks: FactorizationMachine + DeepFM dense-over-embeddings.

Capability parity with torchrec/modules/deepfm.py (DeepFM:36,
FactorizationMachine:134).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from torchrec_tpu.modules.mlp import MLP

__all__ = ["FactorizationMachine", "DeepFM"]

Params = Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class FactorizationMachine:
    """Second-order FM over a [B, F, D] stack of per-feature embeddings:
    fm(x) = 0.5 * sum_d((sum_f x_fd)^2 - sum_f x_fd^2)  -> [B, 1]
    (reference deepfm.py:134)."""

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        sum_sq = jnp.square(jnp.sum(x, axis=1))  # [B, D]
        sq_sum = jnp.sum(jnp.square(x), axis=1)  # [B, D]
        return 0.5 * jnp.sum(sum_sq - sq_sum, axis=1, keepdims=True)


@dataclasses.dataclass(frozen=True)
class DeepFM:
    """Deep part of DeepFM: flatten per-feature embeddings -> MLP
    (reference deepfm.py:36)."""

    dense_module_in: int
    hidden_layer_size: int
    deep_fm_dimension: int

    def _mlp(self) -> MLP:
        return MLP(
            in_size=self.dense_module_in,
            layer_sizes=[self.hidden_layer_size, self.deep_fm_dimension],
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        return self._mlp().init(key, dtype)

    def apply(self, params: Params, inputs: Sequence[jnp.ndarray]) -> jnp.ndarray:
        """inputs: list of [B, ...] tensors, flattened and concatenated."""
        flat = [x.reshape(x.shape[0], -1) for x in inputs]
        return self._mlp().apply(params, jnp.concatenate(flat, axis=1))
