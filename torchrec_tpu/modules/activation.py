"""Activation modules.

Capability parity with torchrec/modules/activation.py (SwishLayerNorm:20).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Union

import jax
import jax.numpy as jnp

__all__ = ["SwishLayerNorm"]

Params = Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class SwishLayerNorm:
    """x * sigmoid(layernorm(x)) (reference activation.py:20)."""

    norm_shape: Union[int, Sequence[int]]
    eps: float = 1e-5

    def _shape(self):
        if isinstance(self.norm_shape, int):
            return (self.norm_shape,)
        return tuple(self.norm_shape)

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        shape = self._shape()
        return {"scale": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        axes = tuple(range(x.ndim - len(self._shape()), x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        normed = (x - mean) * jax.lax.rsqrt(var + self.eps)
        normed = normed * params["scale"] + params["bias"]
        return x * jax.nn.sigmoid(normed)
