"""Perceptron / MLP dense blocks.

Capability parity with torchrec/modules/mlp.py (Perceptron:18, MLP:83).
Functional: ``init(key) -> params`` / ``apply(params, x)``. bf16-friendly:
matmuls run in the input dtype with fp32 accumulation (MXU-native).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = ["Perceptron", "MLP"]

Params = Dict[str, jnp.ndarray]


def _he_uniform(key, shape, dtype, fan_in):
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


@dataclasses.dataclass(frozen=True)
class Perceptron:
    """One dense layer + activation (reference mlp.py:18)."""

    in_size: int
    out_size: int
    bias: bool = True
    activation: Callable[[jnp.ndarray], jnp.ndarray] = jax.nn.relu

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        kw, kb = jax.random.split(key)
        p = {"w": _he_uniform(kw, (self.in_size, self.out_size), dtype, self.in_size)}
        if self.bias:
            p["b"] = _he_uniform(kb, (self.out_size,), dtype, self.in_size)
        return p

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        y = jnp.dot(x, params["w"], preferred_element_type=jnp.float32)
        if self.bias:
            y = y + params["b"].astype(jnp.float32)
        return self.activation(y).astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class MLP:
    """Stack of Perceptrons (reference mlp.py:83)."""

    in_size: int
    layer_sizes: Sequence[int]
    bias: bool = True
    activation: Callable[[jnp.ndarray], jnp.ndarray] = jax.nn.relu
    final_activation: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None

    def _layers(self):
        sizes = [self.in_size] + list(self.layer_sizes)
        layers = []
        for i in range(len(self.layer_sizes)):
            act = self.activation
            if i == len(self.layer_sizes) - 1 and self.final_activation is not None:
                act = self.final_activation
            layers.append(
                Perceptron(sizes[i], sizes[i + 1], bias=self.bias, activation=act)
            )
        return layers

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        params: Params = {}
        for i, layer in enumerate(self._layers()):
            sub = jax.random.fold_in(key, i)
            for k, v in layer.init(sub, dtype).items():
                params[f"layer_{i}/{k}"] = v
        return params

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        for i, layer in enumerate(self._layers()):
            sub = {
                k.split("/", 1)[1]: v
                for k, v in params.items()
                if k.startswith(f"layer_{i}/")
            }
            x = layer.apply(sub, x)
        return x
