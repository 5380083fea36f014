"""Cross networks (DCN / DCN-v2 family).

Capability parity with torchrec/modules/crossnet.py (CrossNet:21 full-rank
DCN-v2, LowRankCrossNet:~100, VectorCrossNet:~170 original DCN,
LowRankMixtureCrossNet:265 DCN-v2 mixture-of-experts).

All layers compute x_{l+1} = x_0 * f_l(x_l) + x_l with MXU matmuls and fp32
accumulation.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict

import jax
import jax.numpy as jnp

__all__ = [
    "CrossNet",
    "LowRankCrossNet",
    "VectorCrossNet",
    "LowRankMixtureCrossNet",
]

Params = Dict[str, jnp.ndarray]


def _glorot(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


@dataclasses.dataclass(frozen=True)
class CrossNet:
    """Full-rank DCN-v2: x_{l+1} = x0 * (W_l x_l + b_l) + x_l
    (reference crossnet.py:21)."""

    in_features: int
    num_layers: int

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        p: Params = {}
        for i in range(self.num_layers):
            kw, kb = jax.random.split(jax.random.fold_in(key, i))
            p[f"w_{i}"] = _glorot(kw, (self.in_features, self.in_features), dtype)
            p[f"b_{i}"] = jnp.zeros((self.in_features,), dtype)
        return p

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        x0 = x
        for i in range(self.num_layers):
            xw = jnp.dot(x, params[f"w_{i}"], preferred_element_type=jnp.float32)
            x = (x0 * (xw + params[f"b_{i}"]) + x).astype(x.dtype)
        return x


@dataclasses.dataclass(frozen=True)
class LowRankCrossNet:
    """DCN-v2 with W = U V (rank r) for O(2Nr) params
    (reference crossnet.py low-rank variant)."""

    in_features: int
    num_layers: int
    low_rank: int = 1

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        p: Params = {}
        for i in range(self.num_layers):
            ku, kv, kb = jax.random.split(jax.random.fold_in(key, i), 3)
            p[f"u_{i}"] = _glorot(ku, (self.in_features, self.low_rank), dtype)
            p[f"v_{i}"] = _glorot(kv, (self.low_rank, self.in_features), dtype)
            p[f"b_{i}"] = jnp.zeros((self.in_features,), dtype)
        return p

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        x0 = x
        for i in range(self.num_layers):
            xw = jnp.dot(
                jnp.dot(x, params[f"u_{i}"], preferred_element_type=jnp.float32),
                params[f"v_{i}"],
                preferred_element_type=jnp.float32,
            )
            x = (x0 * (xw + params[f"b_{i}"]) + x).astype(x.dtype)
        return x


@dataclasses.dataclass(frozen=True)
class VectorCrossNet:
    """Original DCN: x_{l+1} = x0 <x_l, w_l> + b_l + x_l
    (reference crossnet.py VectorCrossNet)."""

    in_features: int
    num_layers: int

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        p: Params = {}
        for i in range(self.num_layers):
            kw, _ = jax.random.split(jax.random.fold_in(key, i))
            p[f"w_{i}"] = _glorot(kw, (self.in_features, 1), dtype)
            p[f"b_{i}"] = jnp.zeros((self.in_features,), dtype)
        return p

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        x0 = x
        for i in range(self.num_layers):
            dot = jnp.dot(x, params[f"w_{i}"], preferred_element_type=jnp.float32)
            x = (x0 * dot + params[f"b_{i}"] + x).astype(x.dtype)
        return x


@dataclasses.dataclass(frozen=True)
class LowRankMixtureCrossNet:
    """DCN-v2 mixture: K low-rank experts gated per example
    (reference crossnet.py:265)."""

    in_features: int
    num_layers: int
    num_experts: int = 1
    low_rank: int = 1

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        p: Params = {}
        for i in range(self.num_layers):
            keys = jax.random.split(jax.random.fold_in(key, i), 4)
            p[f"u_{i}"] = _glorot(
                keys[0], (self.num_experts, self.in_features, self.low_rank), dtype
            )
            p[f"c_{i}"] = _glorot(
                keys[1], (self.num_experts, self.low_rank, self.low_rank), dtype
            )
            p[f"v_{i}"] = _glorot(
                keys[2], (self.num_experts, self.low_rank, self.in_features), dtype
            )
            p[f"gate_{i}"] = _glorot(keys[3], (self.in_features, self.num_experts), dtype)
            p[f"b_{i}"] = jnp.zeros((self.in_features,), dtype)
        return p

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        x0 = x
        for i in range(self.num_layers):
            # experts: [K, B, N] via einsum batched over experts
            h = jnp.einsum("bn,knr->kbr", x, params[f"u_{i}"])
            h = jnp.tanh(h)
            h = jnp.einsum("kbr,krs->kbs", h, params[f"c_{i}"])
            h = jnp.tanh(h)
            h = jnp.einsum("kbr,krn->kbn", h, params[f"v_{i}"])
            gate = jax.nn.softmax(
                jnp.dot(x, params[f"gate_{i}"], preferred_element_type=jnp.float32),
                axis=-1,
            )  # [B, K]
            expert_mix = jnp.einsum("kbn,bk->bn", h, gate)
            x = (x0 * (expert_mix + params[f"b_{i}"]) + x).astype(x.dtype)
        return x
