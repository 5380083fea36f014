"""Gradient clipping (norm / value) including sharded-global-norm.

Capability parity with torchrec/optim/clipping.py:32
(GradientClippingOptimizer): clip by global norm across ALL params —
including model-parallel shards, whose squared norms must be psum'd across
the shard axis before the norm is taken (the reference iterates
ShardedTensor shards).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

__all__ = ["clip_by_global_norm", "clip_by_value", "sharded_global_norm"]


def sharded_global_norm(
    grads: Any,
    sharded_grads: Any = None,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Global L2 norm over replicated grads + (optionally) sharded grads
    whose squared-norm contributions are psum'd over ``axis_name``."""
    sq = sum(
        jnp.sum(jnp.square(g.astype(jnp.float32)))
        for g in jax.tree_util.tree_leaves(grads)
    )
    if sharded_grads is not None:
        local = sum(
            jnp.sum(jnp.square(g.astype(jnp.float32)))
            for g in jax.tree_util.tree_leaves(sharded_grads)
        )
        if axis_name is not None:
            local = jax.lax.psum(local, axis_name)
        sq = sq + local
    return jnp.sqrt(sq)


def clip_by_global_norm(grads: Any, max_norm: float, norm: jnp.ndarray):
    """Scale grads so the (precomputed, possibly sharded) global norm is at
    most ``max_norm``."""
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree_util.tree_map(lambda g: g * scale.astype(g.dtype), grads)


def clip_by_value(grads: Any, clip_value: float):
    return jax.tree_util.tree_map(
        lambda g: jnp.clip(g, -clip_value, clip_value), grads
    )
