"""KeyedOptimizer / CombinedOptimizer: FQN-keyed optimizer state.

Capability parity with torchrec/optim/keyed.py (KeyedOptimizer:34,
CombinedOptimizer:317): optimizer state addressable by parameter FQN for
checkpoint interop, and composition of per-module fused optimizers with a
dense optimizer under prefixed keys.

TPU-native: wraps optax transforms + the fused EmbeddingOptimizers; state
is an explicit pytree, ``state_dict``/``load_state_dict`` expose FQN-keyed
views.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["KeyedOptimizer", "CombinedOptimizer", "OptimizerWrapper"]


def _flatten_fqn(tree: Any, prefix: str = "") -> Dict[str, jnp.ndarray]:
    out: Dict[str, jnp.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_fqn(v, f"{prefix}{k}." if prefix or k else k))
        return out
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in leaves:
        key = prefix + "/".join(str(p) for p in path) if path else prefix.rstrip(".")
        out[key or "value"] = leaf
    return out


class KeyedOptimizer:
    """One optax transform over an FQN-keyed param dict.

    ``state_dict()`` returns {param_fqn-ish keys: state arrays} so
    checkpoints align with model FQNs (reference keyed.py:34 semantics).
    """

    def __init__(
        self,
        tx: optax.GradientTransformation,
        params: Dict[str, Any],
    ):
        self._tx = tx
        self._state = tx.init(params)
        self._param_keys = list(params)

    @property
    def state(self):
        return self._state

    def step(
        self, params: Dict[str, Any], grads: Dict[str, Any]
    ) -> Dict[str, Any]:
        updates, self._state = self._tx.update(grads, self._state, params)
        return optax.apply_updates(params, updates)

    def state_dict(self) -> Dict[str, jnp.ndarray]:
        return _flatten_fqn({"state": self._state})

    def load_state_dict(self, sd: Dict[str, jnp.ndarray]) -> None:
        flat_now = self.state_dict()
        if set(sd) != set(flat_now):
            missing = set(flat_now) - set(sd)
            extra = set(sd) - set(flat_now)
            raise KeyError(
                f"state_dict mismatch: missing={sorted(missing)[:5]} "
                f"extra={sorted(extra)[:5]}"
            )
        leaves, treedef = jax.tree_util.tree_flatten(self._state)
        # rebuild in the same flatten order
        ordered = [sd[k] for k in self.state_dict()]
        self._state = jax.tree_util.tree_unflatten(treedef, ordered)


class CombinedOptimizer:
    """Merge named sub-optimizers under prefixed FQNs
    (reference keyed.py:317)."""

    def __init__(self, optims: Sequence[Tuple[str, Any]]):
        self._optims = list(optims)

    @property
    def optimizers(self) -> List[Tuple[str, Any]]:
        return list(self._optims)

    def state_dict(self) -> Dict[str, jnp.ndarray]:
        out: Dict[str, jnp.ndarray] = {}
        for prefix, opt in self._optims:
            sub = (
                opt.state_dict()
                if hasattr(opt, "state_dict")
                else _flatten_fqn(opt)
            )
            for k, v in sub.items():
                out[f"{prefix}.{k}" if prefix else k] = v
        return out


class OptimizerWrapper:
    """Base for optimizers wrapping another (clipping, warmup...)."""

    def __init__(self, inner):
        self._inner = inner

    def __getattr__(self, name):
        return getattr(self._inner, name)
