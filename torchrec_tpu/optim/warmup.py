"""LR warmup / schedule stages.

Capability parity with torchrec/optim/warmup.py:114 (WarmupOptimizer with
WarmupStage policies: linear / constant / poly / step / inv-sqrt).
Functional: builds a ``step -> lr`` schedule usable both by the fused
embedding optimizers (``lr_schedule`` arg) and optax.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, List, Sequence

import jax.numpy as jnp

__all__ = ["WarmupPolicy", "WarmupStage", "make_warmup_schedule"]


class WarmupPolicy(enum.Enum):
    """LR schedule stage shapes (reference optim/warmup.py:114)."""

    NONE = "none"
    LINEAR = "linear"
    CONSTANT = "constant"
    POLY = "poly"
    STEP = "step"
    INVSQRT = "inv_sqrt"


@dataclasses.dataclass(frozen=True)
class WarmupStage:
    """One LR schedule stage: policy + length + scale (reference optim/warmup.py)."""

    policy: WarmupPolicy = WarmupPolicy.LINEAR
    max_iters: int = 1000
    value: float = 1.0  # multiplier target (meaning depends on policy)
    lr_scale: float = 1.0
    decay_iters: int = -1  # for POLY/INVSQRT; -1 -> max_iters


def _stage_multiplier(stage: WarmupStage, it):
    t = jnp.asarray(it, jnp.float32)
    mi = float(max(stage.max_iters, 1))
    di = float(stage.decay_iters if stage.decay_iters > 0 else mi)
    if stage.policy == WarmupPolicy.LINEAR:
        frac = jnp.clip(t / mi, 0.0, 1.0)
        return (1.0 - frac) * stage.lr_scale + frac * stage.value
    if stage.policy == WarmupPolicy.CONSTANT:
        return jnp.full_like(t, stage.value)
    if stage.policy == WarmupPolicy.POLY:
        return stage.value * jnp.power(jnp.maximum(1.0 - t / di, 0.0), 2.0)
    if stage.policy == WarmupPolicy.STEP:
        return stage.value * jnp.power(stage.lr_scale, jnp.floor(t / mi))
    if stage.policy == WarmupPolicy.INVSQRT:
        return stage.value / jnp.sqrt(jnp.maximum(t, 1.0) / di)
    return jnp.ones_like(t)


def make_warmup_schedule(
    base_lr: float, stages: Sequence[WarmupStage]
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Piecewise schedule: stage boundaries at cumulative max_iters. PAST
    the last boundary the multiplier is 1.0 (lr = base_lr) — the reference
    appends a synthetic NONE stage the same way (warmup.py stage chaining);
    to make a decay stage "extend forever", give it max_iters large enough
    to cover training."""
    bounds: List[int] = []
    acc = 0
    for s in stages:
        acc += s.max_iters
        bounds.append(acc)

    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        start = 0.0
        chosen = jnp.zeros_like(t)
        done = jnp.zeros_like(t, dtype=bool)
        for s, b in zip(stages, bounds):
            local_it = t - start
            in_stage = (~done) & (t < b)
            m = _stage_multiplier(s, local_it)
            chosen = jnp.where(in_stage, m, chosen)
            done = done | in_stage
            start = float(b)
        chosen = jnp.where(done, chosen, 1.0)
        return base_lr * chosen

    return schedule
