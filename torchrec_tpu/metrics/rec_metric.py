"""RecMetric framework: functional streaming metrics.

Capability parity with torchrec/metrics/rec_metric.py (RecMetric:350,
RecMetricComputation:159, WindowBuffer:119) — re-designed functional:

* a metric is (init_state() -> pytree, update(state, preds, labels,
  weights) -> pytree, compute(state) -> {name: scalar});
* states are fixed-shape pytrees, so update runs INSIDE the jitted train
  step (the reference needs a separate GPU->CPU metric path; here XLA fuses
  metric updates into the step for free);
* cross-rank sync = ``jax.lax.psum`` on the state inside shard_map
  (reference: torchmetrics dist_reduce_fx over the process group) — states
  declare their reduction per leaf;
* windowed metrics keep a fixed-size ring buffer of recent examples
  (reference WindowBuffer), so "window" semantics are example-count based.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "RecTaskInfo",
    "RecMetric",
    "MetricUpdate",
    "ring_buffer_init",
    "ring_buffer_push",
]


@dataclasses.dataclass(frozen=True)
class RecTaskInfo:
    """One prediction task (reference metrics_config.py RecTaskInfo)."""

    name: str = "default"
    label_name: str = "label"
    prediction_name: str = "prediction"
    weight_name: str = "weight"


class RecMetric:
    """Base streaming metric. Subclasses define _init/_update/_compute on
    per-task states; this base maps them over tasks and exposes the
    ``{metric}-{task}|{window}_{name}`` key layout of the reference."""

    # leaves reduced across ranks with psum by default; subclasses may
    # override ``sync`` for non-additive state (e.g. ring buffers gather)
    metric_name: str = "metric"

    def __init__(self, tasks: Sequence[RecTaskInfo] = (RecTaskInfo(),)):
        self._tasks = list(tasks)

    @property
    def tasks(self) -> List[RecTaskInfo]:
        return self._tasks

    # -- per-task hooks ------------------------------------------------------
    def _init(self) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def _update(
        self,
        state: Dict[str, jnp.ndarray],
        predictions: jnp.ndarray,
        labels: jnp.ndarray,
        weights: jnp.ndarray,
    ) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def _compute(self, state: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    # -- public API ------------------------------------------------------------
    def init_state(self):
        return {t.name: self._init() for t in self._tasks}

    def update(self, state, predictions, labels, weights=None):
        """predictions/labels/weights: [B] arrays, or {task: [B]} dicts."""
        new = {}
        for t in self._tasks:
            p = predictions[t.name] if isinstance(predictions, dict) else predictions
            l = labels[t.name] if isinstance(labels, dict) else labels
            if weights is None:
                w = jnp.ones_like(p, dtype=jnp.float32)
            else:
                w = weights[t.name] if isinstance(weights, dict) else weights
            new[t.name] = self._update(
                state[t.name],
                p.astype(jnp.float32),
                l.astype(jnp.float32),
                w.astype(jnp.float32),
            )
        return new

    def compute(self, state) -> Dict[str, jnp.ndarray]:
        out = {}
        for t in self._tasks:
            for name, value in self._compute(state[t.name]).items():
                out[f"{self.metric_name}-{t.name}|{name}"] = value
        return out

    def sync(self, state, axis_name: str):
        """Cross-rank reduce (inside shard_map). Default: psum every leaf."""
        return jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, axis_name), state
        )


@dataclasses.dataclass(frozen=True)
class MetricUpdate:
    """Convenience bundle of one batch's (preds, labels, weights)."""

    predictions: jnp.ndarray
    labels: jnp.ndarray
    weights: Optional[jnp.ndarray] = None


# ---------------------------------------------------------------- ring buffer
def ring_buffer_init(window: int, fields: int) -> Dict[str, jnp.ndarray]:
    """Fixed-size example ring buffer: [window, fields] + cursor + fill."""
    return {
        "buf": jnp.zeros((window, fields), jnp.float32),
        "cursor": jnp.zeros((), jnp.int32),
        "filled": jnp.zeros((), jnp.int32),
    }


def ring_buffer_push(rb, rows: jnp.ndarray):
    """Append [B, fields] rows, overwriting oldest (B <= window)."""
    window = rb["buf"].shape[0]
    b = rows.shape[0]
    idx = (rb["cursor"] + jnp.arange(b, dtype=jnp.int32)) % window
    return {
        "buf": rb["buf"].at[idx].set(rows),
        "cursor": (rb["cursor"] + b) % window,
        "filled": jnp.minimum(rb["filled"] + b, window),
    }
