"""MPZCH scalar metrics: hit/insert/eviction/usage counters + logger.

Capability parity with torchrec/modules/hash_mc_metrics.py (ScalarLogger:80,
ScalarLoggerBackend:21, ConsoleScalarLoggerBackend:53): per-table ZCH
identity-remap quality counters — hit count, insert count, eviction count,
collision/fallback count, table usage — accumulated across steps and
reported every ``frequency`` steps through a pluggable backend.

TPU-first split: the reference computes counters eagerly on GPU tensors
inside the module forward; here :func:`mpzch_batch_stats` is a PURE
function of (state_before, state_after, ids) that runs INSIDE the jitted
step and returns a dict of scalar counters (add it to the step aux), and
:class:`ScalarLogger` is the host-side accumulator/reporter fed those aux
values — the device program stays fusion-friendly and the host does the
string formatting.
"""

from __future__ import annotations

import abc
import logging
from typing import Callable, Dict, Optional

import jax.numpy as jnp

from torchrec_tpu.modules.hash_mc_modules import (
    _EMPTY,
    HashZchManagedCollisionModule,
)

__all__ = [
    "mpzch_batch_stats",
    "ScalarLoggerBackend",
    "ConsoleScalarLoggerBackend",
    "CallableScalarLoggerBackend",
    "ScalarLogger",
]


def mpzch_batch_stats(
    module: HashZchManagedCollisionModule,
    state_before: Dict[str, jnp.ndarray],
    state_after: Dict[str, jnp.ndarray],
    ids: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Scalar counters for one MPZCH forward (jit-safe).

    Returns int32/float32 scalars: ``total`` valid ids, ``hit_cnt`` (id was
    already resident before the batch), ``insert_cnt`` (slots newly claimed
    from EMPTY), ``eviction_cnt`` (occupied slots whose resident id was
    replaced — TTL-expired takeovers), ``collision_cnt``
    (total - hits - inserts - evictions: ids that fell through to the
    fallback bucket), and ``usage`` (fraction of slots occupied after).
    """
    n_valid = (
        jnp.int32(ids.shape[0])
        if valid is None
        else valid.sum().astype(jnp.int32)
    )
    safe_ids = ids if valid is None else jnp.where(valid, ids, _EMPTY)
    # resident before: probe the OLD table for each id
    pos = module.remap(state_before, safe_ids)
    was_hit = jnp.take(state_before["slot_ids"], pos) == safe_ids
    if valid is not None:
        was_hit = was_hit & valid
    hit_cnt = was_hit.sum().astype(jnp.int32)

    old, new = state_before["slot_ids"], state_after["slot_ids"]
    insert_cnt = ((old == _EMPTY) & (new != _EMPTY)).sum().astype(jnp.int32)
    eviction_cnt = (
        ((old != _EMPTY) & (new != _EMPTY) & (new != old))
        .sum()
        .astype(jnp.int32)
    )
    collision_cnt = jnp.maximum(
        n_valid - hit_cnt - insert_cnt - eviction_cnt, 0
    )
    usage = (new != _EMPTY).mean(dtype=jnp.float32)
    return {
        "total": n_valid,
        "hit_cnt": hit_cnt,
        "insert_cnt": insert_cnt,
        "eviction_cnt": eviction_cnt,
        "collision_cnt": collision_cnt,
        "usage": usage,
    }


class ScalarLoggerBackend(abc.ABC):
    """Reporting sink (reference ScalarLoggerBackend:21); subclass for
    TensorBoard/file/etc."""

    @abc.abstractmethod
    def report(self, name: str, step: int, scalars: Dict[str, float]) -> None:
        ...


class ConsoleScalarLoggerBackend(ScalarLoggerBackend):
    """Log through the stdlib logger (reference
    ConsoleScalarLoggerBackend:53); optional file handler."""

    def __init__(self, log_file_path: str = "") -> None:
        self._logger = logging.getLogger(__name__)
        if log_file_path:
            self._logger.addHandler(logging.FileHandler(log_file_path))

    def report(self, name: str, step: int, scalars: Dict[str, float]) -> None:
        parts = ", ".join(f"{k}={v:.6g}" for k, v in scalars.items())
        self._logger.info("ScalarLogger[%s] step=%d %s", name, step, parts)


class CallableScalarLoggerBackend(ScalarLoggerBackend):
    """Route reports to any ``fn(name, step, scalars)`` (test/TensorBoard
    shim)."""

    def __init__(self, fn: Callable[[str, int, Dict[str, float]], None]):
        self._fn = fn

    def report(self, name: str, step: int, scalars: Dict[str, float]) -> None:
        self._fn(name, step, scalars)


class ScalarLogger:
    """Host-side accumulator/reporter (reference ScalarLogger:80).

    Feed it the :func:`mpzch_batch_stats` dict (host values — pull them
    out of the step aux) once per step; every ``frequency`` steps it
    reports windowed rates (hit/insert/eviction/collision per id, table
    usage) through the backend and resets the window.
    """

    _COUNTS = ("total", "hit_cnt", "insert_cnt", "eviction_cnt",
               "collision_cnt")

    def __init__(
        self,
        name: str,
        zch_size: int,
        frequency: int = 1,
        backend: Optional[ScalarLoggerBackend] = None,
        log_file_path: str = "",
    ) -> None:
        if frequency < 1:
            raise ValueError(f"frequency must be >= 1, got {frequency}")
        self._name = name
        self._zch_size = zch_size
        self._frequency = frequency
        self._backend = backend or ConsoleScalarLoggerBackend(log_file_path)
        self._step = 0
        self._acc: Dict[str, float] = {k: 0.0 for k in self._COUNTS}
        self._last_usage = 0.0

    def update(self, stats: Dict[str, object]) -> None:
        for k in self._COUNTS:
            self._acc[k] += float(stats[k])
        self._last_usage = float(stats["usage"])
        self._step += 1
        if self._step % self._frequency == 0:
            self._report()

    def _report(self) -> None:
        total = max(self._acc["total"], 1.0)
        scalars = {
            "hit_rate": self._acc["hit_cnt"] / total,
            "insert_rate": self._acc["insert_cnt"] / total,
            "eviction_rate": self._acc["eviction_cnt"] / total,
            "collision_rate": self._acc["collision_cnt"] / total,
            "total_cnt": self._acc["total"],
            "usage": self._last_usage,
            "zch_size": float(self._zch_size),
        }
        self._backend.report(self._name, self._step, scalars)
        self._acc = {k: 0.0 for k in self._COUNTS}
