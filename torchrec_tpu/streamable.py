"""Pipelineable batch protocols.

Capability parity with torchrec/streamable.py (Multistreamable:15 —
cross-CUDA-stream safety via record_stream; Pipelineable:30 — the
``to(device, non_blocking)`` contract pipelined batches must satisfy).

TPU-first: there are no user-managed streams — JAX transfers are async and
the runtime tracks buffer liveness, so ``record_stream`` is a no-op
guarantee the framework provides for free. What remains meaningful is the
*placement* contract: a pipelineable batch must be movable to a device (or
sharding) ahead of the compute that consumes it, which is how the
prefetching pipelines overlap H2D with device compute
(torchrec_tpu/train_pipeline.py).
"""

from __future__ import annotations

import abc
from typing import Any, Optional

import jax

__all__ = ["Multistreamable", "Pipelineable", "to_device"]


class Multistreamable(abc.ABC):
    """Reference streamable.py:15. On TPU the runtime owns buffer liveness
    across async transfers, so conforming is automatic; the ABC exists so
    pipeline stages can declare the same contract as the reference."""

    def record_stream(self, stream: Any = None) -> None:  # noqa: D401
        """No-op on TPU (the runtime tracks async-transfer liveness)."""
        return None


class Pipelineable(Multistreamable):
    """Reference streamable.py:30: batches a train pipeline can stage."""

    @abc.abstractmethod
    def to(self, device: Any, non_blocking: bool = True) -> "Pipelineable":
        """Return a copy placed on ``device`` (a jax.Device or Sharding).
        With non_blocking=True the transfer is async (jax default)."""


def to_device(batch: Any, device: Any) -> Any:
    """Move any pytree batch to a device/sharding (the generic
    ``Pipelineable.to`` used by the pipelines for plain pytrees)."""
    return jax.device_put(batch, device)
