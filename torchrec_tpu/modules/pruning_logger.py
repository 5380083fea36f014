"""Pruning-event logger interface for ITEP (reference
torchrec/modules/pruning_logger.py:23 PruningLogger,
PruningLoggerDefault:36).

The reference wraps each pruning phase (row reselection, remap rebuild) in
``with SomePruningLogger.pruning_logger(event=...) as log: ...`` so
production deployments can publish timings/row counts to their telemetry
system. Same contract here: a classmethod contextmanager yielding a
mutable namespace the caller can stamp fields onto. Because the ITEP
reselect itself runs inside the jitted step, meaningful wall-clock spans
are HOST phases only (state pulls, checkpoint writes, plan swaps) — stamp
device-side row counts onto the namespace instead of timing kernels.
"""

from __future__ import annotations

import logging
import time
from abc import ABC, abstractmethod
from contextlib import contextmanager
from dataclasses import dataclass
from types import SimpleNamespace
from typing import Generator, Optional

logger: logging.Logger = logging.getLogger(__name__)

__all__ = [
    "PruningLogBase",
    "PruningLogger",
    "PruningLoggerDefault",
    "StdlibPruningLogger",
]


@dataclass
class PruningLogBase:
    """Base payload type for pruning log records (reference :19)."""


class PruningLogger(ABC):
    """Pruning telemetry hook (reference :23)."""

    @classmethod
    @abstractmethod
    @contextmanager
    def pruning_logger(
        cls,
        event: str,
        trainer: Optional[str] = None,
        publisher: Optional[str] = None,
    ) -> Generator[object, None, None]:
        ...


class PruningLoggerDefault(PruningLogger):
    """No-op default (reference :36)."""

    @classmethod
    @contextmanager
    def pruning_logger(
        cls,
        event: str,
        trainer: Optional[str] = None,
        publisher: Optional[str] = None,
    ) -> Generator[object, None, None]:
        yield SimpleNamespace()


class StdlibPruningLogger(PruningLogger):
    """Log event name, duration, and any fields the caller stamped on the
    yielded namespace through the stdlib logger."""

    @classmethod
    @contextmanager
    def pruning_logger(
        cls,
        event: str,
        trainer: Optional[str] = None,
        publisher: Optional[str] = None,
    ) -> Generator[object, None, None]:
        ns = SimpleNamespace()
        t0 = time.monotonic()
        try:
            yield ns
        finally:
            fields = {
                k: v for k, v in vars(ns).items() if not k.startswith("_")
            }
            logger.info(
                "pruning event=%s trainer=%s publisher=%s duration_s=%.4f %s",
                event, trainer, publisher, time.monotonic() - t0, fields,
            )
