"""Observability: public-API usage logging + device trace annotations.

Capability parity with torchrec/distributed/logger.py
(@_torchrec_method_logger:198 — structured event logs on public entry
points), logging_handlers.py (component-tagged planner/ITEP events) and
the EmbeddingEvent trace annotations (distributed/types.py:165 +
record_function ranges in train_pipelines.py:848-916).

TPU-first: trace ranges use ``jax.profiler.TraceAnnotation`` / named
scopes (visible in XLA/Perfetto traces the same way record_function ranges
show in Kineto), and usage events go to a standard logging logger with a
structured payload.
"""

from __future__ import annotations

import functools
import json
import logging
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax

__all__ = [
    "torchrec_method_logger",
    "EmbeddingEvent",
    "annotate_embedding_event",
    "get_event_logger",
]

_logger = logging.getLogger("torchrec_tpu.events")


def get_event_logger() -> logging.Logger:
    return _logger


def torchrec_method_logger(**static_fields):
    """Decorator: log a structured event on every call of a public entry
    point (reference @_torchrec_method_logger, distributed/logger.py:198).
    Exceptions are logged with the error and re-raised."""

    def deco(fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            t0 = time.monotonic()
            event: Dict[str, Any] = {
                "method": fn.__qualname__,
                **static_fields,
            }
            try:
                out = fn(*args, **kwargs)
                event["status"] = "ok"
                return out
            except Exception as e:  # noqa: BLE001 - log and re-raise
                event["status"] = "error"
                event["error"] = repr(e)
                raise
            finally:
                event["duration_ms"] = round(
                    (time.monotonic() - t0) * 1e3, 3
                )
                _logger.info("torchrec_event %s", json.dumps(event))

        return wrapper

    return deco


class EmbeddingEvent:
    """Semantic phases of the sharded embedding program (reference
    distributed/types.py:165)."""

    KJT_SPLITS_DIST = "splits_dist"
    KJT_TENSORS_DIST = "tensors_dist"
    LOOKUP = "lookup"
    OUTPUT_DIST = "output_dist"
    OUTPUT_DIST_WAIT = "output_dist_wait"
    FUSED_UPDATE = "fused_update"


def annotate_embedding_event(
    event: str, module_name: str = "", **extra
) -> "jax.profiler.TraceAnnotation":
    """Context manager producing a named trace range around a phase
    (reference maybe_annotate_embedding_event, distributed/utils.py:566).
    Ranges appear in jax.profiler / Perfetto traces as
    ``## <event> <module> ##`` like the reference's record_function tags."""
    label = f"## {event} {module_name} ##".strip()
    return jax.profiler.TraceAnnotation(label)
