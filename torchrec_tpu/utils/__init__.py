"""Logging/observability utilities (reference torchrec/distributed/logger.py and utils/)."""
from torchrec_tpu.utils.logging import (
    EmbeddingEvent,
    annotate_embedding_event,
    get_event_logger,
    torchrec_method_logger,
)

__all__ = [
    "EmbeddingEvent",
    "annotate_embedding_event",
    "get_event_logger",
    "torchrec_method_logger",
]


def __getattr__(name):
    if name in ("PercentileLogger", "P2Quantile"):
        from torchrec_tpu.utils.percentile_logger import P2Quantile, PercentileLogger

        return {"PercentileLogger": PercentileLogger, "P2Quantile": P2Quantile}[name]
    raise AttributeError(name)
