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
