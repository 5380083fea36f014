"""Observability: method logger + trace annotations.

Reference analogs: distributed/logger.py tests, EmbeddingEvent annotations.
"""

import json
import logging

import jax
import jax.numpy as jnp
import pytest

from torchrec_tpu.utils import (
    EmbeddingEvent,
    annotate_embedding_event,
    get_event_logger,
    torchrec_method_logger,
)


def test_method_logger_emits_events(caplog):
    @torchrec_method_logger(component="test")
    def fn(x, y=2):
        return x + y

    with caplog.at_level(logging.INFO, logger="torchrec_tpu.events"):
        assert fn(1) == 3
    rec = [r for r in caplog.records if "torchrec_event" in r.getMessage()]
    assert rec
    payload = json.loads(rec[-1].getMessage().split("torchrec_event ")[1])
    assert payload["method"].endswith("fn")
    assert payload["status"] == "ok" and payload["component"] == "test"


def test_method_logger_logs_errors(caplog):
    @torchrec_method_logger()
    def boom():
        raise ValueError("nope")

    with caplog.at_level(logging.INFO, logger="torchrec_tpu.events"):
        with pytest.raises(ValueError):
            boom()
    payload = json.loads(
        caplog.records[-1].getMessage().split("torchrec_event ")[1]
    )
    assert payload["status"] == "error" and "nope" in payload["error"]


def test_trace_annotation_wraps_compute():
    with annotate_embedding_event(EmbeddingEvent.LOOKUP, "ebc"):
        out = jnp.sum(jnp.ones((8, 8)))
    assert float(out) == 64.0
