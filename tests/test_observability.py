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


# --------------------------------------------------- gradient-overflow counter

class TestGradientOverflowCounter:
    """max_unique_gradient_rows drops excess slots SILENTLY — the counter
    (EmbeddingBagCollection.gradient_overflow, surfaced as train-step aux
    "emb_grad_overflow" and a StepAuxCounters metric) must expose it."""

    def _ebc(self, max_unique):
        from torchrec_tpu.modules import (
            EmbeddingBagCollection,
            EmbeddingBagConfig,
        )

        return EmbeddingBagCollection(
            [
                EmbeddingBagConfig(
                    name="big",
                    num_embeddings=100_000,  # > small-table boundary
                    embedding_dim=8,
                    feature_names=["f"],
                )
            ],
            max_unique_gradient_rows=max_unique,
        )

    def _kjt(self, n):
        from torchrec_tpu import KeyedJaggedTensor

        return KeyedJaggedTensor(
            keys=["f"],
            values=jnp.arange(20_000, 20_000 + n, dtype=jnp.int32),
            lengths=jnp.full((1, 1), n, jnp.int32),
        )

    def test_zero_when_within_bound(self):
        ebc = self._ebc(max_unique=64)
        assert int(ebc.gradient_overflow(self._kjt(10))) == 0

    def test_counts_dropped_slots_when_exceeded(self):
        ebc = self._ebc(max_unique=8)
        # 20 distinct large-table slots against a bound of 8 -> 12 dropped
        assert int(ebc.gradient_overflow(self._kjt(20))) == 12

    def test_zero_when_no_bound(self):
        ebc = self._ebc(max_unique=None)
        assert int(ebc.gradient_overflow(self._kjt(20))) == 0

    def test_surfaced_in_train_step_aux(self):
        import numpy as np

        from torchrec_tpu.models.dlrm import DLRM
        from torchrec_tpu.ops import RowWiseAdagrad
        from torchrec_tpu.training import (
            Batch,
            init_train_state,
            make_train_step,
        )
        import optax

        model = DLRM(
            embedding_bag_collection=self._ebc(max_unique=8),
            dense_in_features=4,
            dense_arch_layer_sizes=(8,),
            over_arch_layer_sizes=(4,),
        )
        emb_opt = RowWiseAdagrad(learning_rate=0.1)
        dense_tx = optax.sgd(0.1)
        state = init_train_state(model, jax.random.key(0), emb_opt, dense_tx)
        step = jax.jit(make_train_step(model, emb_opt, dense_tx))
        kjt = self._kjt(20)
        batch = Batch(
            dense_features=jnp.ones((1, 4), jnp.float32),
            sparse_features=kjt,
            labels=jnp.ones((1,), jnp.float32),
        )
        _, aux = step(state, batch)
        assert int(aux["emb_grad_overflow"]) == 12

    def test_metrics_stack_accumulates_counter(self):
        from torchrec_tpu.metrics import (
            NEMetric,
            RecMetricModule,
            StepAuxCounters,
        )

        mm = RecMetricModule(
            [NEMetric()], aux_counters=StepAuxCounters()
        )
        state = mm.init_state()
        preds = jnp.array([0.4, 0.6])
        labels = jnp.array([0.0, 1.0])
        state = mm.update(
            state, preds, labels, aux={"emb_grad_overflow": jnp.int32(12)}
        )
        state = mm.update(
            state, preds, labels, aux={"emb_grad_overflow": jnp.int32(3)}
        )
        out = mm.compute(state)
        assert out["counter-emb_grad_overflow|lifetime"] == 15.0
        assert out["counter-a2a_dropped|lifetime"] == 0.0
