"""Train pipeline tests: equivalence with the plain loop, prefetch
accounting, staged pipelines, exhaustion.

Reference analog: torchrec/distributed/train_pipeline/tests/.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from torchrec_tpu.datasets import RandomRecDataset
from torchrec_tpu.ops import RowWiseAdagrad
from torchrec_tpu.train_pipeline import (
    PipelineStage,
    StagedTrainPipeline,
    TrainPipelineBase,
    TrainPipelineSparseDist,
)
from torchrec_tpu.training import init_train_state, make_train_step
from tests.test_dlrm import make_data, make_model


def setup(seed=0):
    model = make_model(num_features=2, dim=8)
    emb_opt = RowWiseAdagrad(learning_rate=0.1)
    dense_tx = optax.sgd(0.01)
    state = init_train_state(model, jax.random.key(seed), emb_opt, dense_tx)
    step = jax.jit(make_train_step(model, emb_opt, dense_tx))
    return model, state, step


def test_pipeline_matches_plain_loop():
    model, state, step = setup()
    batches = list(itertools.islice(iter(make_data(model, batch_size=8)), 6))

    plain_state = state
    plain_losses = []
    for b in batches:
        plain_state, aux = step(plain_state, b)
        plain_losses.append(float(np.asarray(aux["loss"])))

    _, state2, _ = setup()
    for variant in (TrainPipelineBase, TrainPipelineSparseDist):
        pipe = variant(step, state2)
        it = iter(batches)
        losses = []
        while True:
            aux = pipe.progress(it)
            if aux is None:
                break
            losses.append(float(np.asarray(aux["loss"])))
        assert pipe.steps == 6
        np.testing.assert_allclose(losses, plain_losses, rtol=1e-5)


def test_pipeline_exhaustion_returns_none():
    model, state, step = setup()
    pipe = TrainPipelineSparseDist(step, state)
    it = iter([])
    assert pipe.progress(it) is None


def test_staged_pipeline_runs_stages_in_order():
    model, state, step = setup()
    seen = []

    def stage_a(batch):
        seen.append("a")
        return batch

    def stage_b(batch):
        seen.append("b")
        return batch

    pipe = StagedTrainPipeline(
        [PipelineStage("a", stage_a), PipelineStage("b", stage_b)],
        step, state,
    )
    batches = list(itertools.islice(iter(make_data(model, batch_size=8)), 3))
    it = iter(batches)
    losses = []
    while True:
        aux = pipe.progress(it)
        if aux is None:
            break
        losses.append(float(np.asarray(aux["loss"])))
    assert len(losses) == 3
    # every batch passed both stages, a before b
    assert seen.count("a") == 3 and seen.count("b") == 3


def test_staged_pipeline_stage_transforms_batch():
    model, state, step = setup()

    def scale_dense(batch):
        batch.dense_features = batch.dense_features * 0.0
        return batch

    pipe = StagedTrainPipeline(
        [PipelineStage("zero_dense", scale_dense)], step, state
    )
    batches = list(itertools.islice(iter(make_data(model, batch_size=8)), 2))
    it = iter(batches)
    out = []
    while (aux := pipe.progress(it)) is not None:
        out.append(aux)
    assert len(out) == 2


def test_eval_step_no_mutation():
    """Eval pipeline: forward + loss only, params untouched."""
    import optax
    from torchrec_tpu.training import init_train_state, make_eval_step
    from torchrec_tpu.datasets import RandomRecDataset
    from torchrec_tpu.models import DLRM
    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
    from torchrec_tpu.ops import SGD

    model = DLRM(
        embedding_bag_collection=EmbeddingBagCollection([
            EmbeddingBagConfig(name="t", num_embeddings=50, embedding_dim=8,
                               feature_names=["f"]),
        ]),
        dense_in_features=4,
        dense_arch_layer_sizes=(8, 8),
        over_arch_layer_sizes=(8,),
    )
    state = init_train_state(model, jax.random.key(0), SGD(), optax.sgd(0.1))
    ev = jax.jit(make_eval_step(model))
    batch = next(iter(RandomRecDataset(keys=["f"], batch_size=8,
                                       hash_sizes=[50], num_dense=4)))
    aux = ev(state, batch)
    assert np.isfinite(float(np.asarray(aux["loss"])))
    aux2 = ev(state, batch)
    np.testing.assert_array_equal(np.asarray(aux["logits"]),
                                  np.asarray(aux2["logits"]))
