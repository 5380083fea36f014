"""DistributedModelParallel tests: sharded DLRM training matches the
single-device trainer, and trains end-to-end on the 8-device mesh.

Reference analog: torchrec/distributed/tests/test_model_parallel.py (DMP
sharded-vs-unsharded training oracle over TestSparseNN).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchrec_tpu.distributed import ShardingEnv
from torchrec_tpu.distributed.model_parallel import (
    DistributedModelParallel,
    default_plan,
)
from torchrec_tpu.datasets import RandomRecDataset
from torchrec_tpu.models import DLRM
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.ops import RowWiseAdagrad, SGD
from torchrec_tpu.training import init_train_state, make_train_step
from torchrec_tpu.types import ShardingType

WORLD = 8


def make_model(dim=16):
    tables = [
        EmbeddingBagConfig(name="big", num_embeddings=10000, embedding_dim=dim,
                           feature_names=["fb"]),
        EmbeddingBagConfig(name="mid", num_embeddings=500, embedding_dim=dim,
                           feature_names=["fm1", "fm2"]),
        EmbeddingBagConfig(name="small", num_embeddings=30, embedding_dim=dim,
                           feature_names=["fs"]),
    ]
    return DLRM(
        embedding_bag_collection=EmbeddingBagCollection(tables),
        dense_in_features=13,
        dense_arch_layer_sizes=(32, dim),
        over_arch_layer_sizes=(32, 16),
    )


def make_batch(model, batch_size, seed=0):
    ds = RandomRecDataset(
        keys=model.embedding_bag_collection.feature_names(),
        batch_size=batch_size,
        hash_sizes=[10000, 500, 500, 30],
        num_dense=13,
        seed=seed,
    )
    return next(iter(ds))


def test_default_plan_shapes():
    model = make_model()
    env = ShardingEnv.from_devices(jax.devices()[:WORLD])
    plan = default_plan(model.embedding_bag_collection._tables, env)
    assert plan["big"].sharding_type == ShardingType.ROW_WISE
    assert plan["small"].sharding_type == ShardingType.TABLE_WISE
    assert len(plan["big"].shards) == WORLD


def test_sharded_training_matches_single_device():
    """Same init, same batches: DMP-sharded training must track the
    single-device trainer step for step (the reference's DMP oracle)."""
    model = make_model()
    emb_opt = SGD(learning_rate=0.05)
    dense_tx = optax.sgd(0.05)
    env = ShardingEnv.from_devices(jax.devices()[:WORLD])

    # single-device reference
    ref_state = init_train_state(model, jax.random.key(0), emb_opt, dense_tx)
    ref_step = jax.jit(make_train_step(model, emb_opt, dense_tx))

    # sharded
    dmp = DistributedModelParallel(model, env)
    state = dmp.init_train_state(jax.random.key(0), emb_opt, dense_tx)
    step = dmp.make_train_step(emb_optimizer=emb_opt, dense_tx=dense_tx,
                               example_state=state)

    losses_ref, losses_sharded = [], []
    for i in range(4):
        batch = make_batch(model, batch_size=WORLD * 4, seed=i)
        ref_state, ref_aux = ref_step(ref_state, batch)
        state, aux = step(state, batch)
        losses_ref.append(float(ref_aux["loss"]))
        losses_sharded.append(float(np.asarray(aux["loss"])))
    np.testing.assert_allclose(losses_sharded, losses_ref, rtol=1e-4)

    # post-training weights match
    got = dmp.sharded_ebc.unshard_params(state.sparse_params)
    ebc = model.embedding_bag_collection
    for t in ebc._tables:
        np.testing.assert_allclose(
            got[t.name],
            np.asarray(ebc.table_slice(ref_state.sparse_params, t.name)),
            rtol=1e-4, atol=1e-5,
        )
    # dense params match too
    ref_leaves = jax.tree_util.tree_leaves(ref_state.dense_params)
    got_leaves = jax.tree_util.tree_leaves(state.dense_params)
    for a, b in zip(got_leaves, ref_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_training_loss_decreases_adagrad():
    model = make_model()
    emb_opt = RowWiseAdagrad(learning_rate=0.2)
    dense_tx = optax.adagrad(0.05)
    env = ShardingEnv.from_devices(jax.devices()[:WORLD])
    dmp = DistributedModelParallel(model, env)
    state = dmp.init_train_state(jax.random.key(1), emb_opt, dense_tx)
    step = dmp.make_train_step(emb_optimizer=emb_opt, dense_tx=dense_tx,
                               example_state=state)
    batch = make_batch(model, batch_size=WORLD * 4, seed=3)
    losses = []
    for _ in range(60):
        state, aux = step(state, batch)
        losses.append(float(np.asarray(aux["loss"])))
    assert losses[-1] < 0.1, losses[::10]
    assert int(np.asarray(state.step)) == 60


def test_sharded_dlrm_converges_on_learnable_task():
    """End-to-end convergence proof: a sharded DLRM learns a synthetic
    click rule (label = f(one embedding id)) well above chance — the
    'golden training' acceptance test (reference golden_training recipe)."""
    import optax
    from torchrec_tpu.metrics import AUCMetric
    from torchrec_tpu.sparse import KeyedJaggedTensor

    tables = [
        EmbeddingBagConfig(name="sig", num_embeddings=64, embedding_dim=16,
                           feature_names=["sig"]),
        EmbeddingBagConfig(name="noise", num_embeddings=1000, embedding_dim=16,
                           feature_names=["noise"]),
    ]
    model = DLRM(
        embedding_bag_collection=EmbeddingBagCollection(tables),
        dense_in_features=4,
        dense_arch_layer_sizes=(16, 16),
        over_arch_layer_sizes=(16, 8),
    )
    env = ShardingEnv.from_devices(jax.devices()[:WORLD])
    dmp = DistributedModelParallel(model, env, batch_size=32)
    emb_opt = RowWiseAdagrad(learning_rate=0.1)
    tx = optax.adam(5e-3)
    state = dmp.init_train_state(jax.random.key(0), emb_opt, tx)
    step = dmp.make_train_step(emb_opt, tx, example_state=state)

    rng = np.random.default_rng(0)
    auc = AUCMetric(window=4096)
    auc_state = auc.init_state()
    B = 32
    from torchrec_tpu.training import Batch
    for i in range(120):
        sig = rng.integers(0, 64, B)
        noise = rng.integers(0, 1000, B)
        labels = (sig % 2).astype(np.float32)  # even ids click
        kjt = KeyedJaggedTensor(
            keys=["sig", "noise"],
            values=jnp.asarray(np.concatenate([sig, noise]).astype(np.int32)),
            lengths=jnp.asarray(np.ones((2, B), np.int32)),
        )
        batch = Batch(
            dense_features=jnp.asarray(rng.normal(size=(B, 4)).astype(np.float32)),
            sparse_features=kjt,
            labels=jnp.asarray(labels),
        )
        state, aux = step(state, batch)
        if i >= 60:  # post-warmup window
            preds = jax.nn.sigmoid(aux["logits"].reshape(-1))
            auc_state = auc.update(auc_state, preds, aux["labels"].reshape(-1))
    final_auc = float(auc.compute(auc_state)["auc-default|window_auc"])
    assert final_auc > 0.9, f"sharded DLRM failed to learn: AUC={final_auc}"


def test_dmp_shards_deepfm_family():
    """DMP works for any model exposing the (ebc, forward_sparse,
    forward_dense, init) contract — here SimpleDeepFMNN."""
    import optax
    from torchrec_tpu.models import SimpleDeepFMNN

    ebc = EmbeddingBagCollection([
        EmbeddingBagConfig(name="t0", num_embeddings=500, embedding_dim=16,
                           feature_names=["f0"]),
        EmbeddingBagConfig(name="t1", num_embeddings=50, embedding_dim=16,
                           feature_names=["f1"]),
    ])
    model = SimpleDeepFMNN(
        num_dense_features=4, embedding_bag_collection=ebc,
        hidden_layer_size=16, deep_fm_dimension=8,
    )
    env = ShardingEnv.from_devices(jax.devices()[:WORLD])
    dmp = DistributedModelParallel(model, env, batch_size=16)
    emb_opt = RowWiseAdagrad(learning_rate=0.05)
    tx = optax.sgd(0.01)
    state = dmp.init_train_state(jax.random.key(0), emb_opt, tx)
    step = dmp.make_train_step(emb_opt, tx, example_state=state)

    from torchrec_tpu.datasets import RandomRecDataset
    ds = iter(RandomRecDataset(keys=["f0", "f1"], batch_size=16,
                               hash_sizes=[500, 50], num_dense=4))
    losses = []
    for _ in range(3):
        state, aux = step(state, next(ds))
        losses.append(float(np.asarray(aux["loss"])))
    assert all(np.isfinite(l) for l in losses)
