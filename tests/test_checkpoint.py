"""Checkpoint/resume tests: same-plan roundtrip (incl. optimizer state) and
cross-plan resharded resume.

Reference analog: dcp round-trip tests
(distributed/composable/tests/test_fsdp.py:280) + bucket-aware state_dict.
"""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torchrec_tpu.checkpoint import (
    export_state_dict,
    import_state_dict,
    restore_train_state,
    save_train_state,
)
from torchrec_tpu.distributed import (
    ShardedEmbeddingBagCollection,
    ShardingEnv,
    construct_module_sharding_plan,
    row_wise,
    table_wise,
)
from torchrec_tpu.distributed.model_parallel import DistributedModelParallel
from torchrec_tpu.models import DLRM
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.ops import RowWiseAdagrad
from torchrec_tpu.planner import plan_hash
from tests.test_model_parallel import make_batch, make_model


def test_same_plan_roundtrip_with_optimizer_state(tmp_path):
    model = make_model()
    emb_opt = RowWiseAdagrad(learning_rate=0.1)
    dense_tx = optax.adagrad(0.05)
    env = ShardingEnv.from_devices(jax.devices()[:8])
    dmp = DistributedModelParallel(model, env)
    state = dmp.init_train_state(jax.random.key(0), emb_opt, dense_tx)
    step = dmp.make_train_step(emb_optimizer=emb_opt, dense_tx=dense_tx,
                               example_state=state)
    for i in range(3):
        state, _ = step(state, make_batch(model, 16, seed=i))

    ph = plan_hash(dmp.plan)
    save_train_state(str(tmp_path / "ckpt"), state,
                     metadata={"plan_hash": ph, "step": 3})

    # fresh state, restore, continue training identically
    state2 = dmp.init_train_state(jax.random.key(1), emb_opt, dense_tx)
    state2 = restore_train_state(str(tmp_path / "ckpt"), state2,
                                 expect_plan_hash=ph)
    assert int(np.asarray(state2.step)) == 3
    t1 = dmp.sharded_ebc.unshard_params(state.sparse_params)
    t2 = dmp.sharded_ebc.unshard_params(state2.sparse_params)
    for k in t1:
        np.testing.assert_allclose(t2[k], t1[k])
    # optimizer momentum restored
    m1 = jax.tree_util.tree_leaves(state.emb_opt_state)
    m2 = jax.tree_util.tree_leaves(state2.emb_opt_state)
    for a, b in zip(m1, m2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a))
    # training continues bit-identically
    batch = make_batch(model, 16, seed=99)
    s1, aux1 = step(state, batch)
    s2, aux2 = step(state2, batch)
    np.testing.assert_allclose(
        np.asarray(aux2["loss"]), np.asarray(aux1["loss"]), rtol=1e-6
    )


def test_plan_hash_mismatch_rejected(tmp_path):
    model = make_model()
    emb_opt = RowWiseAdagrad(learning_rate=0.1)
    dense_tx = optax.sgd(0.01)
    env = ShardingEnv.from_devices(jax.devices()[:8])
    dmp = DistributedModelParallel(model, env)
    state = dmp.init_train_state(jax.random.key(0), emb_opt, dense_tx)
    save_train_state(str(tmp_path / "c"), state,
                     metadata={"plan_hash": "aaa"})
    with pytest.raises(ValueError):
        restore_train_state(str(tmp_path / "c"), state, expect_plan_hash="bbb")


def test_cross_plan_reshard_resume():
    """Train under plan A, export state_dict, import under plan B on a
    different placement — tables must match exactly."""
    tables = [
        EmbeddingBagConfig(name="a", num_embeddings=64, embedding_dim=128,
                           feature_names=["fa"]),
        EmbeddingBagConfig(name="b", num_embeddings=40, embedding_dim=128,
                           feature_names=["fb"]),
    ]
    ebc = EmbeddingBagCollection(tables)
    env = ShardingEnv.from_devices(jax.devices()[:8])
    params = ebc.init(jax.random.key(0))

    plan_a = construct_module_sharding_plan(
        tables, {"a": row_wise(), "b": table_wise(3)}, env)
    plan_b = construct_module_sharding_plan(
        tables, {"a": table_wise(6), "b": row_wise()}, env)
    sebc_a = ShardedEmbeddingBagCollection(ebc, plan_a, env)
    sebc_b = ShardedEmbeddingBagCollection(ebc, plan_b, env)

    params_a = sebc_a.shard_params(params)
    sd = export_state_dict(sebc_a, params_a)
    assert set(sd) == {"embedding_bags.a.weight", "embedding_bags.b.weight"}
    params_b = import_state_dict(sebc_b, sd)
    out_a = sebc_a.unshard_params(params_a)
    out_b = sebc_b.unshard_params(params_b)
    for k in out_a:
        np.testing.assert_allclose(out_b[k], out_a[k])
