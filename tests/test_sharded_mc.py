"""Sharded managed-collision EBC/EC: sharded == unsharded MC composition.

Reference analog: torchrec/distributed/tests/test_mc_embeddingbag.py and
test_mc_embedding.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu import KeyedJaggedTensor
from torchrec_tpu.distributed import (
    ShardingEnv,
    construct_module_sharding_plan,
    row_wise,
    table_wise,
)
from torchrec_tpu.distributed.mc_embeddingbag import (
    ShardedManagedCollisionEmbeddingBagCollection,
)
from torchrec_tpu.modules import (
    EmbeddingBagCollection,
    EmbeddingBagConfig,
    ManagedCollisionCollection,
    ManagedCollisionEmbeddingBagCollection,
    MCHManagedCollisionModule,
)

WORLD = 8


def build():
    tables = [
        EmbeddingBagConfig(name="t0", num_embeddings=32, embedding_dim=16,
                           feature_names=["f0"]),
        EmbeddingBagConfig(name="t1", num_embeddings=16, embedding_dim=16,
                           feature_names=["f1"]),
    ]
    mcc = ManagedCollisionCollection(
        {
            "t0": MCHManagedCollisionModule(zch_size=32, history_size=64),
            "t1": MCHManagedCollisionModule(zch_size=16, history_size=64),
        },
        {"f0": "t0", "f1": "t1"},
    )
    return ManagedCollisionEmbeddingBagCollection(
        EmbeddingBagCollection(tables), mcc
    ), tables


def make_kjt(b=16, seed=0):
    rng = np.random.default_rng(seed)
    lens = rng.integers(0, 3, size=(2, b)).astype(np.int32)
    total = int(lens.sum())
    cap = 2 * b * 3
    vals = np.zeros(cap, np.int32)
    vals[:total] = rng.integers(0, 10**9, total)
    return KeyedJaggedTensor(
        keys=["f0", "f1"], values=jnp.asarray(vals), lengths=jnp.asarray(lens)
    )


def test_sharded_mc_matches_unsharded():
    mc_ebc, tables = build()
    env = ShardingEnv.from_devices(jax.devices()[:WORLD])
    plan = construct_module_sharding_plan(
        tables, {"t0": row_wise(), "t1": table_wise(3)}, env
    )
    smc = ShardedManagedCollisionEmbeddingBagCollection(mc_ebc, plan, env)

    uparams = mc_ebc.init(jax.random.key(0))
    sparams = smc.sharded_ebc.shard_params(uparams)
    ustates = mc_ebc.init_mc_state()
    sstates = smc.init_mc_state()

    kjt = make_kjt()
    # unsharded composition
    kt, uparams2, ustates2 = mc_ebc.apply(uparams, ustates, kjt, train=True)
    # sharded composition
    pooled, sparams2, sstates2 = smc.apply(sparams, sstates, kjt, train=True)

    np.testing.assert_allclose(
        np.asarray(pooled), np.asarray(kt.values()), rtol=1e-5, atol=1e-6
    )
    # MC states identical (replicated determinism)
    for t in ("t0", "t1"):
        np.testing.assert_array_equal(
            np.asarray(ustates2[t]["sorted_raw_ids"]),
            np.asarray(sstates2[t]["sorted_raw_ids"]),
        )
    # weights identical after eviction resets
    w_u = {
        t.name: np.asarray(mc_ebc.embedding_bag_collection.table_slice(uparams2, t.name))
        for t in tables
    }
    w_s = smc.sharded_ebc.unshard_params(sparams2)
    for name in w_u:
        np.testing.assert_allclose(w_u[name], w_s[name], rtol=1e-6,
                                   err_msg=name)

    # second batch exercises established-map remapping
    kjt2 = make_kjt(seed=1)
    kt2, _, ustates3 = mc_ebc.apply(uparams2, ustates2, kjt2, train=True)
    pooled2, _, sstates3 = smc.apply(sparams2, sstates2, kjt2, train=True)
    np.testing.assert_allclose(
        np.asarray(pooled2), np.asarray(kt2.values()), rtol=1e-5, atol=1e-6
    )


def build_ec():
    from torchrec_tpu.modules import (
        EmbeddingCollection,
        EmbeddingConfig,
        ManagedCollisionEmbeddingCollection,
    )

    tables = [
        EmbeddingConfig(name="t0", num_embeddings=32, embedding_dim=16,
                        feature_names=["f0"]),
        EmbeddingConfig(name="t1", num_embeddings=16, embedding_dim=16,
                        feature_names=["f1"]),
    ]
    mcc = ManagedCollisionCollection(
        {
            "t0": MCHManagedCollisionModule(zch_size=32, history_size=64),
            "t1": MCHManagedCollisionModule(zch_size=16, history_size=64),
        },
        {"f0": "t0", "f1": "t1"},
    )
    return ManagedCollisionEmbeddingCollection(
        EmbeddingCollection(tables), mcc
    ), tables


def _assert_jts_equal(out, ref, rtol=1e-5):
    assert set(out) == set(ref)
    for key in ref:
        n = int(np.asarray(ref[key].lengths()).sum())
        np.testing.assert_allclose(
            np.asarray(out[key].values())[:n],
            np.asarray(ref[key].values())[:n],
            rtol=rtol, atol=1e-6, err_msg=key,
        )


def test_sharded_mc_ec_matches_unsharded():
    """Sequence MC: sharded rows/states/weights == unsharded, two steps
    (reference distributed/mc_embedding.py:55)."""
    from torchrec_tpu.distributed.mc_embedding import (
        ShardedManagedCollisionEmbeddingCollection,
    )

    mc_ec, tables = build_ec()
    env = ShardingEnv.from_devices(jax.devices()[:WORLD])
    plan = construct_module_sharding_plan(
        tables, {"t0": row_wise(), "t1": table_wise(5)}, env
    )
    smc = ShardedManagedCollisionEmbeddingCollection(mc_ec, plan, env)

    uparams = mc_ec.init(jax.random.key(0))
    sparams = smc.sharded_ec.shard_params(uparams)
    ustates = mc_ec.init_mc_state()
    sstates = smc.init_mc_state()

    kjt = make_kjt()
    ref, uparams2, ustates2 = mc_ec.apply(uparams, ustates, kjt, train=True)
    out, sparams2, sstates2 = smc.apply(sparams, sstates, kjt, train=True)
    _assert_jts_equal(out, ref)
    for t in ("t0", "t1"):
        np.testing.assert_array_equal(
            np.asarray(ustates2[t]["sorted_raw_ids"]),
            np.asarray(sstates2[t]["sorted_raw_ids"]),
        )
    w_u = {
        t.name: np.asarray(
            mc_ec.embedding_collection.table_slice(uparams2, t.name)
        )
        for t in tables
    }
    w_s = smc.sharded_ec.unshard_params(sparams2)
    for name in w_u:
        np.testing.assert_allclose(w_u[name], w_s[name], rtol=1e-6,
                                   err_msg=name)

    kjt2 = make_kjt(seed=1)
    ref2, _, _ = mc_ec.apply(uparams2, ustates2, kjt2, train=True)
    out2, _, _ = smc.apply(sparams2, sstates2, kjt2, train=True)
    _assert_jts_equal(out2, ref2)


def test_sharded_mc_ec_eval_mode_state_frozen():
    from torchrec_tpu.distributed.mc_embedding import (
        ShardedManagedCollisionEmbeddingCollection,
    )

    mc_ec, tables = build_ec()
    env = ShardingEnv.from_devices(jax.devices()[:WORLD])
    plan = construct_module_sharding_plan(
        tables, {"t0": row_wise(), "t1": table_wise(2)}, env
    )
    smc = ShardedManagedCollisionEmbeddingCollection(mc_ec, plan, env)
    sparams = smc.sharded_ec.shard_params(mc_ec.init(jax.random.key(0)))
    sstates = smc.init_mc_state()
    kjt = make_kjt(seed=2)
    _, sparams1, sstates1 = smc.apply(sparams, sstates, kjt, train=True)
    _, sparams2, sstates2 = smc.apply(sparams1, sstates1, kjt, train=False)
    for t in ("t0", "t1"):
        np.testing.assert_array_equal(
            np.asarray(sstates1[t]["sorted_raw_ids"]),
            np.asarray(sstates2[t]["sorted_raw_ids"]),
        )
