"""Feature processors, KT regroup, towers, ITEP, object pools.

Reference analogs: modules/tests/test_feature_processor_.py,
test_regroup (sparse tests), test_embedding_tower.py, test_itep_modules,
test_tensor_pool / test_keyed_jagged_tensor_pool.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu import KeyedJaggedTensor, KeyedTensor
from torchrec_tpu.modules import (
    EmbeddingBagCollection,
    EmbeddingBagConfig,
    EmbeddingTower,
    EmbeddingTowerCollection,
    FeatureProcessedEmbeddingBagCollection,
    GenericITEPModule,
    ITEPEmbeddingBagCollection,
    KeyedJaggedTensorPool,
    KTRegroupAsDict,
    PositionWeightedModule,
    PositionWeightedModuleCollection,
    TensorPool,
    regroup_kts,
)
from torchrec_tpu.sparse import JaggedTensor


def make_kjt(lens, vals, keys):
    cap = max(int(np.sum(lens)), 1)
    buf = np.zeros(cap, np.int32)
    buf[: len(vals)] = vals
    return KeyedJaggedTensor(
        keys=keys, values=jnp.asarray(buf), lengths=jnp.asarray(np.asarray(lens, np.int32))
    )


# ---------------------------------------------------------------- processors
def test_position_weighted_module_positions():
    m = PositionWeightedModule(max_feature_length=4)
    w = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    jt = JaggedTensor(
        values=jnp.asarray([10, 11, 12, 20, 30, 31], jnp.int32),
        lengths=jnp.asarray([3, 1, 2], jnp.int32),
    )
    out = m.apply(w, jt)
    np.testing.assert_allclose(
        np.asarray(out.weights()), [1, 2, 3, 1, 1, 2]
    )


def test_position_weighted_collection_and_fp_ebc():
    keys = ["f0", "f1"]
    lens = [[2, 1], [1, 2]]
    vals = [3, 4, 5, 1, 2, 0]
    kjt = make_kjt(lens, vals, keys)
    pwc = PositionWeightedModuleCollection({"f0": 3, "f1": 2})
    params = pwc.init(jax.random.key(0))
    params["position_weights.f0"] = jnp.asarray([2.0, 3.0, 4.0])
    params["position_weights.f1"] = jnp.asarray([5.0, 6.0])
    weighted = pwc.apply(params, kjt)
    np.testing.assert_allclose(
        np.asarray(weighted.weights()), [2, 3, 2, 5, 5, 6]
    )

    tables = [
        EmbeddingBagConfig(name="t", num_embeddings=8, embedding_dim=8,
                           feature_names=["f0", "f1"])
    ]
    ebc = EmbeddingBagCollection(tables, is_weighted=True)
    fp_ebc = FeatureProcessedEmbeddingBagCollection(ebc, pwc)
    full = fp_ebc.init(jax.random.key(1))
    full.update(params)
    kt = jax.jit(fp_ebc.apply)(full, kjt)
    # oracle: weighted sum with the position weights
    table = np.asarray(ebc.table_slice(full, "t"))
    want_f0_b0 = 2.0 * table[3] + 3.0 * table[4]
    np.testing.assert_allclose(
        np.asarray(kt.values())[0, :8], want_f0_b0, rtol=1e-5
    )
    # fp weight gradients flow
    g = fp_ebc.fp_grads(full, kjt, jnp.ones_like(kt.values()))
    assert g["position_weights.f0"].shape == (3,)
    assert float(jnp.abs(g["position_weights.f0"]).sum()) > 0


# ------------------------------------------------------------------ regroup
def test_regroup_kts_and_dict():
    kt1 = KeyedTensor(keys=["a", "b"], length_per_key=[2, 3],
                      values=jnp.arange(10.0).reshape(2, 5))
    kt2 = KeyedTensor(keys=["c"], length_per_key=[1],
                      values=jnp.asarray([[100.0], [200.0]]))
    groups = [["a", "c"], ["b"]]
    out = regroup_kts([kt1, kt2], groups)
    np.testing.assert_allclose(np.asarray(out[0]),
                               [[0, 1, 100], [5, 6, 200]])
    np.testing.assert_allclose(np.asarray(out[1]),
                               [[2, 3, 4], [7, 8, 9]])
    rg = KTRegroupAsDict(groups, ["x", "y"])
    d = rg([kt1, kt2])
    np.testing.assert_allclose(np.asarray(d["x"]), np.asarray(out[0]))
    with pytest.raises(KeyError):
        regroup_kts([kt1], [["missing"]])


# ------------------------------------------------------------------- towers
def test_embedding_tower_collection():
    def interaction_init(key):
        return {"w": jax.random.normal(key, (16, 4))}

    def interaction_apply(p, x):
        return x @ p["w"]

    towers = []
    for i in range(2):
        tables = [
            EmbeddingBagConfig(
                name=f"t{i}", num_embeddings=10, embedding_dim=16,
                feature_names=[f"f{i}"],
            )
        ]
        towers.append(
            EmbeddingTower(
                EmbeddingBagCollection(tables), interaction_init, interaction_apply
            )
        )
    tc = EmbeddingTowerCollection(towers)
    params = tc.init(jax.random.key(0))
    kjt = make_kjt([[1, 2], [2, 1]], [1, 2, 3, 4, 5, 6], ["f0", "f1"])
    out = jax.jit(tc.apply)(params, kjt)
    assert out.shape == (2, 8)


# --------------------------------------------------------------------- ITEP
def test_itep_remap_and_reselect():
    m = GenericITEPModule(num_rows=100, physical_rows=5, pruning_interval=2)
    st = m.init_state()
    # initially identity for rows < 4
    np.testing.assert_array_equal(
        np.asarray(m.remap(st, jnp.asarray([0, 3, 50], jnp.int32))), [0, 3, 4]
    )
    # make rows 50, 60 hot; after 2 steps they should own slots
    st = m.profile(st, jnp.asarray([50, 50, 60], jnp.int32))
    st = m.profile(st, jnp.asarray([50, 60, 60], jnp.int32))
    s = np.asarray(m.remap(st, jnp.asarray([50, 60], jnp.int32)))
    assert set(s) <= set(range(4))
    assert s[0] != s[1]


def test_itep_ebc_composition():
    phys = 8
    ebc = EmbeddingBagCollection([
        EmbeddingBagConfig(name="t", num_embeddings=phys, embedding_dim=16,
                           feature_names=["f"])
    ])
    itep = ITEPEmbeddingBagCollection(
        ebc,
        {"t": GenericITEPModule(num_rows=1000, physical_rows=phys,
                                pruning_interval=10)},
        {"f": "t"},
    )
    params = itep.init(jax.random.key(0))
    states = itep.init_itep_state()
    kjt = make_kjt([[2, 1]], [5, 900, 3], ["f"])
    kt, states2 = jax.jit(lambda p, s, k: itep.apply(p, s, k))(params, states, kjt)
    assert kt.values().shape == (2, 16)


# -------------------------------------------------------------------- pools
def test_tensor_pool_roundtrip():
    pool = TensorPool(pool_size=16, dim=4)
    st = pool.init_state()
    ids = jnp.asarray([3, 7, 15], jnp.int32)
    vals = jnp.arange(12.0).reshape(3, 4)
    st = pool.update(st, ids, vals)
    got = pool.lookup(st, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(vals))
    # out-of-range update is dropped
    st2 = pool.update(st, jnp.asarray([99], jnp.int32), jnp.ones((1, 4)))
    np.testing.assert_allclose(
        np.asarray(pool.lookup(st2, ids)), np.asarray(vals)
    )


def test_kjt_pool_roundtrip():
    pool = KeyedJaggedTensorPool(pool_size=8, keys=("a", "b"), max_len=4)
    st = pool.init_state()
    kjt = make_kjt([[2, 1], [3, 0]], [10, 11, 12, 20, 21, 22], ["a", "b"])
    ids = jnp.asarray([5, 2], jnp.int32)
    st = pool.update(st, ids, kjt)
    out = pool.lookup(st, ids)
    np.testing.assert_array_equal(np.asarray(out.lengths()), [[2, 1], [3, 0]])
    np.testing.assert_array_equal(
        np.asarray(out.values())[:6], [10, 11, 12, 20, 21, 22]
    )
    # single-row fetch
    one = pool.lookup(st, jnp.asarray([2], jnp.int32))
    np.testing.assert_array_equal(np.asarray(one.lengths()), [[1], [0]])
    np.testing.assert_array_equal(np.asarray(one.values())[:1], [12])


def test_tower_sharding_plan_colocates_tables():
    """Tower sharding: all tables of one tower land on the same rank
    (reference embedding_tower_sharding.py)."""
    from torchrec_tpu.distributed import ShardingEnv, tower_sharding_plan

    def i_init(key):
        return {"w": jax.random.normal(key, (16, 4))}

    def i_apply(p, x):
        return x @ p["w"]

    towers = []
    for i in range(3):
        tables = [
            EmbeddingBagConfig(name=f"t{i}_{j}", num_embeddings=100 * (i + 1),
                               embedding_dim=16, feature_names=[f"f{i}_{j}"])
            for j in range(2)
        ]
        towers.append(EmbeddingTower(
            EmbeddingBagCollection(tables), i_init, i_apply))
    env = ShardingEnv.from_devices(jax.devices()[:4])
    plan = tower_sharding_plan(towers, env)
    assert len(plan) == 6
    for i in range(3):
        r0 = plan[f"t{i}_0"].shards[0].rank
        r1 = plan[f"t{i}_1"].shards[0].rank
        assert r0 == r1, f"tower {i} split across ranks"
    # the three towers spread over different ranks (load balancing)
    ranks = {plan[f"t{i}_0"].shards[0].rank for i in range(3)}
    assert len(ranks) == 3


# ----------------------------------------------------- sharded tower colln
class _TestShardedTowers:
    """Shared fixture builder for sharded-tower tests."""

    @staticmethod
    def build(n_towers=3, dims=(16, 8, 16), outs=(4, 2, 3)):
        towers = []
        for i in range(n_towers):
            def i_init(key, out=outs[i], d=dims[i]):
                return {"w": jax.random.normal(key, (2 * d, out)) * 0.3,
                        "b": jnp.zeros((out,))}

            def i_apply(p, x):
                return jax.nn.relu(x @ p["w"]) + p["b"]

            tables = [
                EmbeddingBagConfig(
                    name=f"st{i}_{j}", num_embeddings=20 + 10 * i,
                    embedding_dim=dims[i], feature_names=[f"sf{i}_{j}"])
                for j in range(2)
            ]
            towers.append(EmbeddingTower(
                EmbeddingBagCollection(tables), i_init, i_apply))
        return towers


def test_sharded_tower_collection_matches_unsharded():
    """Sharded forward == EmbeddingTowerCollection oracle; params
    round-trip through shard/unshard (reference
    embedding_tower_sharding.py ShardedEmbeddingTowerCollection)."""
    from torchrec_tpu.distributed import (
        ShardedEmbeddingTowerCollection,
        ShardingEnv,
    )

    towers = _TestShardedTowers.build()
    etc = EmbeddingTowerCollection(towers)
    params = etc.init(jax.random.key(0))

    env = ShardingEnv.from_devices(jax.devices()[:4])
    setc = ShardedEmbeddingTowerCollection(towers, env)
    sparams = setc.shard_params(params)

    keys = [f"sf{i}_{j}" for i in range(3) for j in range(2)]
    lens = np.random.RandomState(0).randint(0, 3, size=(6, 8)).astype(np.int32)
    n = int(lens.sum())
    vals = np.random.RandomState(1).randint(0, 20, size=n).astype(np.int32)
    kjt = make_kjt(lens, vals, keys)

    want = np.asarray(etc.apply(params, kjt))
    got = np.asarray(setc.apply(sparams, kjt))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # round-trip: unshard must reproduce the original param dict
    back = setc.unshard_params(sparams)
    assert set(back) == set(params)
    for k in params:
        np.testing.assert_allclose(np.asarray(back[k]),
                                   np.asarray(params[k]), rtol=1e-6)

    # towers spread over ranks (placement actually distributes)
    assert len(set(setc._owner)) == 3


def test_sharded_tower_collection_grads_match():
    """jax.grad straight through the shard_mapped tower forward equals the
    unsharded oracle's grads (interaction params stay replicated-in-sync)."""
    from jax import shard_map

    from torchrec_tpu.distributed import (
        ShardedEmbeddingTowerCollection,
        ShardingEnv,
    )

    towers = _TestShardedTowers.build()
    etc = EmbeddingTowerCollection(towers)
    params = etc.init(jax.random.key(2))
    env = ShardingEnv.from_devices(jax.devices()[:4])
    setc = ShardedEmbeddingTowerCollection(towers, env)
    sparams = setc.shard_params(params)

    keys = [f"sf{i}_{j}" for i in range(3) for j in range(2)]
    lens = np.random.RandomState(3).randint(0, 3, size=(6, 8)).astype(np.int32)
    n = int(lens.sum())
    vals = np.random.RandomState(4).randint(0, 20, size=n).astype(np.int32)
    kjt = make_kjt(lens, vals, keys)

    def sharded_loss(p, k):
        out = setc.apply(p, k)  # [B, sum_out] batch-sharded
        return jnp.sum(out * out)

    def oracle_loss(p, k):
        out = etc.apply(p, k)
        return jnp.sum(out * out)

    g_sharded = jax.grad(sharded_loss)(sparams, kjt)
    g_oracle = jax.grad(oracle_loss)(params, kjt)

    # interaction grads compare directly (replicated layout)
    for k in g_oracle:
        if ".interaction." in k:
            np.testing.assert_allclose(
                np.asarray(g_sharded[k]), np.asarray(g_oracle[k]),
                rtol=1e-4, atol=1e-5)
    # embedding grads: map the blob cotangents back to per-table layout
    emb_g = {k: v for k, v in g_sharded.items() if not k.startswith("tower_")}
    tables_g = setc._sebc.unshard_params(emb_g)
    for i, tower in enumerate(towers):
        for t in tower.embedding._tables:
            want = np.asarray(tower.embedding.table_slice(
                {k[len(f"tower_{i}.embedding."):]: v
                 for k, v in g_oracle.items()
                 if k.startswith(f"tower_{i}.embedding.")}, t.name))
            np.testing.assert_allclose(
                tables_g[t.name], want, rtol=1e-4, atol=1e-5,
                err_msg=t.name)
