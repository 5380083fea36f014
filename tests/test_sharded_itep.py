"""Sharded ITEP: sharded == unsharded pruning composition, pooled and
sequence, plus the pruning-bounds-lookup contract.

Reference analog: torchrec/distributed/tests/test_itep_embeddingbag.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu import KeyedJaggedTensor
from torchrec_tpu.distributed import (
    ShardingEnv,
    construct_module_sharding_plan,
    column_wise,
    row_wise,
    table_wise,
)
from torchrec_tpu.distributed.itep_embeddingbag import (
    ShardedITEPEmbeddingBagCollection,
    ShardedITEPEmbeddingCollection,
)
from torchrec_tpu.modules import (
    EmbeddingBagCollection,
    EmbeddingBagConfig,
    EmbeddingCollection,
    EmbeddingConfig,
    GenericITEPModule,
    ITEPEmbeddingBagCollection,
    ITEPEmbeddingCollection,
)

WORLD = 8
LOGICAL = 1000
PHYS = 16


def build_pooled():
    tables = [
        EmbeddingBagConfig(name="t0", num_embeddings=PHYS, embedding_dim=16,
                           feature_names=["f0"]),
        EmbeddingBagConfig(name="t1", num_embeddings=PHYS, embedding_dim=16,
                           feature_names=["f1"]),
    ]
    iteps = {
        "t0": GenericITEPModule(num_rows=LOGICAL, physical_rows=PHYS,
                                pruning_interval=2),
        "t1": GenericITEPModule(num_rows=LOGICAL, physical_rows=PHYS,
                                pruning_interval=3),
    }
    f2t = {"f0": "t0", "f1": "t1"}
    return ITEPEmbeddingBagCollection(
        EmbeddingBagCollection(tables), iteps, f2t
    ), tables


def build_seq():
    tables = [
        EmbeddingConfig(name="t0", num_embeddings=PHYS, embedding_dim=16,
                        feature_names=["f0"]),
        EmbeddingConfig(name="t1", num_embeddings=PHYS, embedding_dim=16,
                        feature_names=["f1"]),
    ]
    iteps = {
        "t0": GenericITEPModule(num_rows=LOGICAL, physical_rows=PHYS,
                                pruning_interval=2),
        "t1": GenericITEPModule(num_rows=LOGICAL, physical_rows=PHYS,
                                pruning_interval=3),
    }
    f2t = {"f0": "t0", "f1": "t1"}
    return ITEPEmbeddingCollection(
        EmbeddingCollection(tables), iteps, f2t
    ), tables


def make_kjt(b=8, seed=0):
    rng = np.random.default_rng(seed)
    lens = rng.integers(0, 3, size=(2, b)).astype(np.int32)
    total = int(lens.sum())
    cap = 2 * b * 3
    vals = np.zeros(cap, np.int32)
    vals[:total] = rng.integers(0, LOGICAL, total)
    return KeyedJaggedTensor(
        keys=["f0", "f1"], values=jnp.asarray(vals), lengths=jnp.asarray(lens)
    )


def test_sharded_itep_ebc_matches_unsharded():
    itep_ebc, tables = build_pooled()
    env = ShardingEnv.from_devices(jax.devices()[:WORLD])
    plan = construct_module_sharding_plan(
        tables, {"t0": row_wise(), "t1": table_wise(6)}, env
    )
    smc = ShardedITEPEmbeddingBagCollection(itep_ebc, plan, env)

    uparams = itep_ebc.init(jax.random.key(0))
    sparams = smc.sharded_ebc.shard_params(uparams)
    ustates = itep_ebc.init_itep_state()
    sstates = smc.init_itep_state()

    # several steps so both tables cross their pruning intervals
    for step in range(4):
        kjt = make_kjt(seed=step)
        kt, ustates = itep_ebc.apply(uparams, ustates, kjt, train=True)
        pooled, sstates = smc.apply(sparams, sstates, kjt, train=True)
        np.testing.assert_allclose(
            np.asarray(pooled), np.asarray(kt.values()),
            rtol=1e-5, atol=1e-6, err_msg=f"step {step}",
        )
    for t in ("t0", "t1"):
        np.testing.assert_array_equal(
            np.asarray(ustates[t]["remap"]), np.asarray(sstates[t]["remap"])
        )
        np.testing.assert_allclose(
            np.asarray(ustates[t]["row_util"]),
            np.asarray(sstates[t]["row_util"]),
            rtol=1e-6,
        )


def test_sharded_itep_ec_matches_unsharded():
    itep_ec, tables = build_seq()
    env = ShardingEnv.from_devices(jax.devices()[:WORLD])
    plan = construct_module_sharding_plan(
        tables, {"t0": column_wise(ranks=[1, 4]), "t1": row_wise()}, env
    )
    smc = ShardedITEPEmbeddingCollection(itep_ec, plan, env)

    uparams = itep_ec.init(jax.random.key(1))
    sparams = smc.sharded_ec.shard_params(uparams)
    ustates = itep_ec.init_itep_state()
    sstates = smc.init_itep_state()

    for step in range(3):
        kjt = make_kjt(seed=10 + step)
        ref, ustates = itep_ec.apply(uparams, ustates, kjt, train=True)
        out, sstates = smc.apply(sparams, sstates, kjt, train=True)
        assert set(out) == set(ref)
        for key in ref:
            n = int(np.asarray(ref[key].lengths()).sum())
            np.testing.assert_allclose(
                np.asarray(out[key].values())[:n],
                np.asarray(ref[key].values())[:n],
                rtol=1e-5, atol=1e-6, err_msg=f"step {step} {key}",
            )
    for t in ("t0", "t1"):
        np.testing.assert_array_equal(
            np.asarray(ustates[t]["remap"]), np.asarray(sstates[t]["remap"])
        )


def test_pruning_bounds_lookup_rows():
    """The pruning contract: remapped ids always land in the physical
    table ([0, physical_rows)), so per-device lookup work is bounded by
    the pruning budget — 1000 logical rows never touch more than 16."""
    from torchrec_tpu.modules.itep import itep_remap_kjt

    itep_ebc, tables = build_pooled()
    states = itep_ebc.init_itep_state()
    for step in range(5):
        kjt = make_kjt(seed=20 + step)
        remapped, states = itep_remap_kjt(
            itep_ebc.itep_modules, itep_ebc.feature_to_table, states, kjt,
            train=True,
        )
        vals = np.asarray(remapped.values())
        valid = np.asarray(remapped.valid_mask())
        assert (vals[valid] >= 0).all() and (vals[valid] < PHYS).all()
    # utilization was actually tracked (pruning has signal to act on)
    assert float(np.asarray(states["t0"]["row_util"]).sum()) > 0


def test_eval_mode_state_frozen():
    itep_ebc, tables = build_pooled()
    env = ShardingEnv.from_devices(jax.devices()[:WORLD])
    plan = construct_module_sharding_plan(
        tables, {"t0": row_wise(), "t1": table_wise(1)}, env
    )
    smc = ShardedITEPEmbeddingBagCollection(itep_ebc, plan, env)
    sparams = smc.sharded_ebc.shard_params(itep_ebc.init(jax.random.key(2)))
    sstates = smc.init_itep_state()
    kjt = make_kjt(seed=31)
    _, s1 = smc.apply(sparams, sstates, kjt, train=True)
    _, s2 = smc.apply(sparams, s1, kjt, train=False)
    for t in ("t0", "t1"):
        np.testing.assert_array_equal(
            np.asarray(s1[t]["remap"]), np.asarray(s2[t]["remap"])
        )
        assert int(np.asarray(s2[t]["iter"])) == int(np.asarray(s1[t]["iter"]))
