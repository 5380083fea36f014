"""Property-based sharding oracle sweeps (hypothesis).

Reference analog: torchrec/distributed/tests/test_sharding_plan.py:14-16 and
the hypothesis-driven matrices across distributed/tests (52 files import
hypothesis) — random sharding type x pooling x weighted x shapes must keep
the sharded program numerically identical to the unsharded module.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from torchrec_tpu.distributed import (
    ShardedEmbeddingBagCollection,
    ShardingEnv,
    column_wise,
    construct_module_sharding_plan,
    data_parallel,
    grid_shard,
    row_wise,
    table_row_wise,
    table_wise,
)
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.ops import SGD
from torchrec_tpu.types import PoolingType
from tests.utils import make_numpy_kjt, to_kjt

WORLD = 8


def _plan_for(kind: str, rank: int):
    return {
        "tw": lambda: table_wise(rank),
        "rw": lambda: row_wise(),
        "cw": lambda: column_wise(ranks=[rank % WORLD, (rank + 3) % WORLD]),
        "twrw": lambda: table_row_wise(host=rank % 2),
        "grid": lambda: grid_shard(),
        "dp": lambda: data_parallel(),
    }[kind]()


@pytest.mark.slow
@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["tw", "rw", "cw", "twrw", "grid", "dp"]),
            st.integers(8, 200),  # rows
            st.integers(0, 7),  # rank seed
        ),
        min_size=1,
        max_size=3,
    ),
    st.sampled_from([PoolingType.SUM, PoolingType.MEAN]),
    st.booleans(),  # weighted
    st.integers(0, 2**31 - 1),  # data seed
)
def test_random_plan_forward_equivalence(specs, pooling, weighted, seed):
    if weighted:
        pooling = PoolingType.SUM  # weighted EBC forces SUM (reference)
    tables = [
        EmbeddingBagConfig(
            name=f"t{i}",
            num_embeddings=rows,
            embedding_dim=128,  # CW needs lane-width blocks
            feature_names=[f"f{i}"],
            pooling=pooling,
        )
        for i, (kind, rows, _) in enumerate(specs)
    ]
    ebc = EmbeddingBagCollection(tables, is_weighted=weighted)
    params = ebc.init(jax.random.key(seed % 1000))
    env = ShardingEnv.from_devices(jax.devices()[:WORLD], local_size=4)
    plan = construct_module_sharding_plan(
        tables,
        {
            t.name: _plan_for(kind, rank)
            for t, (kind, _, rank) in zip(tables, specs)
        },
        env,
    )
    sebc = ShardedEmbeddingBagCollection(ebc, plan, env)
    sparams = sebc.shard_params(params)

    rng = np.random.default_rng(seed)
    nk = make_numpy_kjt(
        rng,
        [t.feature_names[0] for t in tables],
        batch_size=WORLD,
        num_embeddings={t.feature_names[0]: t.num_embeddings for t in tables},
        max_length=4,
        weighted=weighted,
    )
    kjt = to_kjt(nk, capacity=max(int(sum(len(b) for f in nk.ids.values() for b in f)), 8))

    ref = np.asarray(ebc.apply(params, kjt).values())
    got = np.asarray(sebc.apply(sparams, kjt).values())
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


@settings(max_examples=6, deadline=None)
@given(
    st.sampled_from(["tw", "rw", "cw"]),
    st.integers(0, 2**31 - 1),
)
def test_random_train_step_weight_equivalence(kind, seed):
    """Sharded fused-SGD step == unsharded step, row for row."""
    tables = [
        EmbeddingBagConfig(name="t", num_embeddings=96, embedding_dim=128,
                           feature_names=["f"]),
    ]
    ebc = EmbeddingBagCollection(tables)
    params = ebc.init(jax.random.key(seed % 997))
    env = ShardingEnv.from_devices(jax.devices()[:WORLD], local_size=4)
    plan = construct_module_sharding_plan(
        tables, {"t": _plan_for(kind, seed % WORLD)}, env
    )
    sebc = ShardedEmbeddingBagCollection(ebc, plan, env)
    sparams = sebc.shard_params(params)
    opt = SGD(learning_rate=0.1)
    sstates = sebc.init_optimizer(sparams, opt)
    ustates = ebc.init_optimizer(params, opt)

    rng = np.random.default_rng(seed)
    nk = make_numpy_kjt(rng, ["f"], batch_size=WORLD,
                        num_embeddings={"f": 96}, max_length=4)
    kjt = to_kjt(nk, capacity=64)

    kt = ebc.apply(params, kjt)
    cot = jnp.ones_like(kt.values())
    up, _ = ebc.apply_gradients(params, ustates, opt, kjt, cot)

    from jax import shard_map
    P = jax.sharding.PartitionSpec
    pspecs = sebc._param_specs()
    sspecs = {
        k: jax.tree_util.tree_map(lambda v: P("shard", *([None] * (v.ndim - 1))), v)
        for k, v in sstates.items()
    }

    def local(p, s, k):
        out = sebc.apply_local(p, k)
        return sebc.apply_gradients_local(
            p, s, opt, k, jnp.ones_like(out)
        )

    sp2, _ = jax.jit(shard_map(
        local, mesh=env.mesh, in_specs=(pspecs, sspecs, P()),
        out_specs=(pspecs, sspecs), check_vma=False,
    ))(sparams, sstates, kjt)

    w_ref = np.asarray(ebc.table_slice(up, "t"))
    w_got = sebc.unshard_params(sp2)["t"]
    np.testing.assert_allclose(w_got, w_ref, rtol=2e-4, atol=2e-5)
