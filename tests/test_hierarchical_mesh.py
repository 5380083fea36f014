"""Hierarchical (host, chip) mesh: TWRW/GRID two-level collectives.

Reference analog: intra/cross-node process groups (torchrec/distributed/
comm.py:164) exploited by TWRW/GRID shardings (twrw_sharding.py:305,460:
bucketize + intra-host a2a in, intra-host reduce-scatter + cross-host dist
out). Here the shard world factorizes into a ``(host, chip)`` mesh and
batch reduce-scatters/all-gathers lower per axis (host leg first on the
way down) — bit-identical to the flat collective, so the same unsharded
oracle validates it, and the compiled HLO is checked for the two-level
structure the planner's cost model prices (planner/shard_estimators.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.distributed import (
    ShardedEmbeddingBagCollection,
    ShardedEmbeddingCollection,
    ShardingEnv,
    column_wise,
    construct_module_sharding_plan,
    grid_shard,
    row_wise,
    table_row_wise,
    table_wise,
)
from torchrec_tpu.modules import (
    EmbeddingBagCollection,
    EmbeddingBagConfig,
    EmbeddingCollection,
    EmbeddingConfig,
)
from torchrec_tpu.ops import SGD
from tests.utils import make_numpy_kjt, to_kjt

WORLD = 8


def build():
    rows = [64, 40, 100, 7]
    dims = (128, 128, 256, 128)
    feature_names = [["f0", "f1"], ["f2"], ["f3"], ["f4"]]
    tables = [
        EmbeddingBagConfig(
            name=f"t{i}", num_embeddings=rows[i], embedding_dim=dims[i],
            feature_names=feature_names[i],
        )
        for i in range(4)
    ]
    ebc = EmbeddingBagCollection(tables)
    params = ebc.init(jax.random.key(0))
    rng = np.random.default_rng(42)
    feat_rows = {"f0": 64, "f1": 64, "f2": 40, "f3": 100, "f4": 7}
    nk = make_numpy_kjt(
        rng, list(feat_rows), batch_size=WORLD * 2,
        num_embeddings=feat_rows, max_length=5,
    )
    return ebc, params, to_kjt(nk, capacity=512), tables


def henv():
    return ShardingEnv.from_devices(
        jax.devices()[:WORLD], local_size=4, hierarchical=True
    )


PLANS = {
    "twrw_grid": lambda: {
        "t0": table_row_wise(0), "t1": grid_shard(),
        "t2": table_row_wise(1), "t3": table_wise(5),
    },
    "mixed": lambda: {
        "t0": row_wise(), "t1": column_wise(ranks=[2, 6]),
        "t2": grid_shard(), "t3": table_row_wise(0),
    },
}


def test_env_factorization():
    e = henv()
    assert e.hierarchical
    assert e.world_size == 8 and e.num_hosts == 2
    assert e.host_axis == "host" and e.chip_axis == "chip"
    with pytest.raises(ValueError):
        ShardingEnv.from_devices(jax.devices()[:8], hierarchical=True)


@pytest.mark.parametrize("plan_name", list(PLANS))
def test_hierarchical_step_equivalence(plan_name):
    """Forward + fused step on the (host, chip) mesh match the unsharded
    oracle for both the replicated and the bucketized input dists."""
    ebc, params, kjt, tables = build()
    e = henv()
    plan = construct_module_sharding_plan(tables, PLANS[plan_name](), e)
    sebc = ShardedEmbeddingBagCollection(
        ebc, plan, e, a2a_capacity_factor=float(WORLD)
    )
    sp = sebc.shard_params(params)
    exp = ebc.apply(params, kjt)
    got = sebc.apply(sp, kjt)
    np.testing.assert_allclose(
        np.asarray(got.values()), np.asarray(exp.values()),
        rtol=1e-4, atol=1e-4,
    )
    got_b = sebc.apply_bucketized(sp, kjt)
    np.testing.assert_allclose(
        np.asarray(got_b.values()), np.asarray(exp.values()),
        rtol=1e-4, atol=1e-4,
    )
    opt = SGD(learning_rate=0.1)
    ns, _ = sebc.apply_gradients(
        sp, sebc.init_optimizer(sp, opt), opt, kjt,
        jnp.ones_like(exp.values()),
    )
    nu, _ = ebc.apply_gradients(
        params, ebc.init_optimizer(params, opt), opt, kjt,
        jnp.ones_like(exp.values()),
    )
    for t in tables:
        np.testing.assert_allclose(
            sebc.unshard_params(ns)[t.name],
            np.asarray(ebc.split_params(nu)[t.name]),
            rtol=1e-4, atol=1e-4,
        )


def test_hlo_has_two_level_reduce_scatter():
    """The compiled forward lowers each width class's output dist to TWO
    reduce-scatters (host leg then chip leg), not one flat collective."""
    from jax import shard_map

    P = jax.sharding.PartitionSpec
    ebc, params, kjt, tables = build()
    e = henv()
    plan = construct_module_sharding_plan(tables, PLANS["twrw_grid"](), e)
    sebc = ShardedEmbeddingBagCollection(ebc, plan, e)
    sp = sebc.shard_params(params)
    fn = shard_map(
        lambda p, k: sebc.apply_local(p, k), mesh=e.mesh,
        in_specs=(sebc._param_specs(), P()), out_specs=P(e.shard_axis),
        check_vma=False,
    )
    txt = jax.jit(fn).lower(sp, kjt).compile().as_text()
    n_classes = len(sebc._classes)
    assert txt.count("reduce-scatter(") >= 2 * n_classes


def test_sequence_hierarchical_equivalence():
    """Sequence (EC) path on the hierarchical mesh."""
    tables = [
        EmbeddingConfig(name="e0", num_embeddings=64, embedding_dim=128,
                        feature_names=["fe0"]),
        EmbeddingConfig(name="e1", num_embeddings=48, embedding_dim=128,
                        feature_names=["fe1"]),
    ]
    ec = EmbeddingCollection(tables)
    params = ec.init(jax.random.key(1))
    e = henv()
    plan = construct_module_sharding_plan(
        tables, {"e0": table_row_wise(0), "e1": row_wise()}, e
    )
    sec = ShardedEmbeddingCollection(ec, plan, e)
    sp = sec.shard_params(params)
    rng = np.random.default_rng(9)
    B = WORLD * 2
    from torchrec_tpu.sparse import KeyedJaggedTensor

    vals = np.concatenate(
        [rng.integers(0, 64, B * 2), rng.integers(0, 48, B * 2)]
    ).astype(np.int32)
    kjt = KeyedJaggedTensor(
        keys=["fe0", "fe1"], values=jnp.asarray(vals),
        lengths=jnp.full((2, B), 2, jnp.int32),
    )
    exp = ec.apply(params, kjt)
    got = sec.apply(sp, kjt)
    for k in exp:
        n = int(np.asarray(exp[k].lengths()).sum())
        np.testing.assert_allclose(
            np.asarray(got[k].values())[:n],
            np.asarray(exp[k].values())[:n],
            rtol=1e-5, atol=1e-5,
        )
