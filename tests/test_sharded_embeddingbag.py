"""The canonical sharding correctness oracle: sharded vs unsharded
numerical equivalence, forward AND one fused-optimizer step.

Reference analog: sharding_single_rank_test_single_process
(torchrec/distributed/test_utils/test_sharding.py:775) — same global model,
same input, assert outputs and post-step weights match. Runs on the
8-virtual-device CPU mesh; sweeps sharding types x pooling x weighted.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
from torchrec_tpu.ops import RowWiseAdagrad, SGD
from torchrec_tpu.types import PoolingType
from tests.utils import make_numpy_kjt, to_kjt

WORLD = 8


def build(pooling=PoolingType.SUM, weighted=False, dims=(128, 128, 256, 128)):
    """4 tables: t0 (2 features), t1, t2 (wide), t3 (tiny)."""
    rows = [64, 40, 100, 7]
    feature_names = [["f0", "f1"], ["f2"], ["f3"], ["f4"]]
    tables = [
        EmbeddingBagConfig(
            name=f"t{i}", num_embeddings=rows[i], embedding_dim=dims[i],
            feature_names=feature_names[i], pooling=pooling,
        )
        for i in range(4)
    ]
    ebc = EmbeddingBagCollection(tables, is_weighted=weighted)
    params = ebc.init(jax.random.key(0))
    rng = np.random.default_rng(42)
    feat_rows = {"f0": 64, "f1": 64, "f2": 40, "f3": 100, "f4": 7}
    nk = make_numpy_kjt(
        rng, list(feat_rows), batch_size=WORLD * 2,
        num_embeddings=feat_rows, max_length=5, weighted=weighted,
    )
    kjt = to_kjt(nk, capacity=512)
    return ebc, params, kjt, tables


def env():
    return ShardingEnv.from_devices(jax.devices()[:WORLD], local_size=4)


PLANS = {
    "table_wise": lambda: {
        "t0": table_wise(0), "t1": table_wise(3),
        "t2": table_wise(5), "t3": table_wise(7),
    },
    "row_wise": lambda: {
        "t0": row_wise(), "t1": row_wise(), "t2": row_wise(), "t3": row_wise(),
    },
    "column_wise": lambda: {
        "t0": column_wise(ranks=[0, 1]), "t1": column_wise(ranks=[2]),
        "t2": column_wise(ranks=[3, 4]), "t3": column_wise(ranks=[6]),
    },
    "data_parallel": lambda: {
        "t0": data_parallel(), "t1": data_parallel(),
        "t2": data_parallel(), "t3": data_parallel(),
    },
    "table_row_wise": lambda: {
        "t0": table_row_wise(0), "t1": table_row_wise(1),
        "t2": table_row_wise(0), "t3": table_row_wise(1),
    },
    "grid_shard": lambda: {
        "t0": grid_shard(), "t1": table_wise(1),
        "t2": grid_shard(), "t3": row_wise(),
    },
    "mixed": lambda: {
        "t0": table_wise(2), "t1": row_wise(),
        "t2": column_wise(ranks=[0, 4]), "t3": data_parallel(),
    },
}


@pytest.mark.parametrize("plan_name", list(PLANS))
def test_forward_equivalence(plan_name):
    ebc, params, kjt, tables = build()
    e = env()
    plan = construct_module_sharding_plan(tables, PLANS[plan_name](), e)
    sebc = ShardedEmbeddingBagCollection(ebc, plan, e)
    sparams = sebc.shard_params(params)
    # round-trip check: shard -> unshard reproduces the tables
    round_trip = sebc.unshard_params(sparams)
    for t in tables:
        np.testing.assert_allclose(
            round_trip[t.name], np.asarray(ebc.table_slice(params, t.name)),
            rtol=1e-6,
        )
    expected = ebc.apply(params, kjt)
    got = sebc.apply(sparams, kjt)
    assert got.keys() == expected.keys()
    np.testing.assert_allclose(
        np.asarray(got.values()), np.asarray(expected.values()),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.parametrize("plan_name", ["row_wise", "mixed"])
@pytest.mark.parametrize("pooling,weighted", [
    (PoolingType.MEAN, False),
    (PoolingType.SUM, True),
])
def test_forward_equivalence_pooling_variants(plan_name, pooling, weighted):
    ebc, params, kjt, tables = build(pooling=pooling, weighted=weighted)
    e = env()
    plan = construct_module_sharding_plan(tables, PLANS[plan_name](), e)
    sebc = ShardedEmbeddingBagCollection(ebc, plan, e)
    sparams = sebc.shard_params(params)
    expected = ebc.apply(params, kjt)
    got = sebc.apply(sparams, kjt)
    np.testing.assert_allclose(
        np.asarray(got.values()), np.asarray(expected.values()),
        rtol=1e-4, atol=1e-4,
    )


ROW_PRESERVING = ["table_wise", "row_wise", "table_row_wise"]
COLUMN_SPLITTING = ["column_wise", "mixed", "grid_shard"]


@pytest.mark.parametrize(
    "plan_name,opt_name",
    # SGD is linear in the gradient: exact under every sharding.
    [(p, "sgd") for p in ROW_PRESERVING + COLUMN_SPLITTING]
    # RowWiseAdagrad state is per *local shard row*: under column splits the
    # state is per block (FBGEMM per-shard optimizer semantics), so exact
    # unsharded equality only holds for row-preserving shardings.
    + [(p, "rowwise_adagrad") for p in ROW_PRESERVING],
)
def test_train_step_equivalence(plan_name, opt_name):
    """One fused-optimizer step: post-step weights must match the unsharded
    update given the same output cotangent."""
    ebc, params, kjt, tables = build()
    e = env()
    opt = (
        SGD(learning_rate=0.1)
        if opt_name == "sgd"
        else RowWiseAdagrad(learning_rate=0.1)
    )
    total_dim = sum(ebc.embedding_dims())
    b = kjt.stride()
    rng = np.random.default_rng(7)
    cot_global = jnp.asarray(rng.normal(size=(b, total_dim)).astype(np.float32))

    # unsharded reference step
    ref_states = ebc.init_optimizer(params, opt)
    ref_params, _ = ebc.apply_gradients(params, ref_states, opt, kjt, cot_global)
    ref_tables = {t.name: np.asarray(ebc.table_slice(ref_params, t.name))
                  for t in tables}

    # sharded step (cotangent arrives batch-sharded)
    plan = construct_module_sharding_plan(tables, PLANS[plan_name](), e)
    sebc = ShardedEmbeddingBagCollection(ebc, plan, e)
    sparams = sebc.shard_params(params)
    sstates = sebc.init_optimizer(sparams, opt)
    cot_sharded = jax.device_put(
        cot_global,
        jax.sharding.NamedSharding(e.mesh, jax.sharding.PartitionSpec("shard")),
    )
    new_sparams, _ = sebc.apply_gradients(
        sparams, sstates, opt, kjt, cot_sharded
    )
    got_tables = sebc.unshard_params(new_sparams)
    for t in tables:
        np.testing.assert_allclose(
            got_tables[t.name], ref_tables[t.name], rtol=1e-4, atol=1e-4,
        )


def test_cw_rowwise_adagrad_placement_invariant():
    """Column-split rowwise-adagrad is per-block (FBGEMM per-shard state);
    the result must not depend on WHICH devices host the blocks."""
    ebc, params, kjt, tables = build()
    e = env()
    opt = RowWiseAdagrad(learning_rate=0.1)
    total_dim = sum(ebc.embedding_dims())
    rng = np.random.default_rng(9)
    cot = jnp.asarray(
        rng.normal(size=(kjt.stride(), total_dim)).astype(np.float32)
    )
    results = []
    for ranks in ([0, 1], [5, 2]):
        plan = construct_module_sharding_plan(
            tables,
            {"t0": column_wise(ranks=ranks), "t1": table_wise(4),
             "t2": column_wise(ranks=list(reversed(ranks))),
             "t3": table_wise(0)},
            e,
        )
        sebc = ShardedEmbeddingBagCollection(ebc, plan, e)
        sparams = sebc.shard_params(params)
        sstates = sebc.init_optimizer(sparams, opt)
        cot_sharded = jax.device_put(
            cot,
            jax.sharding.NamedSharding(
                e.mesh, jax.sharding.PartitionSpec("shard")
            ),
        )
        new_sparams, _ = sebc.apply_gradients(
            sparams, sstates, opt, kjt, cot_sharded
        )
        results.append(sebc.unshard_params(new_sparams))
    for t in tables:
        np.testing.assert_allclose(
            results[0][t.name], results[1][t.name], rtol=1e-5, atol=1e-6
        )


def test_uneven_table_wise_placement():
    """All tables piled on one rank still works (padding rows unused)."""
    ebc, params, kjt, tables = build()
    e = env()
    plan = construct_module_sharding_plan(
        tables, {f"t{i}": table_wise(2) for i in range(4)}, e
    )
    sebc = ShardedEmbeddingBagCollection(ebc, plan, e)
    got = sebc.apply(sebc.shard_params(params), kjt)
    expected = ebc.apply(params, kjt)
    np.testing.assert_allclose(
        np.asarray(got.values()), np.asarray(expected.values()),
        rtol=1e-4, atol=1e-4,
    )


def test_missing_table_in_plan_rejected():
    ebc, params, kjt, tables = build()
    e = env()
    with pytest.raises(ValueError):
        construct_module_sharding_plan(tables, {"t0": table_wise(0)}, e)


# ---------------------------------------------------------------------------
# VBE (variable batch per key) through the sharded paths.
# Reference: VariableBatchPooledEmbeddingsAllToAll (dist_data.py:1444) and
# the VBE parameterization of the sharding oracle (test_sharding.py:775).
# ---------------------------------------------------------------------------


def build_vbe(pooling=PoolingType.SUM, weighted=False, b_phys=8, b_out=16):
    """VBE KJT over the 4-table model: per-key dedup strides <= b_phys,
    inverse indices expand to a global output batch of b_out."""
    rows = [64, 40, 100, 7]
    feature_names = [["f0", "f1"], ["f2"], ["f3"], ["f4"]]
    tables = [
        EmbeddingBagConfig(
            name=f"t{i}", num_embeddings=rows[i], embedding_dim=128,
            feature_names=feature_names[i], pooling=pooling,
        )
        for i in range(4)
    ]
    ebc = EmbeddingBagCollection(tables, is_weighted=weighted)
    params = ebc.init(jax.random.key(0))
    rng = np.random.default_rng(3)
    feats = ["f0", "f1", "f2", "f3", "f4"]
    feat_rows = {"f0": 64, "f1": 64, "f2": 40, "f3": 100, "f4": 7}
    strides = {"f0": 4, "f1": b_phys, "f2": 3, "f3": 6, "f4": 2}
    lengths = np.zeros((5, b_phys), np.int32)
    vals = []
    for i, f in enumerate(feats):
        s = strides[f]
        lengths[i, :s] = rng.integers(0, 5, size=s)
        vals.append(
            rng.integers(0, feat_rows[f], size=int(lengths[i].sum()))
        )
    values = np.concatenate(vals).astype(np.int32)
    weights_arr = (
        jnp.asarray(
            rng.uniform(0.5, 1.5, size=values.shape[0]).astype(np.float32)
        )
        if weighted
        else None
    )
    inv = np.stack(
        [rng.integers(0, strides[f], size=b_out) for f in feats]
    ).astype(np.int32)
    from torchrec_tpu import KeyedJaggedTensor

    kjt = KeyedJaggedTensor(
        keys=feats,
        values=jnp.asarray(values),
        lengths=jnp.asarray(lengths),
        weights=weights_arr,
        stride_per_key=tuple(strides[f] for f in feats),
        inverse_indices=jnp.asarray(inv),
    )
    return ebc, params, kjt, tables


@pytest.mark.parametrize("plan_name", list(PLANS))
def test_vbe_forward_equivalence(plan_name):
    """VBE through the replicated sharded forward, all 7 plan families."""
    ebc, params, kjt, tables = build_vbe()
    e = env()
    plan = construct_module_sharding_plan(tables, PLANS[plan_name](), e)
    sebc = ShardedEmbeddingBagCollection(ebc, plan, e)
    expected = ebc.apply(params, kjt)
    got = sebc.apply(sebc.shard_params(params), kjt)
    assert got.values().shape == expected.values().shape
    np.testing.assert_allclose(
        np.asarray(got.values()), np.asarray(expected.values()),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.parametrize("pooling,weighted", [
    (PoolingType.MEAN, False),
    (PoolingType.SUM, True),
])
def test_vbe_forward_pooling_variants(pooling, weighted):
    ebc, params, kjt, tables = build_vbe(pooling=pooling, weighted=weighted)
    e = env()
    plan = construct_module_sharding_plan(tables, PLANS["mixed"](), e)
    sebc = ShardedEmbeddingBagCollection(ebc, plan, e)
    expected = ebc.apply(params, kjt)
    got = sebc.apply(sebc.shard_params(params), kjt)
    np.testing.assert_allclose(
        np.asarray(got.values()), np.asarray(expected.values()),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.parametrize("plan_name", list(PLANS))
def test_vbe_train_step_equivalence(plan_name):
    """VBE fused step: cotangent arrives over the OUTPUT batch; post-step
    weights must match the unsharded VBE update."""
    ebc, params, kjt, tables = build_vbe()
    e = env()
    opt = SGD(learning_rate=0.1)
    total_dim = sum(ebc.embedding_dims())
    b_out = kjt.inverse_indices().shape[1]
    rng = np.random.default_rng(11)
    cot = jnp.asarray(
        rng.normal(size=(b_out, total_dim)).astype(np.float32)
    )
    ref_states = ebc.init_optimizer(params, opt)
    ref_params, _ = ebc.apply_gradients(params, ref_states, opt, kjt, cot)
    ref_tables = {t.name: np.asarray(ebc.table_slice(ref_params, t.name))
                  for t in tables}

    plan = construct_module_sharding_plan(tables, PLANS[plan_name](), e)
    sebc = ShardedEmbeddingBagCollection(ebc, plan, e)
    sparams = sebc.shard_params(params)
    sstates = sebc.init_optimizer(sparams, opt)
    cot_sharded = jax.device_put(
        cot,
        jax.sharding.NamedSharding(
            e.mesh, jax.sharding.PartitionSpec("shard")
        ),
    )
    new_sparams, _ = sebc.apply_gradients(
        sparams, sstates, opt, kjt, cot_sharded
    )
    got_tables = sebc.unshard_params(new_sparams)
    for t in tables:
        np.testing.assert_allclose(
            got_tables[t.name], ref_tables[t.name], rtol=1e-4, atol=1e-4,
        )


@pytest.mark.parametrize("plan_name", ["table_wise", "row_wise", "mixed"])
def test_vbe_bucketized_forward_and_step(plan_name):
    """VBE through the bucketized input dist (padded exchange on CPU).

    VBE dedup batches are SKEWED across the batch split (every key's
    examples start at position 0, so low ranks hold the short keys'
    slots too) — the a2a capacity factor must absorb that skew, hence
    the explicit 8.0 here (the default 2.0 assumes a uniform batch)."""
    ebc, params, kjt, tables = build_vbe()
    e = env()
    opt = SGD(learning_rate=0.1)
    plan = construct_module_sharding_plan(tables, PLANS[plan_name](), e)
    sebc = ShardedEmbeddingBagCollection(
        ebc, plan, e, a2a_capacity_factor=8.0
    )
    sparams = sebc.shard_params(params)

    expected = ebc.apply(params, kjt)
    got, dropped = sebc.apply_bucketized(sparams, kjt, return_dropped=True)
    assert int(dropped) == 0
    np.testing.assert_allclose(
        np.asarray(got.values()), np.asarray(expected.values()),
        rtol=1e-4, atol=1e-4,
    )

    total_dim = sum(ebc.embedding_dims())
    b_out = kjt.inverse_indices().shape[1]
    rng = np.random.default_rng(13)
    cot = jnp.asarray(
        rng.normal(size=(b_out, total_dim)).astype(np.float32)
    )
    ref_states = ebc.init_optimizer(params, opt)
    ref_params, _ = ebc.apply_gradients(params, ref_states, opt, kjt, cot)
    ref_tables = {t.name: np.asarray(ebc.table_slice(ref_params, t.name))
                  for t in tables}
    sstates = sebc.init_optimizer(sparams, opt)
    cot_sharded = jax.device_put(
        cot,
        jax.sharding.NamedSharding(
            e.mesh, jax.sharding.PartitionSpec("shard")
        ),
    )
    new_sparams, _ = sebc.apply_gradients_bucketized(
        sparams, sstates, opt, kjt, cot_sharded
    )
    got_tables = sebc.unshard_params(new_sparams)
    for t in tables:
        np.testing.assert_allclose(
            got_tables[t.name], ref_tables[t.name], rtol=1e-4, atol=1e-4,
        )
