"""Sharded fused-kernel tier: the segscan backward + tile-row / pair-packed
storage UNDER SHARDING (round-5 port of the single-chip fast path — the
reference runs ONE TBE kernel stack for every sharding type,
torchrec/distributed/batched_embedding_kernel.py:3725 instantiated
per-shard by embedding_lookup.py:605).

Oracle: the unsharded EmbeddingBagCollection (its own fast paths are off
on CPU), same inputs, same cotangent — post-step weights must match.
Kernels run in interpret mode on the 8-device CPU mesh with a shrunk DMA
chunk (the production chunk unrolls a 1024-issue loop per class into the
traced graph — minutes of compile time under shard_map).
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
from torchrec_tpu.types import DataType, PoolingType
from tests.utils import make_numpy_kjt, to_kjt

WORLD = 8
WINDOW = 512  # max_unique_gradient_rows: >= every stream in these tests


@pytest.fixture(autouse=True)
def _small_chunk(monkeypatch):
    monkeypatch.setattr(
        ShardedEmbeddingBagCollection, "_SEGSCAN_TEST_CHUNK", 64
    )


def build(dims, data_type, pooling=PoolingType.SUM, weighted=False):
    """4 tables: t0/t1 small (dense-path prefix), t2/t3 large (segscan)."""
    rows = [64, 40, 20000, 30000]
    feature_names = [["f0", "f1"], ["f2"], ["f3"], ["f4"]]
    tables = [
        EmbeddingBagConfig(
            name=f"t{i}", num_embeddings=rows[i], embedding_dim=dims[i],
            feature_names=feature_names[i], pooling=pooling,
            data_type=data_type,
        )
        for i in range(4)
    ]
    ebc_ref = EmbeddingBagCollection(tables, is_weighted=weighted)
    ebc_fast = EmbeddingBagCollection(
        tables, is_weighted=weighted, max_unique_gradient_rows=WINDOW
    )
    params = ebc_ref.init(jax.random.key(0))
    rng = np.random.default_rng(42)
    feat_rows = {"f0": 64, "f1": 64, "f2": 40, "f3": 20000, "f4": 30000}
    nk = make_numpy_kjt(
        rng, list(feat_rows), batch_size=WORLD * 2,
        num_embeddings=feat_rows, max_length=5, weighted=weighted,
    )
    kjt = to_kjt(nk, capacity=256)
    return ebc_ref, ebc_fast, params, kjt, tables


def env():
    return ShardingEnv.from_devices(jax.devices()[:WORLD], local_size=4)


PLANS = {
    "table_wise": lambda: {
        "t0": table_wise(0), "t1": table_wise(3),
        "t2": table_wise(5), "t3": table_wise(7),
    },
    "row_wise": lambda: {
        "t0": row_wise(), "t1": row_wise(), "t2": row_wise(),
        "t3": row_wise(),
    },
    "column_wise": lambda: {
        "t0": column_wise(ranks=[0, 1]), "t1": column_wise(ranks=[2]),
        "t2": column_wise(ranks=[3, 4]), "t3": column_wise(ranks=[6]),
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

STORAGE = {
    # (dims, data_type, tolerance): plain-128, tile-row 256, pair bf16
    "fp32": ((128, 128, 128, 128), DataType.FP32, 1e-4),
    "fp32_wide": ((128, 256, 256, 128), DataType.FP32, 1e-4),
    "bf16": ((128, 128, 128, 128), DataType.BF16, 3e-2),
}


def _check_layout(sebc, strict=True):
    """Fast-tier storage must be ON for classes that can use it: any
    class holding a large-table shard at a supported width gets scratch
    + the matching storage form. (CW may split a 256-dim table into
    128-wide blocks; classes holding only small tables stay plain.)"""
    small_names = {"t0", "t1"}
    on = False
    for c in sebc._classes:
        has_large = any(
            name not in small_names
            for d in range(WORLD)
            for (name, *_rest) in c.packing[d]
        )
        supported = (
            c.data_type == DataType.BF16 and c.width == 128
        ) or (c.data_type == DataType.FP32 and c.width % 128 == 0)
        if has_large and supported:
            assert c.scratch_rows > 0, c.key
            on = True
            if c.data_type == DataType.BF16:
                assert c.packed
            elif c.width > 128:
                assert c.row_tiles == c.width // 128
    if strict:
        assert on, "no fast-tier class found"


def _run_case(plan_name, storage, opt, n_steps=1, weighted=False,
              pooling=PoolingType.SUM):
    dims, dt, tol = STORAGE[storage]
    ebc_ref, ebc_fast, params, kjt, tables = build(
        dims, dt, pooling=pooling, weighted=weighted
    )
    e = env()
    plan = construct_module_sharding_plan(tables, PLANS[plan_name](), e)
    total_dim = sum(ebc_ref.embedding_dims())
    b = kjt.stride()
    rng = np.random.default_rng(7)

    sebc = ShardedEmbeddingBagCollection(ebc_fast, plan, e)
    _check_layout(sebc, strict=False)
    sparams = sebc.shard_params(params)
    sstates = None
    ref_params, ref_states = params, None
    opt_obj = opt
    for step in range(n_steps):
        cot = jnp.asarray(
            rng.normal(size=(b, total_dim)).astype(np.float32)
        )
        # forward equivalence each step (step >= 1 catches scratch-tail
        # garbage leaking into lookups)
        exp = ebc_ref.apply(ref_params, kjt)
        got = sebc.apply(sparams, kjt)
        np.testing.assert_allclose(
            np.asarray(got.values()), np.asarray(exp.values()),
            rtol=tol, atol=tol,
        )
        if ref_states is None:
            ref_states = ebc_ref.init_optimizer(ref_params, opt_obj)
            sstates = sebc.init_optimizer(sparams, opt_obj)
        ref_params, ref_states = ebc_ref.apply_gradients(
            ref_params, ref_states, opt_obj, kjt, cot
        )
        cot_sh = jax.device_put(
            cot,
            jax.sharding.NamedSharding(
                e.mesh, jax.sharding.PartitionSpec("shard")
            ),
        )
        sparams, sstates = sebc.apply_gradients(
            sparams, sstates, opt_obj, kjt, cot_sh
        )
    got_tables = sebc.unshard_params(sparams)
    for t in tables:
        np.testing.assert_allclose(
            got_tables[t.name],
            np.asarray(ebc_ref.table_slice(ref_params, t.name)),
            rtol=tol, atol=tol, err_msg=t.name,
        )


@pytest.mark.parametrize(
    "plan_name,storage,opt_name",
    [
        ("row_wise", "fp32", "sgd"),
        ("row_wise", "fp32_wide", "rowwise_adagrad"),
        ("row_wise", "bf16", "sgd"),
        ("mixed", "fp32", "sgd"),
    ],
)
def test_fast_tier_step_equivalence(plan_name, storage, opt_name):
    opt = (
        SGD(learning_rate=0.1)
        if opt_name == "sgd"
        else RowWiseAdagrad(learning_rate=0.1)
    )
    _run_case(plan_name, storage, opt)


ROW_PRESERVING = ["table_wise", "row_wise", "table_row_wise"]
COLUMN_SPLITTING = ["column_wise", "mixed", "grid_shard"]


@pytest.mark.slow
@pytest.mark.parametrize(
    "plan_name,storage,opt_name",
    # SGD exact under every sharding; RowWiseAdagrad per-shard state is
    # exact only for row-preserving plans (same contract as the generic
    # tier, tests/test_sharded_embeddingbag.py)
    [
        (p, s, "sgd")
        for p in ROW_PRESERVING + COLUMN_SPLITTING
        for s in STORAGE
    ]
    + [(p, s, "rowwise_adagrad") for p in ROW_PRESERVING for s in STORAGE],
)
def test_fast_tier_step_equivalence_sweep(plan_name, storage, opt_name):
    opt = (
        SGD(learning_rate=0.1)
        if opt_name == "sgd"
        else RowWiseAdagrad(learning_rate=0.1)
    )
    _run_case(plan_name, storage, opt)


def test_fast_tier_two_steps_scratch_tail_stays_private():
    """The segscan backward parks sentinel writes in the scratch tail;
    step 2's forward and update must be unaffected by that garbage."""
    _run_case("row_wise", "fp32", SGD(learning_rate=0.1), n_steps=2)


@pytest.mark.slow
def test_fast_tier_two_steps_bf16_rowwise():
    _run_case(
        "row_wise", "bf16", RowWiseAdagrad(learning_rate=0.1), n_steps=2
    )


def test_fast_tier_weighted():
    _run_case("row_wise", "fp32", SGD(learning_rate=0.1), weighted=True)


@pytest.mark.slow
def test_fast_tier_mean_pooling():
    _run_case(
        "row_wise", "fp32", SGD(learning_rate=0.1),
        pooling=PoolingType.MEAN,
    )


@pytest.mark.slow
def test_fast_tier_bf16_stochastic_rounding():
    """SR streams differ between the sharded pair kernel (murmur counter
    hash) and the unsharded XLA path (fold_in bits) — both land within
    1 bf16 ulp of the exact fp32 update, so a 1-ulp tolerance holds."""
    _run_case(
        "row_wise", "bf16", SGD(learning_rate=0.1, stochastic_rounding=True)
    )


def test_fast_tier_bucketized_step():
    """The bucketized (KJT-all-to-all) backward through the same fused
    tier."""
    dims, dt, tol = STORAGE["fp32"]
    ebc_ref, ebc_fast, params, kjt, tables = build(dims, dt)
    e = env()
    plan = construct_module_sharding_plan(
        tables, PLANS["row_wise"](), e
    )
    opt = SGD(learning_rate=0.1)
    total_dim = sum(ebc_ref.embedding_dims())
    rng = np.random.default_rng(9)
    cot = jnp.asarray(
        rng.normal(size=(kjt.stride(), total_dim)).astype(np.float32)
    )
    ref_states = ebc_ref.init_optimizer(params, opt)
    ref_params, _ = ebc_ref.apply_gradients(
        params, ref_states, opt, kjt, cot
    )
    sebc = ShardedEmbeddingBagCollection(
        ebc_fast, plan, e, a2a_capacity_factor=8.0
    )
    _check_layout(sebc)
    sparams = sebc.shard_params(params)
    got, dropped = sebc.apply_bucketized(sparams, kjt, return_dropped=True)
    assert int(dropped) == 0
    exp = ebc_ref.apply(params, kjt)
    np.testing.assert_allclose(
        np.asarray(got.values()), np.asarray(exp.values()),
        rtol=tol, atol=tol,
    )
    sstates = sebc.init_optimizer(sparams, opt)
    cot_sh = jax.device_put(
        cot,
        jax.sharding.NamedSharding(
            e.mesh, jax.sharding.PartitionSpec("shard")
        ),
    )
    new_sparams, _ = sebc.apply_gradients_bucketized(
        sparams, sstates, opt, kjt, cot_sh
    )
    got_tables = sebc.unshard_params(new_sparams)
    for t in tables:
        np.testing.assert_allclose(
            got_tables[t.name],
            np.asarray(ebc_ref.table_slice(ref_params, t.name)),
            rtol=tol, atol=tol, err_msg=t.name,
        )


def test_fast_tier_layout_invariants():
    """Small-table shards pack FIRST on every device; storage shapes
    follow the class form; shard->unshard round-trips exactly."""
    dims, dt, _ = STORAGE["fp32_wide"]
    ebc_ref, ebc_fast, params, kjt, tables = build(dims, dt)
    e = env()
    plan = construct_module_sharding_plan(tables, PLANS["mixed"](), e)
    sebc = ShardedEmbeddingBagCollection(ebc_fast, plan, e)
    small_names = {t.name for t in tables if t.num_embeddings <= 16384}
    for c in sebc._classes:
        for d in range(WORLD):
            seen_large = False
            for name, _cs, _lo, _hi, brow in c.packing[d]:
                if name in small_names:
                    assert not seen_large, "small shard packed after large"
                    assert brow < c.small_rows_dev[d]
                else:
                    seen_large = True
                    assert brow >= c.small_rows_dev[d]
        assert c.small_rows_max == max(c.small_rows_dev)
        assert c.small_rows_dev == tuple(
            -(-r // 8) * 8 if r else 0 for r in c.small_rows_dev
        )
    sparams = sebc.shard_params(params)
    for c in sebc._classes:
        blob = sparams[c.key]
        if c.packed:
            assert blob.dtype == jnp.uint32
            assert blob.shape[1] == c.phys_rows // 2
        elif c.row_tiles > 1:
            assert blob.shape[1] == c.phys_rows * c.row_tiles
            assert blob.shape[2] == 128
        else:
            assert blob.shape[1] == c.phys_rows
    round_trip = sebc.unshard_params(sparams)
    for t in tables:
        np.testing.assert_allclose(
            round_trip[t.name],
            np.asarray(ebc_ref.table_slice(params, t.name)),
            rtol=1e-6, atol=1e-6,
        )


def test_fast_tier_colocated_rowwise_state(monkeypatch):
    """colocate_rowwise_state under SHARDING: the width class stores
    flat-small + interleaved-large (accumulator delta in lane 0 of the
    state rows) and the backward runs the colocated segscan kernel.
    Oracle: the unsharded PLAIN module (single-chip colo already pins
    colo==plain); state export must read the live blob lanes."""
    monkeypatch.setattr(
        ShardedEmbeddingBagCollection, "_SEGSCAN_TEST_CHUNK", 64
    )
    rng = np.random.default_rng(31)
    rows = [64, 20000]
    tables = [
        EmbeddingBagConfig(name="s", num_embeddings=rows[0],
                           embedding_dim=128, feature_names=["fs"]),
        EmbeddingBagConfig(name="l", num_embeddings=rows[1],
                           embedding_dim=128, feature_names=["fl"]),
    ]
    opt = RowWiseAdagrad(learning_rate=0.2, initial_accumulator_value=0.1)
    ebc_ref = EmbeddingBagCollection(tables)
    ebc = EmbeddingBagCollection(
        tables, max_unique_gradient_rows=WINDOW,
        colocate_rowwise_state=True,
    )
    params = ebc_ref.init(jax.random.key(0))
    feat_rows = {"fs": 64, "fl": 20000}
    nk = make_numpy_kjt(
        rng, list(feat_rows), batch_size=WORLD * 2,
        num_embeddings=feat_rows, max_length=5,
    )
    kjt = to_kjt(nk, capacity=256)
    b = kjt.stride()
    cot = jnp.asarray(rng.normal(size=(b, 256)).astype(np.float32))

    ref_states = ebc_ref.init_optimizer(params, opt)
    ref_params, ref_states = ebc_ref.apply_gradients(
        params, ref_states, opt, kjt, cot
    )
    ref_tbl = ebc_ref.materialize_optimizer_state(
        ref_params, ref_states, opt
    )

    e = env()
    plan = construct_module_sharding_plan(
        tables, {"s": row_wise(), "l": row_wise()}, e
    )
    sebc = ShardedEmbeddingBagCollection(ebc, plan, e)
    colo_classes = [c for c in sebc._classes if c.state_lanes]
    assert colo_classes, "colo class not built"
    c = colo_classes[0]
    per_table = {
        t.name: np.asarray(ebc_ref.table_slice(params, t.name))
        for t in tables
    }
    sparams = sebc.shard_from_tables(per_table)
    # storage shape: flat small + interleaved large (+ scratch)
    assert sparams[c.key].shape[1] == c.storage_rows
    # forward equivalence through the interleaved layout
    got = sebc.apply(sparams, kjt)
    exp = ebc_ref.apply(params, kjt)
    np.testing.assert_allclose(
        np.asarray(got.values()), np.asarray(exp.values()),
        rtol=1e-5, atol=1e-5,
    )
    sstates = sebc.init_optimizer(sparams, opt)
    cot_sh = jax.device_put(
        cot,
        jax.sharding.NamedSharding(
            e.mesh, jax.sharding.PartitionSpec("shard")
        ),
    )
    nsp, nss = sebc.apply_gradients(sparams, sstates, opt, kjt, cot_sh)
    got_tables = sebc.unshard_params(nsp)
    for t in tables:
        np.testing.assert_allclose(
            got_tables[t.name],
            np.asarray(ebc_ref.table_slice(ref_params, t.name)),
            rtol=1e-4, atol=1e-5, err_msg=t.name,
        )
    # state export reads the LIVE blob lanes
    got_tbl = sebc.unshard_opt_states(nss, opt, nsp)
    for name in ("s", "l"):
        np.testing.assert_allclose(
            got_tbl[name]["momentum"], ref_tbl[name]["momentum"],
            rtol=1e-4, atol=1e-5, err_msg=name,
        )
    # restore round trip re-interleaves the lanes
    sp2 = sebc.shard_from_tables(per_table)
    sp2, ss2 = sebc.shard_opt_states_from_tables(sp2, opt, got_tbl)
    back = sebc.unshard_opt_states(ss2, opt, sp2)
    for name in ("s", "l"):
        np.testing.assert_allclose(
            back[name]["momentum"], got_tbl[name]["momentum"],
            rtol=1e-6, err_msg=name,
        )

    # SGD on colocated storage must refuse loudly (no generic fallback)
    with pytest.raises(Exception, match="colocate"):
        sgd_states = sebc.init_optimizer(sparams, SGD(learning_rate=0.1))
        sebc.apply_gradients(
            sparams, sgd_states, SGD(learning_rate=0.1), kjt, cot_sh
        )
