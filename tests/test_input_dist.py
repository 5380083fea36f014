"""Bucketized (KJT-all-to-all) input distribution correctness.

Reference analog: torchrec RW/TW input dists
(torchrec/distributed/sharding/rw_sharding.py:361 RwSparseFeaturesDist,
torchrec/distributed/dist_data.py:1137 KJTAllToAll) — validated here the
same way the replicated path is: sharded-vs-unsharded numerical equivalence
on the 8-virtual-device CPU mesh, forward AND one fused-optimizer step,
plus the scaling property (per-device slot stream is O(global/W)) and the
capacity-overflow counter contract.
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
from torchrec_tpu.distributed.input_dist import shard_kjt_arrays
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.ops import SGD, RowWiseAdagrad
from torchrec_tpu.types import PoolingType
from tests.utils import make_numpy_kjt, to_kjt

WORLD = 8


def build(pooling=PoolingType.SUM, weighted=False):
    rows = [64, 40, 100, 7]
    dims = (128, 128, 256, 128)
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
    return ebc, params, to_kjt(nk, capacity=512), tables


def env():
    return ShardingEnv.from_devices(jax.devices()[:WORLD], local_size=4)


PLANS = {
    "table_wise": lambda: {
        "t0": table_wise(0), "t1": table_wise(3),
        "t2": table_wise(5), "t3": table_wise(7),
    },
    "row_wise": lambda: {
        "t0": row_wise(), "t1": row_wise(),
        "t2": row_wise(), "t3": row_wise(),
    },
    "mixed": lambda: {
        "t0": table_wise(2), "t1": row_wise(),
        "t2": column_wise(ranks=[0, 4]), "t3": data_parallel(),
    },
    "twrw_grid": lambda: {
        "t0": table_row_wise(0), "t1": grid_shard(),
        "t2": column_wise(ranks=[3, 4]), "t3": table_row_wise(1),
    },
    # the remaining pure families, matching the replicated-path oracle
    # sweep in tests/test_sharded_embeddingbag.py (7-family basis)
    "column_wise": lambda: {
        "t0": column_wise(ranks=[0, 1]), "t1": column_wise(ranks=[2]),
        "t2": column_wise(ranks=[3, 4]), "t3": column_wise(ranks=[6]),
    },
    "data_parallel": lambda: {
        "t0": data_parallel(), "t1": data_parallel(),
        "t2": data_parallel(), "t3": data_parallel(),
    },
    "grid_shard": lambda: {
        "t0": grid_shard(), "t1": table_wise(1),
        "t2": grid_shard(), "t3": row_wise(),
    },
}


def _sharded(ebc, tables, plan_name, **kw):
    e = env()
    plan = construct_module_sharding_plan(tables, PLANS[plan_name](), e)
    kw.setdefault("a2a_capacity_factor", float(WORLD))  # no-drop capacity
    return ShardedEmbeddingBagCollection(ebc, plan, e, **kw)


@pytest.mark.parametrize("plan_name", list(PLANS))
def test_bucketized_step_equivalence(plan_name):
    """Forward + one fused SGD step match the unsharded oracle."""
    ebc, params, kjt, tables = build()
    sebc = _sharded(ebc, tables, plan_name)
    sparams = sebc.shard_params(params)
    expected = ebc.apply(params, kjt)
    got = sebc.apply_bucketized(sparams, kjt)
    np.testing.assert_allclose(
        np.asarray(got.values()), np.asarray(expected.values()),
        rtol=1e-4, atol=1e-4,
    )
    opt = SGD(learning_rate=0.1)
    new_u, _ = ebc.apply_gradients(
        params, ebc.init_optimizer(params, opt), opt, kjt,
        jnp.ones_like(expected.values()),
    )
    new_s, _ = sebc.apply_gradients_bucketized(
        sparams, sebc.init_optimizer(sparams, opt), opt, kjt,
        jnp.ones_like(expected.values()),
    )
    exp_t = ebc.split_params(new_u)
    got_t = sebc.unshard_params(new_s)
    for t in tables:
        np.testing.assert_allclose(
            got_t[t.name], np.asarray(exp_t[t.name]), rtol=1e-4, atol=1e-4
        )


@pytest.mark.parametrize(
    "pooling,weighted",
    [(PoolingType.MEAN, False), (PoolingType.SUM, True)],
)
def test_bucketized_pooling_variants(pooling, weighted):
    ebc, params, kjt, tables = build(pooling=pooling, weighted=weighted)
    sebc = _sharded(ebc, tables, "mixed")
    sparams = sebc.shard_params(params)
    expected = ebc.apply(params, kjt)
    got = sebc.apply_bucketized(sparams, kjt)
    np.testing.assert_allclose(
        np.asarray(got.values()), np.asarray(expected.values()),
        rtol=1e-4, atol=1e-4,
    )
    opt = RowWiseAdagrad(learning_rate=0.1)
    new_s, _ = sebc.apply_gradients_bucketized(
        sparams, sebc.init_optimizer(sparams, opt), opt, kjt,
        jnp.ones_like(expected.values()),
    )
    new_u, _ = ebc.apply_gradients(
        params, ebc.init_optimizer(params, opt), opt, kjt,
        jnp.ones_like(expected.values()),
    )
    exp_t = ebc.split_params(new_u)
    got_t = sebc.unshard_params(new_s)
    for t in tables:
        np.testing.assert_allclose(
            got_t[t.name], np.asarray(exp_t[t.name]), rtol=1e-4, atol=1e-4
        )


def test_per_device_stream_scales_inverse_world():
    """THE scaling property: per-device exchanged slot capacity is
    O(global ids / W), not O(global ids) like the replicated path."""
    ebc, params, kjt, tables = build()
    sebc = _sharded(ebc, tables, "row_wise", a2a_capacity_factor=2.0)
    vals, lens, wts = shard_kjt_arrays(kjt, WORLD)
    cap_global = kjt.capacity
    cap_local = vals.shape[1]
    assert cap_local <= -(-cap_global // WORLD) + 8  # input is 1/W
    # the received (lookup/dedup) stream is factor * cap_local, still ~1/W
    # of the global stream the replicated path scans on every device
    for c in sebc._classes:
        recv_cap = int(2.0 * cap_local * c.max_blocks)
        recv_cap = -(-max(recv_cap, WORLD) // WORLD) * WORLD
        assert recv_cap * 2 < cap_global * c.max_blocks


def _build_ec():
    from torchrec_tpu.modules import EmbeddingCollection, EmbeddingConfig

    tables = [
        EmbeddingConfig(name="t0", num_embeddings=80, embedding_dim=128,
                        feature_names=["f0"]),
        EmbeddingConfig(name="t1", num_embeddings=64, embedding_dim=256,
                        feature_names=["f1"]),
        EmbeddingConfig(name="t2", num_embeddings=32, embedding_dim=128,
                        feature_names=["f2"]),
    ]
    ec = EmbeddingCollection(tables)
    params = ec.init(jax.random.key(0))
    rng = np.random.default_rng(5)
    B = WORLD * 2
    vals = np.concatenate([
        rng.integers(0, 80, B * 2), rng.integers(0, 64, B * 2),
        rng.integers(0, 32, B * 2),
    ]).astype(np.int32)
    from torchrec_tpu.sparse import KeyedJaggedTensor

    kjt = KeyedJaggedTensor(
        keys=["f0", "f1", "f2"], values=jnp.asarray(vals),
        lengths=jnp.full((3, B), 2, jnp.int32),
    )
    return ec, params, kjt, tables, vals


def test_sequence_bucketized_forward_equivalence():
    """EC a2a path (rw + cw + dp) matches the unsharded module on every
    feature's valid jagged window."""
    from torchrec_tpu.distributed import ShardedEmbeddingCollection

    ec, params, kjt, tables, _vals = _build_ec()
    e = env()
    plan = construct_module_sharding_plan(
        tables,
        {"t0": row_wise(), "t1": column_wise(ranks=[1, 5]),
         "t2": data_parallel()},
        e,
    )
    sec = ShardedEmbeddingCollection(ec, plan, e)
    sp = sec.shard_params(params)
    exp = ec.apply(params, kjt)
    got = sec.apply_bucketized(sp, kjt)
    for k in exp:
        n = int(np.asarray(exp[k].lengths()).sum())
        np.testing.assert_allclose(
            np.asarray(got[k].values())[:n],
            np.asarray(exp[k].values())[:n],
            rtol=1e-4, atol=1e-4,
        )


def test_sequence_bucketized_backward_numpy_oracle():
    """One fused SGD step through the a2a sequence path: every table row
    moves by exactly -lr * (times the id appeared), incl. the DP psum."""
    from jax import shard_map

    from torchrec_tpu.distributed import ShardedEmbeddingCollection

    P = jax.sharding.PartitionSpec
    ec, params, kjt, tables, vals = _build_ec()
    e = env()
    plan = construct_module_sharding_plan(
        tables,
        {"t0": row_wise(), "t1": column_wise(ranks=[1, 5]),
         "t2": data_parallel()},
        e,
    )
    sec = ShardedEmbeddingCollection(ec, plan, e)
    sp = sec.shard_params(params)
    opt = SGD(learning_rate=0.1)
    vals_s, lens_s, _w = shard_kjt_arrays(kjt.materialize(), WORLD)
    axis = e.shard_axis
    states = sec.init_optimizer(sp, opt)
    param_specs = sec._param_specs()
    state_specs = {
        k: jax.tree_util.tree_map(
            lambda v: P(axis, *([None] * (v.ndim - 1)))
            if not k.startswith("dp_") else P(),
            states[k],
        )
        for k in states
    }

    def body(p, s, v, l):
        v = v.reshape(v.shape[1:])
        l = l.reshape(l.shape[1:])
        streams, _ = sec.apply_local_bucketized(
            p, v, l, a2a_factor=float(WORLD)
        )
        cot = {k: jnp.ones_like(x) for k, x in streams.items()}
        return sec.apply_gradients_local_bucketized(
            p, s, opt, v, l, cot, a2a_factor=float(WORLD)
        )

    fn = shard_map(
        body, mesh=e.mesh,
        in_specs=(param_specs, state_specs, P(axis), P(axis)),
        out_specs=(param_specs, state_specs), check_vma=False,
    )
    new_sp, _ = jax.jit(fn)(sp, states, vals_s, lens_s)
    got = sec.unshard_params(new_sp)
    B = WORLD * 2
    for fi, t in enumerate(tables):
        T0 = np.asarray(ec.table_slice(params, t.name))
        counts = np.zeros(t.num_embeddings)
        for i in vals[fi * B * 2 : (fi + 1) * B * 2]:
            counts[i] += 1
        np.testing.assert_allclose(
            got[t.name], T0 - 0.1 * counts[:, None], rtol=1e-4, atol=1e-4
        )


def test_dmp_bucketized_matches_replicated():
    """DistributedModelParallel(input_dist='bucketized') reproduces the
    replicated-input step bit-for-bit-ish on the same batch and plan."""
    import optax

    from torchrec_tpu.distributed.model_parallel import (
        DistributedModelParallel,
    )
    from torchrec_tpu.models import DLRM
    from torchrec_tpu.datasets import RandomRecDataset

    tables = [
        EmbeddingBagConfig(
            name=f"t{i}", num_embeddings=64, embedding_dim=32,
            feature_names=[f"f{i}"],
        )
        for i in range(4)
    ]
    model = DLRM(
        embedding_bag_collection=EmbeddingBagCollection(tables),
        dense_in_features=13,
        dense_arch_layer_sizes=(64, 32),
        over_arch_layer_sizes=(64, 32),
    )
    e = env()
    plan = construct_module_sharding_plan(
        tables,
        {"t0": row_wise(), "t1": table_wise(1),
         "t2": column_wise(ranks=[0, 1]), "t3": data_parallel()},
        e,
    )
    emb_opt = RowWiseAdagrad(learning_rate=0.1)
    dense_tx = optax.sgd(0.01)
    ds = RandomRecDataset(
        keys=[f"f{i}" for i in range(4)], batch_size=4 * WORLD,
        hash_sizes=[64], num_dense=13, seed=3,
    )
    batch = next(iter(ds))

    losses = {}
    sparse_after = {}
    for mode in ("replicated", "bucketized"):
        dmp = DistributedModelParallel(
            model, e, plan, input_dist=mode,
            a2a_capacity_factor=float(WORLD),
        )
        state = dmp.init_train_state(jax.random.key(0), emb_opt, dense_tx)
        step = dmp.make_train_step(
            emb_optimizer=emb_opt, dense_tx=dense_tx, example_state=state
        )
        state, aux = step(state, dmp.prepare_batch(batch))
        losses[mode] = float(np.asarray(aux["loss"]))
        sparse_after[mode] = dmp.sharded_ebc.unshard_params(
            state.sparse_params
        )
        assert int(np.asarray(aux["a2a_dropped"])) == 0
    assert np.isclose(losses["replicated"], losses["bucketized"], rtol=1e-5)
    for name in sparse_after["replicated"]:
        np.testing.assert_allclose(
            sparse_after["bucketized"][name],
            sparse_after["replicated"][name],
            rtol=1e-4, atol=1e-4,
        )


def test_overflow_counter_and_exactness_when_capacity_tight():
    """Slots beyond receive capacity are DROPPED and counted (documented
    contract, like max_unique_gradient_rows): a table-wise plan
    concentrates every slot of a table on one device, so a small capacity
    factor must report drops; a no-drop factor reports zero."""
    ebc, params, kjt, tables = build()
    tight = _sharded(ebc, tables, "table_wise", a2a_capacity_factor=1.0)
    sparams = tight.shard_params(params)
    _, dropped = tight.apply_bucketized(sparams, kjt, return_dropped=True)
    assert int(dropped) > 0
    roomy = _sharded(ebc, tables, "table_wise")
    _, dropped0 = roomy.apply_bucketized(
        roomy.shard_params(params), kjt, return_dropped=True
    )
    assert int(dropped0) == 0
