"""Sharded EmbeddingCollection (sequence/unpooled) equivalence oracle.

Reference analog: sequence-sharding tests under
torchrec/distributed/tests/test_sequence_model_parallel.py — same global
model + input, sharded vs unsharded per-id embedding rows and post-step
weights must match. Runs on the 8-virtual-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.distributed import (
    ShardedEmbeddingCollection,
    ShardingEnv,
    column_wise,
    construct_module_sharding_plan,
    data_parallel,
    row_wise,
    table_wise,
)
from torchrec_tpu.modules import EmbeddingCollection, EmbeddingConfig
from torchrec_tpu.ops import SGD, RowWiseAdagrad
from tests.utils import make_numpy_kjt, to_kjt

WORLD = 8


def build(dims=(128, 128, 256)):
    rows = [64, 40, 100]
    feature_names = [["f0", "f1"], ["f2"], ["f3"]]
    tables = [
        EmbeddingConfig(
            name=f"t{i}", num_embeddings=rows[i], embedding_dim=dims[i],
            feature_names=feature_names[i],
        )
        for i in range(3)
    ]
    ec = EmbeddingCollection(tables)
    params = ec.init(jax.random.key(0))
    rng = np.random.default_rng(7)
    feat_rows = {"f0": 64, "f1": 64, "f2": 40, "f3": 100}
    nk = make_numpy_kjt(
        rng, list(feat_rows), batch_size=WORLD * 2,
        num_embeddings=feat_rows, max_length=4,
    )
    kjt = to_kjt(nk, capacity=256)
    return ec, params, kjt, tables, nk


def env():
    return ShardingEnv.from_devices(jax.devices()[:WORLD], local_size=4)


PLANS = {
    "tw": lambda tables, e: construct_module_sharding_plan(
        tables, {"t0": table_wise(0), "t1": table_wise(3), "t2": table_wise(7)}, e
    ),
    "rw": lambda tables, e: construct_module_sharding_plan(
        tables, {t.name: row_wise() for t in tables}, e
    ),
    "cw": lambda tables, e: construct_module_sharding_plan(
        tables,
        {"t0": table_wise(1), "t1": table_wise(2), "t2": column_wise(ranks=[0, 4])},
        e,
    ),
    "dp_mix": lambda tables, e: construct_module_sharding_plan(
        tables, {"t0": data_parallel(), "t1": row_wise(), "t2": table_wise(5)}, e
    ),
}


@pytest.mark.parametrize("plan_name", list(PLANS))
def test_sequence_forward_equivalence(plan_name):
    ec, params, kjt, tables, nk = build()
    e = env()
    plan = PLANS[plan_name](tables, e)
    sec = ShardedEmbeddingCollection(ec, plan, e)
    sparams = sec.shard_params(params)

    ref = ec.apply(params, kjt)
    got = sec.apply(sparams, kjt)
    assert set(ref) == set(got)
    for key in ref:
        r, g = ref[key], got[key]
        np.testing.assert_array_equal(
            np.asarray(r.lengths()), np.asarray(g.lengths())
        )
        # compare only real (non-padding) rows
        n = int(np.asarray(r.lengths()).sum())
        np.testing.assert_allclose(
            np.asarray(g.values())[:n],
            np.asarray(r.values())[:n],
            rtol=1e-5,
            atol=1e-5,
        )


@pytest.mark.parametrize("plan_name", ["rw", "cw", "dp_mix"])
@pytest.mark.parametrize("opt_name", ["sgd", "adagrad"])
def test_sequence_train_step_equivalence(plan_name, opt_name):
    """One fused-optimizer step on a replicated stream cotangent must match
    the unsharded module's step row-for-row."""
    ec, params, kjt, tables, nk = build(dims=(128, 128, 128))
    e = env()
    plan = PLANS[plan_name](tables, e)
    sec = ShardedEmbeddingCollection(ec, plan, e)
    sparams = sec.shard_params(params)
    opt = SGD(learning_rate=0.1) if opt_name == "sgd" else RowWiseAdagrad(
        learning_rate=0.1
    )

    # stream-aligned cotangent: ones at valid slots (per class stream)
    kjt_mat = kjt.select_keys(sec.feature_names()).materialize()

    from jax import shard_map

    P = jax.sharding.PartitionSpec
    mesh = e.mesh
    param_specs = sec._param_specs()
    states = sec.init_optimizer(sparams, opt)
    state_specs = {
        k: jax.tree_util.tree_map(
            lambda v: P("shard", *([None] * (v.ndim - 1)))
            if not k.startswith("dp_")
            else P(),
            sub,
        )
        for k, sub in states.items()
    }

    def local(p, s, k):
        streams = sec.apply_local(p, k)
        cot = {ck: jnp.ones_like(v) for ck, v in streams.items()}
        return sec.apply_gradients_local(p, s, opt, k, cot)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(param_specs, state_specs, P()),
        out_specs=(param_specs, state_specs),
        check_vma=False,
    )
    new_sparams, _ = jax.jit(fn)(sparams, states, kjt_mat)
    got = sec.unshard_params(new_sparams)

    # unsharded reference step: same all-ones cotangent per feature row.
    # CW splits a row over shards with per-shard adagrad state, matching
    # FBGEMM per-shard semantics; with a full-row all-ones gradient the
    # rowwise mean-of-squares is identical per block, so rows still match.
    ustates = ec.init_optimizer(params, opt)
    # build per-slot grads: every valid slot of every feature gets ones
    from torchrec_tpu.ops.lookup import dedup_rows

    new_uparams = dict(params)
    for g in ec.groups:
        # gather all (ids, grads) for tables in this group
        ids_all, valid_all = [], []
        kjt_sel = kjt_mat
        b = kjt_sel.stride()
        f = len(ec.feature_names())
        seg = kjt_sel.segment_ids()
        slot_feature = jnp.minimum(seg // b, f)
        values = kjt_sel.values()
        pos = np.full(f + 1, -1, np.int32)
        roff = np.zeros(f + 1, np.int32)
        for fi in range(f):
            t = ec._tables[ec._feature_table[fi]]
            if t.name in g.table_names:
                i = g.table_names.index(t.name)
                pos[fi] = i
                roff[fi] = g.row_offsets[i]
        in_group = jnp.take(jnp.asarray(pos), slot_feature) >= 0
        ids_g = values + jnp.take(jnp.asarray(roff), slot_feature)
        valid = in_group & kjt_sel.valid_mask()
        grads = jnp.ones((values.shape[0], g.dim), jnp.float32)
        uids, ugrads = dedup_rows(ids_g, grads, valid, g.total_rows)
        tbl, st = opt.update(params[g.key], ustates[g.key], uids, ugrads)
        new_uparams[g.key] = tbl
    want = {t.name: np.asarray(ec.table_slice(new_uparams, t.name)) for t in ec._tables}

    for name in want:
        np.testing.assert_allclose(
            got[name], want[name], rtol=1e-5, atol=1e-5,
            err_msg=f"table {name} mismatch under {plan_name}/{opt_name}",
        )


def test_zero_batch_sequence():
    ec, params, kjt, tables, nk = build()
    e = env()
    plan = PLANS["rw"](tables, e)
    sec = ShardedEmbeddingCollection(ec, plan, e)
    sparams = sec.shard_params(params)
    zero = to_kjt(
        make_numpy_kjt(
            np.random.default_rng(0), ["f0", "f1", "f2", "f3"],
            batch_size=WORLD * 2,
            num_embeddings={"f0": 64, "f1": 64, "f2": 40, "f3": 100},
            max_length=0,
        ),
        capacity=64,
    )
    out = sec.apply(sparams, zero)
    for key, jt in out.items():
        assert int(np.asarray(jt.lengths()).sum()) == 0


@pytest.mark.parametrize("dim,dt_name", [
    (128, "fp32"), (256, "fp32"), (128, "bf16"),
])
def test_sequence_fast_tier_gate_equivalence(dim, dt_name, monkeypatch):
    """The fused kernel tier under SEQUENCE sharding (VERDICT r4 #6):
    an EC built with max_unique_gradient_rows routes the sharded
    backward through the segscan kernels on tile-row / pair-packed
    storage; results must match the plain-storage generic path."""
    from torchrec_tpu.distributed._layout import ShardedCollectionBase
    from torchrec_tpu.types import DataType

    monkeypatch.setattr(ShardedCollectionBase, "_SEGSCAN_TEST_CHUNK", 64)
    dt = DataType.BF16 if dt_name == "bf16" else DataType.FP32
    tol = 3e-2 if dt_name == "bf16" else 1e-5
    rows = [64, 20000]
    tables = [
        EmbeddingConfig(name="small", num_embeddings=rows[0],
                        embedding_dim=dim, feature_names=["fs"],
                        data_type=dt),
        EmbeddingConfig(name="big", num_embeddings=rows[1],
                        embedding_dim=dim, feature_names=["fb"],
                        data_type=dt),
    ]
    rng = np.random.default_rng(21)
    feat_rows = {"fs": 64, "fb": 20000}
    nk = make_numpy_kjt(
        rng, list(feat_rows), batch_size=WORLD * 2,
        num_embeddings=feat_rows, max_length=4,
    )
    kjt = to_kjt(nk, capacity=256)
    e = env()
    opt = RowWiseAdagrad(learning_rate=0.1)

    results = {}
    for fast in (False, True):
        ec = EmbeddingCollection(
            tables,
            max_unique_gradient_rows=256 if fast else None,
        )
        params = ec.init(jax.random.key(0))
        plan = construct_module_sharding_plan(
            tables, {"small": row_wise(), "big": row_wise()}, e
        )
        sec = ShardedEmbeddingCollection(ec, plan, e)
        if fast:
            assert any(c.scratch_rows > 0 for c in sec._classes)
            if dt_name == "bf16":
                assert any(c.packed for c in sec._classes)
            elif dim > 128:
                assert any(c.row_tiles == 2 for c in sec._classes)
        sparams = sec.shard_params(params)
        states = sec.init_optimizer(sparams, opt)
        kjt_mat = kjt.select_keys(sec.feature_names()).materialize()

        from jax import shard_map

        P = jax.sharding.PartitionSpec
        param_specs = sec._param_specs()
        state_specs = {
            k: jax.tree_util.tree_map(
                lambda v: P("shard", *([None] * (v.ndim - 1)))
                if not k.startswith("dp_")
                else P(),
                sub,
            )
            for k, sub in states.items()
        }
        cot_seed = jax.random.key(5)

        def local(p, s, k):
            streams = sec.apply_local(p, k)
            cot = {
                ck: jax.random.normal(cot_seed, v.shape, v.dtype)
                for ck, v in streams.items()
            }
            return sec.apply_gradients_local(p, s, opt, k, cot)

        fn = shard_map(
            local, mesh=e.mesh,
            in_specs=(param_specs, state_specs, P()),
            out_specs=(param_specs, state_specs),
            check_vma=False,
        )
        new_sparams, new_states = jax.jit(fn)(sparams, states, kjt_mat)
        results[fast] = (
            sec.unshard_params(new_sparams),
            sec.unshard_opt_states(new_states, opt, new_sparams),
            {k: np.asarray(v.values())
             for k, v in sec.apply(sparams, kjt).items()},
        )
    for name in ("small", "big"):
        np.testing.assert_allclose(
            results[True][0][name], results[False][0][name],
            rtol=tol, atol=tol, err_msg=name,
        )
        np.testing.assert_allclose(
            results[True][1][name]["momentum"],
            results[False][1][name]["momentum"],
            rtol=tol, atol=tol, err_msg=f"{name}.momentum",
        )
    for k in results[True][2]:
        np.testing.assert_allclose(
            results[True][2][k], results[False][2][k],
            rtol=tol, atol=tol, err_msg=k,
        )
