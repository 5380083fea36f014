"""Model delta tracker + dynamic resharding tests.

Reference analogs: distributed/model_tracker/tests and
distributed/tests/test_dynamic_sharding.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu import KeyedJaggedTensor
from torchrec_tpu.distributed import (
    ShardedEmbeddingBagCollection,
    ShardingEnv,
    construct_module_sharding_plan,
    row_wise,
    table_wise,
)
from torchrec_tpu.distributed.model_tracker import ModelDeltaTracker, TrackingMode
from torchrec_tpu.distributed.resharding import reshard
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.ops import RowWiseAdagrad
from tests.utils import make_numpy_kjt, to_kjt

WORLD = 8


def test_delta_tracker_records_and_publishes():
    tracker = ModelDeltaTracker(
        table_rows={"t0": 100, "t1": 50},
        feature_to_table={"f0": "t0", "f1": "t1"},
        mode=TrackingMode.EMBEDDING,
    )
    st = tracker.init_state()
    lens = np.array([[2, 1], [1, 1]], np.int32)
    vals = np.array([7, 8, 7, 40, 41], np.int32)
    kjt = KeyedJaggedTensor(
        keys=["f0", "f1"], values=jnp.asarray(np.pad(vals, (0, 3))),
        lengths=jnp.asarray(lens),
    )
    st = jax.jit(tracker.record)(st, kjt)
    ids = tracker.get_delta_ids(st)
    np.testing.assert_array_equal(ids["t0"], [7, 8])
    np.testing.assert_array_equal(ids["t1"], [40, 41])
    # top-k keeps the hottest (7 touched twice)
    d = tracker.get_delta(
        st, table_weights={"t0": np.arange(200).reshape(100, 2),
                           "t1": np.zeros((50, 2))},
        top_k=1,
    )
    np.testing.assert_array_equal(d["t0"][0], [7])
    np.testing.assert_array_equal(d["t0"][1], [[14, 15]])
    st = tracker.reset()
    assert not tracker.get_delta_ids(st)["t0"].size


def test_reshard_moves_weights_and_state():
    tables = [
        EmbeddingBagConfig(name="a", num_embeddings=64, embedding_dim=16,
                           feature_names=["fa"]),
        EmbeddingBagConfig(name="b", num_embeddings=32, embedding_dim=16,
                           feature_names=["fb"]),
    ]
    ebc = EmbeddingBagCollection(tables)
    params = ebc.init(jax.random.key(0))
    env = ShardingEnv.from_devices(jax.devices()[:WORLD])
    plan_a = construct_module_sharding_plan(
        tables, {"a": table_wise(0), "b": row_wise()}, env
    )
    plan_b = construct_module_sharding_plan(
        tables, {"a": row_wise(), "b": table_wise(5)}, env
    )
    old = ShardedEmbeddingBagCollection(ebc, plan_a, env)
    new = ShardedEmbeddingBagCollection(ebc, plan_b, env)
    sp = old.shard_params(params)
    opt = RowWiseAdagrad(learning_rate=0.1)
    states = old.init_optimizer(sp, opt)
    # perturb momentum so the move is observable
    k0 = old._classes[0].key
    states[k0] = {
        "momentum": states[k0]["momentum"] + jnp.arange(
            states[k0]["momentum"].size, dtype=jnp.float32
        ).reshape(states[k0]["momentum"].shape)
    }

    new_sp, new_states = reshard(old, new, sp, states)

    # weights identical through the move
    w_old = old.unshard_params(sp)
    w_new = new.unshard_params(new_sp)
    for name in w_old:
        np.testing.assert_allclose(w_old[name], w_new[name], rtol=1e-6)

    # per-row momentum moved with its row: reconstruct per-table momentum
    def momentum_by_table(sebc, sts):
        out = {}
        for c in sebc._classes:
            m = np.asarray(jax.device_get(sts[c.key]["momentum"]))
            for d in range(WORLD):
                for name, col_start, row_lo, row_hi, brow in c.packing[d]:
                    arr = out.setdefault(name, np.zeros(64))
                    arr[row_lo:row_hi] = m[d, brow : brow + (row_hi - row_lo)]
        return out

    m_old = momentum_by_table(old, states)
    m_new = momentum_by_table(new, new_states)
    for name in m_old:
        np.testing.assert_allclose(
            m_old[name][: {"a": 64, "b": 32}[name]],
            m_new[name][: {"a": 64, "b": 32}[name]],
            err_msg=name,
        )

    # forward identical under the new placement
    rng = np.random.default_rng(0)
    nk = make_numpy_kjt(rng, ["fa", "fb"], batch_size=16,
                        num_embeddings={"fa": 64, "fb": 32}, max_length=3)
    kjt = to_kjt(nk, capacity=128)
    a = np.asarray(old.apply(sp, kjt).values())
    b = np.asarray(new.apply(new_sp, kjt).values())
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_reshard_column_resplit_cw2_to_cw4():
    """CW 2 blocks -> 4 blocks (and a 4 -> 2 merge back): weights move
    through column-interval intersection; the rowwise accumulator merges
    as the width-weighted mean (exact for mean-of-squares state)."""
    from torchrec_tpu.distributed import column_wise

    tables = [
        EmbeddingBagConfig(name="a", num_embeddings=48, embedding_dim=512,
                           feature_names=["fa"]),
    ]
    ebc = EmbeddingBagCollection(tables)
    params = ebc.init(jax.random.key(1))
    env = ShardingEnv.from_devices(jax.devices()[:WORLD])
    plan2 = construct_module_sharding_plan(
        tables, {"a": column_wise(ranks=[0, 3])}, env
    )
    plan4 = construct_module_sharding_plan(
        tables, {"a": column_wise(ranks=[1, 2, 5, 6])}, env
    )
    old = ShardedEmbeddingBagCollection(ebc, plan2, env)
    new = ShardedEmbeddingBagCollection(ebc, plan4, env)
    sp = old.shard_params(params)
    opt = RowWiseAdagrad(learning_rate=0.1)
    states = old.init_optimizer(sp, opt)
    # distinct per-(row, block) accumulators so the merge is observable
    for c in old._classes:
        m = states[c.key]["momentum"]
        states[c.key] = {
            "momentum": m + jnp.arange(m.size, dtype=jnp.float32).reshape(
                m.shape
            )
        }

    new_sp, new_states = reshard(old, new, sp, states)

    w_old = old.unshard_params(sp)
    w_new = new.unshard_params(new_sp)
    np.testing.assert_allclose(w_old["a"], w_new["a"], rtol=1e-6)

    # each new 8-col block inherits EXACTLY its parent 16-col block's
    # accumulator (pure split: weights 8/8 of one parent)
    def mom_by_block(sebc, sts):
        out = {}
        for c in sebc._classes:
            m = np.asarray(jax.device_get(sts[c.key]["momentum"]))
            for d in range(WORLD):
                for name, col_start, row_lo, row_hi, brow in c.packing[d]:
                    out[(col_start, c.width)] = m[
                        d, brow: brow + (row_hi - row_lo)
                    ]
        return out

    mo = mom_by_block(old, states)
    mn = mom_by_block(new, new_states)
    assert sorted(k[0] for k in mn) == [0, 128, 256, 384]
    for (col, wid), v in mn.items():
        parent = mo[(col - col % 256, 256)]
        np.testing.assert_allclose(v, parent, rtol=1e-6, err_msg=str(col))

    # forward identical under the new placement
    rng = np.random.default_rng(3)
    nk = make_numpy_kjt(rng, ["fa"], batch_size=16,
                        num_embeddings={"fa": 48}, max_length=3)
    kjt = to_kjt(nk, capacity=64)
    a = np.asarray(old.apply(sp, kjt).values())
    b = np.asarray(new.apply(new_sp, kjt).values())
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    # and merge BACK 4 -> 2: width-weighted mean of the two halves —
    # here both halves hold the parent value, so the merge returns it
    back_sp, back_states = reshard(new, old, new_sp, new_states)
    np.testing.assert_allclose(
        old.unshard_params(back_sp)["a"], w_old["a"], rtol=1e-6
    )
    mb = mom_by_block(old, back_states)
    for k, v in mo.items():
        np.testing.assert_allclose(mb[k], v, rtol=1e-6, err_msg=str(k))


def test_reshard_schedule_is_interval_granular():
    """Schedule building is O(shard runs), not O(table rows): a 45.8M-row
    synthetic packing builds its schedule in well under a second."""
    import time
    from types import SimpleNamespace

    from torchrec_tpu.distributed.resharding import _run_schedule

    world, rows, width = 8, 45_833_188, 128
    per = -(-rows // world)

    def cls(order):
        packing = {
            d: [("big", 0, dd * per, min((dd + 1) * per, rows), 0)]
            for d, dd in zip(range(world), order)
        }
        return SimpleNamespace(
            packing=packing, width=width, local_rows=per, key="k",
        )

    old = [cls(list(range(world)))]
    new = [cls(list(reversed(range(world))))]  # every shard moves
    t0 = time.perf_counter()
    plans = _run_schedule(old, new, world)
    dt = time.perf_counter() - t0
    runs = sum(len(v) for v in plans.values())
    assert runs == world  # one interval per shard, not 45.8M rows
    assert dt < 1.0, f"schedule took {dt:.3f}s"
