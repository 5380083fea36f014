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
