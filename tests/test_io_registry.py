"""Parameter-server storage-plugin ABI (reference io_registry.cpp +
redis/redis_io.cpp).

Covers the built-in ``file`` backend (durable across a simulated process
restart), the scan/checkpoint walk, an externally-compiled plugin loaded
through ``register_io_plugin``, and the KV embedding tier running on a
durable backend end-to-end (evict -> restart -> restore).
"""

import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.dynamic_embedding import ParameterServer, register_io_plugin

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_memory_provider_is_default():
    ps = ParameterServer(4)
    ps.push(np.array([1, 2]), np.arange(8, dtype=np.float32).reshape(2, 4))
    out, hits = ps.pull(np.array([2, 3]))
    assert hits == 1
    np.testing.assert_array_equal(out[0], [4, 5, 6, 7])
    np.testing.assert_array_equal(out[1], 0)


def test_unknown_provider_raises():
    with pytest.raises(ValueError):
        ParameterServer(4, provider="no_such_backend")


def test_file_provider_survives_restart(tmp_path):
    log = str(tmp_path / "t.log")
    ps = ParameterServer(3, provider="file", config=log)
    gids = np.array([5, -17, 2**40])
    rows = np.arange(9, dtype=np.float32).reshape(3, 3)
    ps.push(gids, rows)
    # overwrite one row: last write must win after replay
    ps.push(np.array([5]), np.array([[9.0, 9.5, 10.0]], np.float32))
    del ps  # simulated process death

    ps2 = ParameterServer(3, provider="file", config=log)
    assert len(ps2) == 3
    out, hits = ps2.pull(gids)
    assert hits == 3
    np.testing.assert_array_equal(out[0], [9.0, 9.5, 10.0])
    np.testing.assert_array_equal(out[1:], rows[1:])


def test_scan_walks_whole_store(tmp_path):
    ps = ParameterServer(2, provider="file", config=str(tmp_path / "s.log"))
    gids = np.array([10, 20, 30])
    rows = np.arange(6, dtype=np.float32).reshape(3, 2)
    ps.push(gids, rows)
    sg, sr = ps.scan()
    order = np.argsort(sg)
    np.testing.assert_array_equal(sg[order], gids)
    np.testing.assert_array_equal(sr[order], rows)


def test_external_plugin_roundtrip(tmp_path):
    src = os.path.join(ROOT, "cpp", "dynamic_embedding", "io_plugin_example.cc")
    so = str(tmp_path / "libtde_dirstore.so")
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
         "-I", os.path.join(ROOT, "cpp", "dynamic_embedding"),
         "-o", so, src],
        check=True,
    )
    register_io_plugin(so)
    store = str(tmp_path / "rows")
    ps = ParameterServer(4, provider="dirstore", config=store)
    gids = np.array([3, -9])
    rows = np.arange(8, dtype=np.float32).reshape(2, 4)
    ps.push(gids, rows)
    assert len(ps) == 2
    del ps  # restart

    ps2 = ParameterServer(4, provider="dirstore", config=store)
    out, hits = ps2.pull(gids)
    assert hits == 2
    np.testing.assert_array_equal(out, rows)
    sg, sr = ps2.scan()
    order = np.argsort(sg)
    np.testing.assert_array_equal(sg[order], [-9, 3])


def test_kv_tier_on_durable_backend_restores_after_restart(tmp_path):
    from torchrec_tpu.modules import EmbeddingBagConfig
    from torchrec_tpu.modules.kv_embedding import (
        KeyValueEmbeddingBagCollection,
    )
    from torchrec_tpu.ops import RowWiseAdagrad
    from torchrec_tpu.sparse import KeyedJaggedTensor

    def make():
        tables = [
            EmbeddingBagConfig(
                name="t", num_embeddings=1 << 40, embedding_dim=8,
                feature_names=["f"],
            )
        ]
        kv = KeyValueEmbeddingBagCollection(
            tables, cache_rows={"t": 4},
            ps_provider="file",
            ps_config=str(tmp_path / "{table}.log"),
        )
        params = kv.init(jax.random.key(0))
        opt = RowWiseAdagrad(learning_rate=0.5)
        states = kv.init_optimizer(params, opt)
        return kv, params, opt, states

    def train(kv, params, opt, states, ids):
        lengths = np.ones((1, len(ids)), np.int32)
        vals, params, states = kv.transform(
            ["f"], np.asarray(ids, np.int64), lengths, params, states, opt
        )
        kjt = KeyedJaggedTensor(
            keys=["f"], values=jnp.asarray(vals),
            lengths=jnp.asarray(lengths),
        )
        kt = kv.apply(params, kjt)
        params, states = kv.apply_gradients(
            params, states, opt, kjt, jnp.ones_like(kt.values())
        )
        return params, states

    kv, params, opt, states = make()
    params, states = train(kv, params, opt, states, [111])
    slot = int(kv._idt["t"].transform(np.array([111], np.int64))[0][0])
    row_trained = np.asarray(kv._ebc.table_slice(params, "t"))[slot].copy()
    # flood: 111 is capacity-evicted -> spilled to the file-backed PS
    params, states = train(kv, params, opt, states, [1, 2, 3, 4])
    tier = kv.export_tier_state()
    del kv  # process "dies"; the PS log + tier state survive

    kv2, params2, opt2, states2 = make()
    kv2.restore_tier_state(tier)
    vals, params2, states2 = kv2.transform(
        ["f"], np.array([111], np.int64), np.ones((1, 1), np.int32),
        params2, states2, opt2,
    )
    row_back = np.asarray(kv2._ebc.table_slice(params2, "t"))[int(vals[0])]
    np.testing.assert_allclose(row_back, row_trained, rtol=1e-6)
