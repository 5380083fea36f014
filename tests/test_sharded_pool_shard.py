"""Sharded pools + composable shard() facade + benchmark harness smoke.

Reference analogs: distributed/tests/test_tensor_pool.py,
distributed/tests/test_shard.py (composable path).
"""

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.distributed import ShardingEnv
from torchrec_tpu.distributed.shard import shard, shard_modules
from torchrec_tpu.distributed.sharded_pool import ShardedTensorPool
from torchrec_tpu.modules import (
    EmbeddingBagCollection,
    EmbeddingBagConfig,
    EmbeddingCollection,
    EmbeddingConfig,
)

WORLD = 8


def test_sharded_tensor_pool_roundtrip():
    env = ShardingEnv.from_devices(jax.devices()[:WORLD])
    pool = ShardedTensorPool(pool_size=40, dim=8, env=env)
    st = pool.init_state()
    ids = jnp.asarray([0, 7, 13, 39], jnp.int32)
    rows = jnp.arange(32.0).reshape(4, 8)
    st = pool.update(st, ids, rows)
    got = pool.lookup(st, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(rows))
    # unwritten + OOB ids read zeros
    got2 = pool.lookup(st, jnp.asarray([5, 100], jnp.int32))
    np.testing.assert_allclose(np.asarray(got2), 0.0)


def test_composable_shard_facade():
    env = ShardingEnv.from_devices(jax.devices()[:WORLD])
    ebc = EmbeddingBagCollection([
        EmbeddingBagConfig(name="a", num_embeddings=64, embedding_dim=16,
                           feature_names=["fa"]),
    ])
    ec = EmbeddingCollection([
        EmbeddingConfig(name="b", num_embeddings=32, embedding_dim=16,
                        feature_names=["fb"]),
    ])
    out = shard_modules({"ebc": ebc, "ec": ec}, env)
    from torchrec_tpu.distributed import (
        ShardedEmbeddingBagCollection,
        ShardedEmbeddingCollection,
    )
    assert isinstance(out["ebc"], ShardedEmbeddingBagCollection)
    assert isinstance(out["ec"], ShardedEmbeddingCollection)
    params = out["ebc"].init(jax.random.key(0))
    assert params  # placed without error


def test_benchmark_harness_smoke():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from benchmarks.base import benchmark_func, benchmark_scanned

    r = benchmark_scanned(
        "smoke", lambda c, d: c + d["x"], jnp.zeros((8,)),
        {"x": jnp.ones((8,))}, iters=50,
    )
    assert r.ms_per_iter >= 0 and "smoke" in r.json_line()
    r2 = benchmark_func("host", lambda: sum(range(100)), iters=5)
    assert r2.ms_per_iter >= 0


def test_sharded_kjt_pool_vs_unsharded():
    """Sharded-vs-unsharded KJT pool equivalence incl. update-then-lookup
    and overwrite (reference distributed/tests/test_keyed_jagged_tensor_pool.py)."""
    from torchrec_tpu.distributed.sharded_pool import (
        ShardedKeyedJaggedTensorPool,
    )
    from torchrec_tpu.modules import KeyedJaggedTensorPool
    from torchrec_tpu.sparse import KeyedJaggedTensor

    env = ShardingEnv.from_devices(jax.devices()[:WORLD])
    keys = ("hist", "cat")
    ref = KeyedJaggedTensorPool(pool_size=40, keys=keys, max_len=4)
    sh = ShardedKeyedJaggedTensorPool(
        pool_size=40, keys=keys, env=env, max_len=4
    )
    st_ref = ref.init_state()
    st_sh = sh.init_state()

    rng = np.random.default_rng(5)

    def rand_kjt(b):
        lengths = rng.integers(0, 5, size=(2, b)).astype(np.int32)
        values = rng.integers(0, 1000, size=int(lengths.sum())).astype(
            np.int32
        )
        return KeyedJaggedTensor(
            keys=list(keys), values=jnp.asarray(values),
            lengths=jnp.asarray(lengths),
        )

    # two update rounds: second overwrites row 7 and writes new rows,
    # includes an OOB id (dropped by both)
    for ids in ([0, 7, 13, 39], [7, 22, 100, 5]):
        kjt = rand_kjt(len(ids))
        ids_a = jnp.asarray(ids, jnp.int32)
        st_ref = ref.update(st_ref, ids_a, kjt)
        st_sh = sh.update(st_sh, ids_a, kjt)

    probe = jnp.asarray([0, 5, 7, 13, 22, 39, 3], jnp.int32)
    got = sh.lookup(st_sh, probe)
    want = ref.lookup(st_ref, probe)
    assert got.keys() == want.keys()
    np.testing.assert_array_equal(
        np.asarray(got.lengths()), np.asarray(want.lengths())
    )
    # compare per-bag id lists (value streams have equal layout: both are
    # compacted feature-major)
    n = int(np.asarray(want.lengths()).sum())
    np.testing.assert_array_equal(
        np.asarray(got.values())[:n], np.asarray(want.values())[:n]
    )
    # truncation contract: bags longer than max_len are clipped
    long_kjt = KeyedJaggedTensor(
        keys=list(keys),
        values=jnp.arange(10, dtype=jnp.int32),
        lengths=jnp.asarray([[7], [3]], jnp.int32),
    )
    st_sh = sh.update(st_sh, jnp.asarray([2], jnp.int32), long_kjt)
    got2 = sh.lookup(st_sh, jnp.asarray([2], jnp.int32))
    assert np.asarray(got2.lengths())[0, 0] == 4
