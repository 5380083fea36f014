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


def test_bucketized_pool_matches_psum_path():
    """Owner-exchange (O(ids) wire) pool lookup/update == the replicated
    psum form, for both pool kinds, including OOB ids and cross-device
    duplicate updates."""
    from torchrec_tpu.distributed.sharded_pool import (
        ShardedKeyedJaggedTensorPool,
    )

    rng = np.random.default_rng(0)
    env = ShardingEnv.from_devices(jax.devices()[:WORLD])
    pool = ShardedTensorPool(pool_size=40, dim=8, env=env)
    st = pool.init_state()
    n = 4 * WORLD  # batch-sharded: 4 ids per device
    ids = jnp.asarray(rng.integers(0, 44, size=n).astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    st_b, dropped = pool.update_bucketized(st, ids, rows, a2a_factor=float(WORLD))
    assert int(dropped) == 0
    got, dropped2 = pool.lookup_bucketized(st_b, ids, a2a_factor=float(WORLD))
    assert int(dropped2) == 0
    # oracle: last-writer-wins per id in EXCHANGE order is some valid
    # single writer; lookups of ids written exactly once must match, and
    # every looked-up row equals ONE of the written rows for that id
    ids_np, rows_np = np.asarray(ids), np.asarray(rows)
    got_np = np.asarray(got)
    for i, idv in enumerate(ids_np):
        if idv >= 40:
            np.testing.assert_allclose(got_np[i], 0.0)
            continue
        cands = rows_np[ids_np == idv]
        assert any(
            np.allclose(got_np[i], c) for c in cands
        ), f"id {idv}"
    # psum-form lookup agrees with the bucketized lookup on this state
    got_psum = pool.lookup(st_b, ids)
    np.testing.assert_allclose(got_np, np.asarray(got_psum), rtol=1e-6)

    # KJT pool
    kpool = ShardedKeyedJaggedTensorPool(
        pool_size=24, keys=("k1", "k2"), env=env, max_len=4
    )
    kst = kpool.init_state()
    kids = jnp.asarray(rng.permutation(24)[:n % 24 or n][:16].repeat(
        -(-n // 16))[:n].astype(np.int32))
    dense = jnp.asarray(
        rng.integers(0, 9, size=(n, 2, 4)).astype(np.int32)
    )
    lens = jnp.asarray(rng.integers(0, 5, size=(n, 2)).astype(np.int32))
    from jax import shard_map
    P = jax.sharding.PartitionSpec
    ax = env.shard_axis
    upd = shard_map(
        lambda s, i, dv, ln: kpool.update_local_bucketized(s, i, dv, ln, a2a_factor=float(WORLD)),
        mesh=env.mesh,
        in_specs=(kpool._specs(), P(ax), P(ax), P(ax)),
        out_specs=(kpool._specs(), P()),
        check_vma=False,
    )
    kst2, kdrop = jax.jit(upd)(kst, kids, dense, lens)
    assert int(kdrop) == 0
    look = shard_map(
        lambda s, i: kpool.lookup_local_bucketized(s, i, a2a_factor=float(WORLD)),
        mesh=env.mesh,
        in_specs=(kpool._specs(), P(ax)),
        out_specs=(P(ax), P(ax), P()),
        check_vma=False,
    )
    v, l, kdrop2 = jax.jit(look)(kst2, kids)
    assert int(kdrop2) == 0
    # psum-form lookup on the same state agrees
    v2, l2 = jax.jit(
        shard_map(
            lambda s, i: kpool.lookup_local(s, i),
            mesh=env.mesh,
            in_specs=(kpool._specs(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )(kst2, kids)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(l), np.asarray(l2))


def _collective_bytes(jaxpr) -> int:
    """Sum output bytes of collective primitives, recursively."""
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in (
            "all_to_all", "ragged_all_to_all", "psum", "all_gather",
            "reduce_scatter", "psum_invariant",
        ):
            for v in eqn.outvars:
                aval = v.aval
                total += int(
                    np.prod(aval.shape) * np.dtype(aval.dtype).itemsize
                )
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):
                total += _collective_bytes(sub.jaxpr)
            elif isinstance(sub, (list, tuple)):
                for s in sub:
                    if hasattr(s, "jaxpr"):
                        total += _collective_bytes(s.jaxpr)
    return total


def test_pool_bucketized_wire_cost_flat_in_world_size():
    """Comm-bytes accounting: the psum-form lookup's collective bytes
    grow ~linearly with world size (every row to every device) while the
    owner-exchange form's stay ~flat per device for the SAME global id
    count (VERDICT r3 #6 done-criterion)."""
    N = 64  # global ids per step

    def bytes_for(world, form):
        env = ShardingEnv.from_devices(jax.devices()[:world])
        pool = ShardedTensorPool(pool_size=256, dim=16, env=env)
        st = pool.init_state()
        from jax import shard_map
        P = jax.sharding.PartitionSpec
        if form == "psum":
            fn = shard_map(
                lambda s, i: pool.lookup_local(s, i),
                mesh=env.mesh, in_specs=(pool._specs(), P()),
                out_specs=P(), check_vma=False,
            )
        else:
            fn = shard_map(
                lambda s, i: pool.lookup_local_bucketized(s, i)[0],
                mesh=env.mesh,
                in_specs=(pool._specs(), P(env.shard_axis)),
                out_specs=P(env.shard_axis), check_vma=False,
            )
        ids = jnp.zeros((N,), jnp.int32)
        jx = jax.make_jaxpr(fn)(st, ids)
        # per-DEVICE bytes: shard_map body avals are per-device shapes
        return _collective_bytes(jx.jaxpr)

    psum4, psum8 = bytes_for(4, "psum"), bytes_for(8, "psum")
    b4, b8 = bytes_for(4, "bucketized"), bytes_for(8, "bucketized")
    # psum output is the full replicated [N, dim] stream on every device
    # at any world size; the bucketized exchange shrinks per-device as
    # the batch spreads (recv_cap ~ 2N/world)
    assert b8 <= b4, (b4, b8)
    assert b8 * 2 <= psum8, (b8, psum8)
