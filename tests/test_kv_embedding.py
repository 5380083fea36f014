"""KeyValueEmbeddingBagCollection: host-backed cache tier.

Reference analogs: SSD/KVZCH kernel tests (KeyValueEmbeddingBag,
ZeroCollisionKeyValueEmbedding in batched_embedding_kernel.py) — rows
survive eviction to the host tier and come back with optimizer state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from torchrec_tpu import KeyedJaggedTensor
from torchrec_tpu.modules import EmbeddingBagConfig
from torchrec_tpu.modules.kv_embedding import KeyValueEmbeddingBagCollection
from torchrec_tpu.ops import RowWiseAdagrad


def make(cache=8):
    tables = [
        EmbeddingBagConfig(
            name="t", num_embeddings=1 << 40, embedding_dim=16,
            feature_names=["f"],
        )
    ]
    kv = KeyValueEmbeddingBagCollection(tables, cache_rows={"t": cache})
    params = kv.init(jax.random.key(0))
    opt = RowWiseAdagrad(learning_rate=0.5)
    states = kv.init_optimizer(params, opt)
    return kv, params, opt, states


def step(kv, params, opt, states, raw_ids):
    keys = ["f"]
    lengths = np.ones((1, len(raw_ids)), np.int32)
    vals, params, states = kv.transform(
        keys, np.asarray(raw_ids, np.int64), lengths, params, states, opt
    )
    kjt = KeyedJaggedTensor(
        keys=keys, values=jnp.asarray(vals), lengths=jnp.asarray(lengths)
    )
    kt = kv.apply(params, kjt)
    cot = jnp.ones_like(kt.values())
    params, states = kv.apply_gradients(params, states, opt, kjt, cot)
    return params, states, kt


def test_unbounded_ids_train_on_bounded_cache():
    kv, params, opt, states = make(cache=8)
    big_ids = [10**12, 10**15 + 3, 7]
    params, states, kt = step(kv, params, opt, states, big_ids)
    assert kt.values().shape == (3, 16)
    # rows moved away from init by the update
    vals0, _, _ = kv.transform(["f"], np.asarray(big_ids, np.int64),
                               np.ones((1, 3), np.int32), params, states, opt)
    assert (vals0 < 8).all()


def test_eviction_roundtrip_preserves_rows_and_state():
    kv, params, opt, states = make(cache=4)
    # train id A so its row + momentum are distinctive
    params, states, _ = step(kv, params, opt, states, [111])
    slot_a = int(kv.transform(["f"], np.array([111], np.int64),
                              np.ones((1, 1), np.int32), params, states, opt)[0][0])
    row_a = np.asarray(kv._ebc.table_slice(params, "t"))[slot_a].copy()
    g = kv._ebc.groups[0]
    mom_a = float(np.asarray(states[g.key]["momentum"])[slot_a])
    assert mom_a > 0

    # flood the cache with other hot ids until 111 is evicted
    for i in range(4):
        params, states, _ = step(kv, params, opt, states,
                                 [1000 + i, 2000 + i, 3000 + i, 4000 + i])

    # touching 111 again must bring back its exact row AND momentum
    vals, params, states = kv.transform(
        ["f"], np.array([111], np.int64), np.ones((1, 1), np.int32),
        params, states, opt,
    )
    slot_new = int(vals[0])
    row_back = np.asarray(kv._ebc.table_slice(params, "t"))[slot_new]
    np.testing.assert_allclose(row_back, row_a, rtol=1e-6)
    mom_back = float(np.asarray(states[g.key]["momentum"])[slot_new])
    np.testing.assert_allclose(mom_back, mom_a, rtol=1e-6)


def test_tier_checkpoint_roundtrip():
    kv, params, opt, states = make(cache=8)
    params, states, _ = step(kv, params, opt, states, [5, 6, 7])
    tier = kv.export_tier_state()
    kv2, _, _, _ = make(cache=8)
    kv2.restore_tier_state(tier)
    a, _, _ = kv.transform(["f"], np.array([5, 6, 7], np.int64),
                           np.ones((1, 3), np.int32), params, states, opt)
    b, _, _ = kv2.transform(["f"], np.array([5, 6, 7], np.int64),
                            np.ones((1, 3), np.int32), params, states, opt)
    np.testing.assert_array_equal(a, b)


def step_b(kv, params, opt, states, raw_ids, batched):
    keys = ["f"]
    lengths = np.ones((1, len(raw_ids)), np.int32)
    vals, params, states = kv.transform(
        keys, np.asarray(raw_ids, np.int64), lengths, params, states, opt,
        device_batched=batched,
    )
    kjt = KeyedJaggedTensor(
        keys=keys, values=jnp.asarray(vals), lengths=jnp.asarray(lengths)
    )
    kt = kv.apply(params, kjt)
    cot = jnp.ones_like(kt.values())
    params, states = kv.apply_gradients(params, states, opt, kjt, cot)
    return params, states, vals


def test_device_batched_transform_matches_eager():
    """The ONE-jitted-program transfer path (batched) is numerically
    identical to the eager per-table gather/scatter path across a workload
    with capacity evictions, fresh admits, and PS-history re-admits."""
    ea, pa, opt, sa = make(cache=4)
    eb, pb, _, sb = make(cache=4)
    batches = [
        [111, 7],
        [1000, 2000, 3000, 4000],   # floods the 4-slot cache, evicts
        [111],                      # back from PS history
        [5000, 6000, 7000],
        [111, 2000, 9000],
    ]
    for ids in batches:
        pa, sa, va = step_b(ea, pa, opt, sa, ids, batched=False)
        pb, sb, vb = step_b(eb, pb, opt, sb, ids, batched=True)
        np.testing.assert_array_equal(va, vb)
    g = ea._ebc.groups[0]
    np.testing.assert_allclose(
        np.asarray(pa[g.key]), np.asarray(pb[g.key]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sa[g.key]["momentum"]), np.asarray(sb[g.key]["momentum"]),
        rtol=1e-6,
    )
    # PS tiers agree on an evicted id's spilled row + optimizer column
    # (batched mode defers the push until the next transform/flush)
    eb.flush_spills()
    fa, _ = ea._ps["t"].pull(np.array([1000], np.int64))
    fb, _ = eb._ps["t"].pull(np.array([1000], np.int64))
    np.testing.assert_allclose(fa, fb, rtol=1e-6)


def test_fresh_rows_hash_host_device_bit_equal():
    from torchrec_tpu.modules.kv_embedding import _fresh_rows_hash

    gids = np.array([3, 1 << 40, (1 << 63) + 17], np.uint64)
    lo = (gids & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (gids >> np.uint64(32)).astype(np.uint32)
    host = _fresh_rows_hash(np, lo, hi, 16, np.float32(0.25))
    dev = np.asarray(
        jax.jit(lambda l, h: _fresh_rows_hash(jnp, l, h, 16, jnp.float32(0.25)))(
            jnp.asarray(lo), jnp.asarray(hi)
        )
    )
    np.testing.assert_array_equal(host.astype(np.float32), dev)
    assert (np.abs(host) <= 0.25).all()
    # distinct gids -> distinct rows
    assert np.abs(host[0] - host[1]).max() > 0


@pytest.mark.slow
@settings(max_examples=8, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    cache=st.sampled_from([4, 8, 16]),
    steps=st.integers(2, 6),
)
def test_batched_matches_eager_property(seed, cache, steps):
    """Random workloads (random batch sizes, id ranges spanning fresh
    admits, PS re-admits, and capacity evictions): the ONE-jitted-program
    batched transform is numerically identical to the eager path, and the
    PS tiers agree after a flush."""
    rng = np.random.default_rng(seed)
    ea, pa, opt, sa = make(cache=cache)
    eb, pb, _, sb = make(cache=cache)
    for _ in range(steps):
        n = int(rng.integers(1, cache + 1))
        # mix hot ids (re-admits) with a long tail (fresh + evictions),
        # dedup within the batch to respect transformer capacity
        ids = np.unique(
            rng.choice(
                np.concatenate([np.arange(5), rng.integers(100, 10_000, n)]),
                size=n, replace=False,
            )
        )
        pa, sa, va = step_b(ea, pa, opt, sa, ids, batched=False)
        pb, sb, vb = step_b(eb, pb, opt, sb, ids, batched=True)
        np.testing.assert_array_equal(va, vb)
    g = ea._ebc.groups[0]
    np.testing.assert_allclose(
        np.asarray(pa[g.key]), np.asarray(pb[g.key]), rtol=1e-6, atol=1e-7
    )
    eb.flush_spills()
    # spot-check PS agreement on ids the eager tier spilled
    seen_a = ea._ps["t"].scan()[0]
    for gid in np.asarray(seen_a, np.int64)[:8]:
        fa, _ = ea._ps["t"].pull(np.array([gid], np.int64))
        fb, _ = eb._ps["t"].pull(np.array([gid], np.int64))
        np.testing.assert_allclose(fa, fb, rtol=1e-6, atol=1e-7)
