"""Sorted count-matmul kernel + the v3 shared-sort EBC path.

Reference analog: the histogram/counts passes of FBGEMM's TBE backward
(torchrec/distributed/batched_embedding_kernel.py:3725); here they are a
block-diagonal one-hot MXU matmul over an id-sorted slot stream
(ops/tbe_pallas.py::sorted_count_matrix) instead of scatters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.ops import SGD
from torchrec_tpu.ops.tbe_pallas import sorted_count_matrix
from torchrec_tpu.sparse import KeyedJaggedTensor


@pytest.mark.parametrize(
    "small,kb,n_small,n_large,weighted",
    [
        (1000, 64, 5000, 300, False),
        (3, 8, 50, 0, False),
        (700, 128, 4000, 100, True),
        (512, 64, 0, 100, False),  # no small slots
        (5000, 64, 2000, 0, False),
        (19454, 64, 8600, 2048, False),  # many row blocks
        (800, 32, 3000, 50, "frac"),  # fractional weights: two-limb bf16
    ],
)
def test_kernel_matches_oracle(small, kb, n_small, n_large, weighted):
    rng = np.random.default_rng(small + n_small)
    ids_small = rng.integers(0, small, size=n_small)
    ids = np.concatenate(
        [ids_small, rng.integers(small, small + 10_000, size=n_large)]
    ).astype(np.int32)
    cols = rng.integers(0, kb, size=ids.shape[0]).astype(np.int32)
    if weighted == "frac":
        w = rng.normal(size=ids.shape[0]).astype(np.float32)
    elif weighted:
        # integer weights stay exact through the two-limb bf16 split
        w = rng.integers(1, 4, size=ids.shape[0]).astype(np.float32)
    else:
        w = None
    order = np.argsort(ids, kind="stable")
    C = np.asarray(
        sorted_count_matrix(
            jnp.asarray(ids[order]),
            jnp.asarray(cols[order]),
            small,
            kb,
            jnp.asarray(w[order]) if w is not None else None,
            interpret=True,
        )
    )
    oracle = np.zeros((small, kb), np.float32)
    for i in range(n_small):
        oracle[ids[i], cols[i]] += w[i] if w is not None else 1.0
    assert C.shape == (small, kb)
    if weighted == "frac":
        np.testing.assert_allclose(C, oracle, rtol=1e-5, atol=1e-5)
    else:
        np.testing.assert_array_equal(C, oracle)


def test_kernel_empty_stream():
    C = np.asarray(
        sorted_count_matrix(
            jnp.zeros((0,), jnp.int32), jnp.zeros((0,), jnp.int32), 100, 16,
            interpret=True,
        )
    )
    assert C.shape == (100, 16) and np.abs(C).max() == 0.0


@pytest.fixture
def forced_v3():
    EmbeddingBagCollection._CM_IMPL = "v3"
    EmbeddingBagCollection._CM_FORCE_V3 = True
    yield
    EmbeddingBagCollection._CM_IMPL = "v3"
    EmbeddingBagCollection._CM_FORCE_V3 = False


def _mixed_ebc():
    rng = np.random.default_rng(3)
    tables = [
        EmbeddingBagConfig(
            name=f"t{i}", num_embeddings=r, embedding_dim=16,
            feature_names=[f"f{i}"],
        )
        for i, r in enumerate([50, 4000, 300_000, 7, 120_000])
    ]
    ebc = EmbeddingBagCollection(tables, max_unique_gradient_rows=600)
    params = ebc.init(jax.random.key(1))
    B = 8
    keys = [f"f{i}" for i in range(5)]
    lengths = rng.integers(0, 6, size=(5 * B,)).astype(np.int32)
    vals = np.concatenate(
        [
            rng.integers(
                0, tables[i].num_embeddings,
                size=int(lengths[i * B: (i + 1) * B].sum()),
            )
            for i in range(5)
        ]
    ).astype(np.int32)
    kjt = KeyedJaggedTensor.from_lengths(
        keys, jnp.asarray(vals), jnp.asarray(lengths)
    )
    cot = jnp.asarray(rng.normal(size=(B, 5 * 16)).astype(np.float32))
    return ebc, params, kjt, cot, B, keys


def test_v3_matches_v2_forward_and_gradients(forced_v3):
    ebc, params, kjt, cot, _, _ = _mixed_ebc()
    opt = SGD(learning_rate=0.1)
    states = ebc.init_optimizer(params, opt)
    res = {}
    for impl, force in [("v2", False), ("v3", True)]:
        EmbeddingBagCollection._CM_IMPL = impl
        EmbeddingBagCollection._CM_FORCE_V3 = force
        out = np.asarray(ebc.apply(params, kjt).values())
        p2, s2 = ebc.apply_gradients(params, states, opt, kjt, cot)
        res[impl] = (out, jax.tree.map(np.asarray, (p2, s2)))
    np.testing.assert_allclose(res["v2"][0], res["v3"][0], atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
        res["v2"][1], res["v3"][1],
    )


def test_v3_zero_batch(forced_v3):
    ebc, params, kjt, cot, B, keys = _mixed_ebc()
    opt = SGD(learning_rate=0.1)
    states = ebc.init_optimizer(params, opt)
    kjt0 = KeyedJaggedTensor.from_lengths(
        keys, jnp.zeros((0,), jnp.int32), jnp.zeros((5 * B,), jnp.int32)
    )
    out0 = np.asarray(ebc.apply(params, kjt0).values())
    assert np.abs(out0).max() == 0.0
    p0, _ = ebc.apply_gradients(params, states, opt, kjt0, cot)
    for k in p0:
        np.testing.assert_array_equal(np.asarray(p0[k]), np.asarray(params[k]))


def test_v3_gate_coverage(forced_v3):
    """Weighted EBCs and multi-feature tables take v3 (weights and count
    columns ride the sort as payloads); only a missing max_unique still
    falls back to v2."""
    tables = [
        EmbeddingBagConfig(
            name="t0", num_embeddings=100, embedding_dim=8,
            feature_names=["f0", "f0b"],
        )
    ]
    ebc = EmbeddingBagCollection(
        tables, is_weighted=True, max_unique_gradient_rows=64
    )
    assert ebc._cm_impl(0, jnp.ones((4,))) == "v3"
    assert ebc._cm_impl(0, None) == "v3"  # forced on CPU by the fixture
    # multi-feature tables use the per-table matmul small path (the fused
    # plan's block entries carry one feature per table)
    assert not ebc._use_small_fused(0, 8)
    no_bound = EmbeddingBagCollection(tables, is_weighted=True)
    assert no_bound._cm_impl(0, None) == "v2"


@pytest.mark.parametrize("weighted", [False, True])
def test_v3_matches_v2_multi_feature(forced_v3, weighted):
    """Tables with >1 feature through the v3 shared-sort path: the count
    column (feat_local * b + batch) rides the sort as a payload, the count
    matrix widens to k*B columns, and forward/backward match v2 (reference
    contract: multiple features per table through one TBE,
    torchrec/distributed/embedding_lookup.py:605)."""
    rng = np.random.default_rng(17)
    tables = [
        EmbeddingBagConfig(
            name="t0", num_embeddings=60, embedding_dim=16,
            feature_names=["a0", "a1", "a2"],
        ),
        EmbeddingBagConfig(
            name="t1", num_embeddings=3000, embedding_dim=16,
            feature_names=["b0"],
        ),
        EmbeddingBagConfig(
            name="t2", num_embeddings=250_000, embedding_dim=16,
            feature_names=["c0", "c1"],
        ),
    ]
    feats = ["a0", "a1", "a2", "b0", "c0", "c1"]
    feat_rows = [60, 60, 60, 3000, 250_000, 250_000]
    ebc = EmbeddingBagCollection(
        tables, is_weighted=weighted, max_unique_gradient_rows=600
    )
    assert ebc._max_feats_per_table == 3
    params = ebc.init(jax.random.key(4))
    B = 8
    lengths = rng.integers(0, 5, size=(len(feats) * B,)).astype(np.int32)
    vals = np.concatenate(
        [
            rng.integers(
                0, feat_rows[i],
                size=int(lengths[i * B: (i + 1) * B].sum()),
            )
            for i in range(len(feats))
        ]
    ).astype(np.int32)
    w = (
        jnp.asarray(rng.normal(size=vals.shape[0]).astype(np.float32))
        if weighted else None
    )
    kjt = KeyedJaggedTensor.from_lengths(
        feats, jnp.asarray(vals), jnp.asarray(lengths), w
    )
    cot = jnp.asarray(
        rng.normal(size=(B, len(feats) * 16)).astype(np.float32)
    )
    from torchrec_tpu.ops import RowWiseAdagrad

    for opt in (SGD(learning_rate=0.1), RowWiseAdagrad(learning_rate=0.1)):
        states = ebc.init_optimizer(params, opt)
        res = {}
        for impl, force in [("v2", False), ("v3", True)]:
            EmbeddingBagCollection._CM_IMPL = impl
            EmbeddingBagCollection._CM_FORCE_V3 = force
            out = np.asarray(ebc.apply(params, kjt).values())
            p_in = {k: jnp.array(v) for k, v in params.items()}
            p2, s2 = ebc.apply_gradients(p_in, states, opt, kjt, cot)
            totals = {g.key: g.total_rows for g in ebc._groups}
            p2 = {k: v[: totals[k]] for k, v in p2.items()}
            res[impl] = (out, jax.tree.map(np.asarray, (p2, s2)))
        np.testing.assert_allclose(res["v2"][0], res["v3"][0],
                                   rtol=2e-5, atol=2e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                a, b, rtol=2e-5, atol=2e-5
            ),
            res["v2"][1], res["v3"][1],
        )


def test_v3_matches_v2_weighted(forced_v3):
    """Weighted KJT through the v3 shared-sort path: forward pooling,
    count matmul (two-limb bf16), window scaling, and the weighted
    backward (segscan + dedup) all match v2 (reference contract:
    per_sample_weights through TBE at full speed,
    torchrec/distributed/batched_embedding_kernel.py:3725)."""
    rng = np.random.default_rng(11)
    tables = [
        EmbeddingBagConfig(
            name=f"t{i}", num_embeddings=r, embedding_dim=128,
            feature_names=[f"f{i}"],
        )
        for i, r in enumerate([50, 4000, 300_000, 120_000])
    ]
    ebc = EmbeddingBagCollection(
        tables, is_weighted=True, max_unique_gradient_rows=600
    )
    params = ebc.init(jax.random.key(1))
    B = 8
    keys = [f"f{i}" for i in range(4)]
    lengths = rng.integers(0, 6, size=(4 * B,)).astype(np.int32)
    vals = np.concatenate(
        [
            rng.integers(
                0, tables[i].num_embeddings,
                size=int(lengths[i * B: (i + 1) * B].sum()),
            )
            for i in range(4)
        ]
    ).astype(np.int32)
    w = rng.normal(size=vals.shape[0]).astype(np.float32)
    kjt = KeyedJaggedTensor.from_lengths(
        keys, jnp.asarray(vals), jnp.asarray(lengths), jnp.asarray(w)
    )
    cot = jnp.asarray(rng.normal(size=(B, 4 * 128)).astype(np.float32))
    from torchrec_tpu.ops import RowWiseAdagrad

    for opt in (SGD(learning_rate=0.1), RowWiseAdagrad(learning_rate=0.1)):
        states = ebc.init_optimizer(params, opt)
        res = {}
        for impl, force in [("v2", False), ("v3", True)]:
            EmbeddingBagCollection._CM_IMPL = impl
            EmbeddingBagCollection._CM_FORCE_V3 = force
            out = np.asarray(ebc.apply(params, kjt).values())
            # the interpret segscan kernel aliases (donates) its table
            # buffer — hand it a copy so params survive the next round
            p_in = {k: jnp.array(v) for k, v in params.items()}
            p2, s2 = ebc.apply_gradients(p_in, states, opt, kjt, cot)
            totals = {g.key: g.total_rows for g in ebc._groups}
            p2 = {k: v[: totals[k]] for k, v in p2.items()}
            res[impl] = (out, jax.tree.map(np.asarray, (p2, s2)))
        np.testing.assert_allclose(res["v2"][0], res["v3"][0],
                                   rtol=2e-5, atol=2e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                a, b, rtol=2e-5, atol=2e-5
            ),
            res["v2"][1], res["v3"][1],
        )


def test_v3_vbe_matches_v2(forced_v3):
    """VBE + v3: per-key dedup'd batches through the shared-sort path
    (reference embeddingbag.py VBE path with inverse-indices permute)."""
    from torchrec_tpu.sparse import KeyedJaggedTensor

    rng = np.random.default_rng(5)
    # mixed small (count-matmul) + large table, variable stride per key
    tables = [
        EmbeddingBagConfig(name="ta", num_embeddings=50, embedding_dim=8,
                           feature_names=["a"]),
        EmbeddingBagConfig(name="tb", num_embeddings=200_000, embedding_dim=8,
                           feature_names=["b"]),
    ]
    ebc = EmbeddingBagCollection(tables, max_unique_gradient_rows=64)
    params = ebc.init(jax.random.key(2))
    opt = SGD(learning_rate=0.5)
    states = ebc.init_optimizer(params, opt)
    lengths = jnp.asarray([[2, 1, 0], [1, 1, 1]], jnp.int32)
    values = jnp.asarray([4, 5, 6, 100_000, 2, 199_999], jnp.int32)
    inv = jnp.asarray([[0, 0, 1, 1], [0, 1, 2, 2]], jnp.int32)
    kjt = KeyedJaggedTensor(
        keys=["a", "b"], values=values, lengths=lengths,
        stride_per_key=(2, 3), inverse_indices=inv,
    )
    cot = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    res = {}
    for impl, force in [("v2", False), ("v3", True)]:
        EmbeddingBagCollection._CM_IMPL = impl
        EmbeddingBagCollection._CM_FORCE_V3 = force
        out = np.asarray(ebc.apply(params, kjt).values())
        p2, _ = ebc.apply_gradients(params, states, opt, kjt, cot)
        res[impl] = (out, jax.tree.map(np.asarray, p2))
    np.testing.assert_allclose(res["v2"][0], res["v3"][0], atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
        res["v2"][1], res["v3"][1],
    )


from hypothesis import given, settings, strategies as st


@pytest.mark.slow
@settings(max_examples=20, deadline=None)
@given(
    sizes=st.lists(
        st.integers(min_value=3, max_value=40_000), min_size=1, max_size=4
    ),
    batch=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_v3_property_equivalence(sizes, batch, seed):
    """Random table sizes x batch: forced-v3 must match v2 exactly
    (hypothesis analog of the reference's sharding sweeps)."""
    rng = np.random.default_rng(seed)
    tables = [
        EmbeddingBagConfig(
            name=f"t{i}", num_embeddings=r, embedding_dim=8,
            feature_names=[f"f{i}"],
        )
        for i, r in enumerate(sizes)
    ]
    f = len(sizes)
    ebc = EmbeddingBagCollection(tables, max_unique_gradient_rows=128)
    params = ebc.init(jax.random.key(seed % 997))
    opt = SGD(learning_rate=0.3)
    states = ebc.init_optimizer(params, opt)
    lengths = rng.integers(0, 4, size=(f * batch,)).astype(np.int32)
    vals = np.concatenate(
        [
            rng.integers(
                0, sizes[i],
                size=int(lengths[i * batch: (i + 1) * batch].sum()),
            )
            for i in range(f)
        ]
    ).astype(np.int32) if lengths.sum() else np.zeros((0,), np.int32)
    kjt = KeyedJaggedTensor.from_lengths(
        [f"f{i}" for i in range(f)], jnp.asarray(vals), jnp.asarray(lengths)
    )
    cot = jnp.asarray(rng.normal(size=(batch, f * 8)).astype(np.float32))
    res = {}
    try:
        for impl, force in [("v2", False), ("v3", True)]:
            EmbeddingBagCollection._CM_IMPL = impl
            EmbeddingBagCollection._CM_FORCE_V3 = force
            out = np.asarray(ebc.apply(params, kjt).values())
            p2, _ = ebc.apply_gradients(params, states, opt, kjt, cot)
            res[impl] = (out, jax.tree.map(np.asarray, p2))
    finally:
        EmbeddingBagCollection._CM_IMPL = "v3"
        EmbeddingBagCollection._CM_FORCE_V3 = False
    np.testing.assert_allclose(res["v2"][0], res["v3"][0], atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
        res["v2"][1], res["v3"][1],
    )
