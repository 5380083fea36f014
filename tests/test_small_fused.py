"""Fused ONE-launch small-table matmul kernels vs the per-table v1 loops.

The v3 count-matmul path's forward pooling (pooled_f = C_f^T @ T_f) and
backward accumulation (acc_f = C_f @ G_f) run per small table in v1 (~6 XLA
ops per table per direction); ops/tbe_pallas.py::small_pool_from_counts /
small_acc_from_counts do each direction in ONE Pallas launch over 512-row
blocks with scalar-prefetched (feature, row-range) entries. Reference
behavior: fbgemm's batched small-table TBE forward/backward
(torchrec/distributed/batched_embedding_kernel.py:3725 wrapper).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.ops import SGD, RowWiseAdagrad
from torchrec_tpu.ops.tbe_pallas import (
    _CM_RB,
    small_acc_from_counts,
    small_pool_from_counts,
)
from torchrec_tpu.sparse import KeyedJaggedTensor


@pytest.fixture(autouse=True)
def _force_v3():
    old_v3 = EmbeddingBagCollection._CM_FORCE_V3
    old_f = EmbeddingBagCollection._SMALL_MM_FUSED
    EmbeddingBagCollection._CM_FORCE_V3 = True
    yield
    EmbeddingBagCollection._CM_FORCE_V3 = old_v3
    EmbeddingBagCollection._SMALL_MM_FUSED = old_f


LAYOUTS = {
    # many tiny tables packed into one 512-row block
    "packed_tiny": [7, 300, 40, 4, 9, 80],
    # one table spanning multiple blocks + neighbours straddling boundaries
    "spanning": [1200, 300, 2048, 16],
    # exactly block-aligned boundary
    "aligned": [512, 512, 64],
    # single small table
    "single": [100],
}


def _run_step(sizes, dim, fused, opt, with_large=True, seed=0):
    EmbeddingBagCollection._SMALL_MM_FUSED = fused
    all_sizes = list(sizes) + ([50_000] if with_large else [])
    tables = [
        EmbeddingBagConfig(
            name=f"t{i}", num_embeddings=s, embedding_dim=dim,
            feature_names=[f"f{i}"],
        )
        for i, s in enumerate(all_sizes)
    ]
    ebc = EmbeddingBagCollection(tables, max_unique_gradient_rows=64)
    params = ebc.init(jax.random.key(seed))
    states = ebc.init_optimizer(params, opt)
    B, L = 8, 5
    rng = np.random.default_rng(seed)
    vals = np.concatenate(
        [rng.integers(0, s, B * L) for s in all_sizes]
    ).astype(np.int32)
    lengths = np.full((len(all_sizes), B), L, np.int32)
    kjt = KeyedJaggedTensor(
        keys=[f"f{i}" for i in range(len(all_sizes))],
        values=jnp.asarray(vals), lengths=jnp.asarray(lengths),
    )
    kt = ebc.apply(params, kjt)
    cot = jnp.asarray(
        rng.normal(size=kt.values().shape).astype(np.float32)
    )
    p2, s2 = ebc.apply_gradients(params, states, opt, kjt, cot)
    return kt.values(), p2, s2


@pytest.mark.parametrize("layout", sorted(LAYOUTS))
@pytest.mark.parametrize("dim", [16, 128])
def test_fused_matches_v1(layout, dim):
    opt = SGD(learning_rate=0.1)
    kt_f, p_f, _ = _run_step(LAYOUTS[layout], dim, True, opt)
    kt_v, p_v, _ = _run_step(LAYOUTS[layout], dim, False, opt)
    np.testing.assert_allclose(
        np.asarray(kt_f), np.asarray(kt_v), rtol=1e-6, atol=1e-6
    )
    for k in p_f:
        np.testing.assert_allclose(
            np.asarray(p_f[k]), np.asarray(p_v[k]), rtol=1e-6, atol=1e-6
        )


def test_fused_matches_v1_rowwise_adagrad_state():
    opt = RowWiseAdagrad(learning_rate=0.1)
    _, p_f, s_f = _run_step(LAYOUTS["packed_tiny"], 16, True, opt)
    _, p_v, s_v = _run_step(LAYOUTS["packed_tiny"], 16, False, opt)
    for k in p_f:
        np.testing.assert_allclose(
            np.asarray(p_f[k]), np.asarray(p_v[k]), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(s_f[k]["momentum"]), np.asarray(s_v[k]["momentum"]),
            rtol=1e-6, atol=1e-6,
        )


def test_kernels_direct_numpy_oracle():
    """Drive the two kernels directly against a dense numpy contraction."""
    rng = np.random.default_rng(3)
    rb = _CM_RB
    nb, b, w, n_gf = 3, 8, 128, 4
    # entries: (block, feature, lo, hi) — feature 3 spans blocks 1..2
    meta = [
        (0, 0, 0, 200), (0, 1, 200, 512),
        (1, 1, 0, 100), (1, 3, 100, rb),
        (2, 3, 0, 300), (2, 2, 300, 400),
    ]
    s_max = 2
    feat = np.full((nb, s_max), -1, np.int32)
    lo = np.zeros((nb, s_max), np.int32)
    hi = np.zeros((nb, s_max), np.int32)
    slot = {j: 0 for j in range(nb)}
    for j, p, l, h in meta:
        feat[j, slot[j]], lo[j, slot[j]], hi[j, slot[j]] = p, l, h
        slot[j] += 1
    C = rng.normal(size=(nb * rb, b)).astype(np.float32)
    T = rng.normal(size=(nb * rb, w)).astype(np.float32)
    G = rng.normal(size=(n_gf * b, w)).astype(np.float32)

    pooled = np.zeros((n_gf, b, w), np.float32)
    acc = np.zeros((nb * rb, w), np.float32)
    for j, p, l, h in meta:
        r0, r1 = j * rb + l, j * rb + h
        pooled[p] += C[r0:r1].T @ T[r0:r1]
        acc[r0:r1] += C[r0:r1] @ G.reshape(n_gf, b, w)[p]

    got_pool = small_pool_from_counts(
        jnp.asarray(C), jnp.asarray(T), jnp.asarray(feat), jnp.asarray(lo),
        jnp.asarray(hi), n_gf, interpret=True,
    )
    # cross-block features accumulate in a different order than the
    # single numpy contraction — tolerance covers reassociation only
    np.testing.assert_allclose(
        np.asarray(got_pool), pooled.reshape(n_gf * b, w),
        rtol=1e-4, atol=1e-4,
    )
    got_acc = small_acc_from_counts(
        jnp.asarray(C), jnp.asarray(G), jnp.asarray(feat), jnp.asarray(lo),
        jnp.asarray(hi), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_acc), acc, rtol=1e-4, atol=1e-4)


def test_fused_plan_built_inside_jit_does_not_leak_tracers():
    """The per-block plan is cached on first use; when that first use is
    inside a jit trace the cached arrays must be numpy constants, not
    tracers (regression: UnexpectedTracerError on the second trace)."""
    EmbeddingBagCollection._SMALL_MM_FUSED = True
    tables = [
        EmbeddingBagConfig(
            name=f"t{i}", num_embeddings=s, embedding_dim=16,
            feature_names=[f"f{i}"],
        )
        for i, s in enumerate([7, 300])
    ]
    ebc = EmbeddingBagCollection(tables, max_unique_gradient_rows=64)
    params = ebc.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    vals = np.concatenate(
        [rng.integers(0, s, 8 * 5) for s in [7, 300]]
    ).astype(np.int32)
    kjt = KeyedJaggedTensor(
        keys=["f0", "f1"], values=jnp.asarray(vals),
        lengths=jnp.asarray(np.full((2, 8), 5, np.int32)),
    )
    out1 = jax.jit(ebc.apply)(params, kjt).values()
    out2 = jax.jit(ebc.apply)(params, kjt).values()  # second trace reuses cache
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_fused_gate_falls_back_when_pooled_block_exceeds_vmem():
    ebc = EmbeddingBagCollection(
        [
            EmbeddingBagConfig(
                name="t0", num_embeddings=100, embedding_dim=128,
                feature_names=["f0"],
            )
        ],
        max_unique_gradient_rows=64,
    )
    EmbeddingBagCollection._SMALL_MM_FUSED = True
    assert ebc._use_small_fused(0, 64)
    assert not ebc._use_small_fused(0, 4 * 2**20 // (128 * 4) + 8)
