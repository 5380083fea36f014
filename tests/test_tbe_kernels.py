"""Pallas row scatter kernels: interpret-mode oracles incl. sentinel rows.

Reference analog: FBGEMM TBE's sparse row-update kernels
(torchrec/distributed/batched_embedding_kernel.py:3725 wraps them).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.ops.tbe_pallas import row_scatter_add, row_scatter_write


@pytest.fixture(
    params=[
        # interpret-mode cost scales with the chunk-padded U (emulated
        # DMAs); the fast case shrinks the chunk via the test-only _chunk
        # knob while still covering a multi-chunk grid + remainder pad.
        # The full-size production chunk is fast-loop-excluded here and
        # covered compiled-on-hardware by test_real_device_smoke.py.
        pytest.param((150, 64), id="U150c64"),
        pytest.param((2100, 0), id="U2100", marks=pytest.mark.slow),
    ]
)
def data(request):
    rng = np.random.default_rng(0)
    (U, chunk) = request.param
    R, D = 5000, 128
    table = rng.normal(size=(R, D)).astype(np.float32)
    # distinct real rows + OOB sentinels + NEGATIVE sentinels (the
    # position-layout dedup emits num_rows+pos; kernels compare unsigned)
    rows = np.concatenate([
        rng.choice(R, size=U - 60, replace=False),
        np.arange(R, R + 30), np.full(30, -1),
    ]).astype(np.int32)
    return table, rows, rng, chunk


def test_row_scatter_add_skips_oob_and_negative(data):
    table, rows, rng, chunk = data
    U, D = rows.shape[0], table.shape[1]
    deltas = rng.normal(size=(U, D)).astype(np.float32)
    out = np.asarray(
        row_scatter_add(
            jnp.asarray(table), jnp.asarray(rows), jnp.asarray(deltas),
            interpret=True, _chunk=chunk,
        )
    )
    want = table.copy()
    for i in range(U - 60):
        want[rows[i]] += deltas[i]
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_row_scatter_write_skips_oob_and_negative(data):
    table, rows, rng, chunk = data
    U, D = rows.shape[0], table.shape[1]
    vals = rng.normal(size=(U, D)).astype(np.float32)
    out = np.asarray(
        row_scatter_write(
            jnp.asarray(table), jnp.asarray(rows), jnp.asarray(vals),
            interpret=True, _chunk=chunk,
        )
    )
    want = table.copy()
    for i in range(U - 60):
        want[rows[i]] = vals[i]
    np.testing.assert_allclose(out, want, rtol=1e-6)


@pytest.mark.parametrize(
    "U,chunk",
    [
        pytest.param(150, 64, id="U150c64"),
        pytest.param(1100, 0, id="U1100", marks=pytest.mark.slow),
    ],
)
def test_row_scatter_write_branch_free_scratch_tail(U, chunk):
    """in_bounds=True: sentinels live in the blob's scratch tail (the
    position-layout dedup emits total_rows + pos < padded_rows), every DMA
    is unconditional, and the logical region matches the branched kernel."""
    rng = np.random.default_rng(3)
    R, D = 5000, 128  # U not a chunk multiple -> pad-row path
    S = -(-U // (chunk or 1024)) * (chunk or 1024)
    table = rng.normal(size=(R + S, D)).astype(np.float32)
    n_sent = min(200, U // 3)  # rows parked in the scratch tail
    real = rng.choice(R, size=U - n_sent, replace=False).astype(np.int32)
    rows = (R + np.arange(U)).astype(np.int32)  # distinct scratch targets
    pos = np.sort(rng.permutation(U)[: U - n_sent])
    rows[pos] = real
    vals = rng.normal(size=(U, D)).astype(np.float32)
    out = np.asarray(
        row_scatter_write(
            jnp.asarray(table), jnp.asarray(rows), jnp.asarray(vals),
            in_bounds=True, interpret=True, _chunk=chunk,
        )
    )
    want = table[:R].copy()
    want[real] = vals[pos]
    np.testing.assert_allclose(out[:R], want, rtol=1e-6)


def test_ebc_scratch_tail_blob_and_update():
    """EBC groups with max_unique allocate a zero scratch tail; a fused
    step leaves it exactly zero and matches the no-scratch EBC per table."""
    from torchrec_tpu.modules import (
        EmbeddingBagCollection,
        EmbeddingBagConfig,
    )
    from torchrec_tpu.ops import SGD
    from torchrec_tpu.sparse import KeyedJaggedTensor

    tables = [
        EmbeddingBagConfig(
            name="small", num_embeddings=50, embedding_dim=8,
            feature_names=["a"],
        ),
        EmbeddingBagConfig(
            name="big", num_embeddings=30000, embedding_dim=8,
            feature_names=["b"],
        ),
    ]
    ebc = EmbeddingBagCollection(tables, max_unique_gradient_rows=32)
    ebc0 = EmbeddingBagCollection(tables)
    g = ebc.groups[0]
    assert g.scratch_rows == 1024
    assert g.padded_rows == g.total_rows + 1024
    params = ebc.init(jax.random.key(0))
    params0 = ebc0.init(jax.random.key(0))
    assert params[g.key].shape[0] == g.padded_rows
    assert np.all(np.asarray(params[g.key][g.total_rows :]) == 0)

    rng = np.random.default_rng(0)
    vals = np.concatenate(
        [rng.integers(0, 50, 8), rng.integers(0, 30000, 8)]
    ).astype(np.int32)
    kjt = KeyedJaggedTensor(
        keys=["a", "b"], values=jnp.asarray(vals),
        lengths=jnp.asarray([[4, 4], [4, 4]], jnp.int32),
    )
    opt = SGD(learning_rate=0.1)
    new_p, _ = ebc.apply_gradients(
        params, ebc.init_optimizer(params, opt), opt, kjt,
        jnp.ones((2, 16), jnp.float32),
    )
    new_p0, _ = ebc0.apply_gradients(
        params0, ebc0.init_optimizer(params0, opt), opt, kjt,
        jnp.ones((2, 16), jnp.float32),
    )
    got = ebc.split_params(new_p)
    want = ebc0.split_params(new_p0)
    for t in tables:
        np.testing.assert_allclose(
            np.asarray(got[t.name]), np.asarray(want[t.name]), rtol=1e-5
        )
    assert np.all(np.asarray(new_p[g.key][g.total_rows :]) == 0)
