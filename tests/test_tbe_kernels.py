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


# ---------------------------------------------------------------------------
# Fused segscan backward tail (row_scatter_write_segscan)
# ---------------------------------------------------------------------------


def _segscan_case(U, n_runs, rng, R=3000, D=128, invalid_tail=7):
    """Random sorted run structure: returns (ids [U] with an invalid tail,
    run list [(id, start, end)], grads [U, D])."""
    from torchrec_tpu.ops.tbe_pallas import _CHUNK  # noqa: F401

    n_real = U - invalid_tail
    # random run lengths summing to n_real
    cuts = np.sort(rng.choice(np.arange(1, n_real), size=n_runs - 1,
                              replace=False))
    bounds = np.concatenate([[0], cuts, [n_real]])
    run_ids = np.sort(
        rng.choice(np.arange(100, R), size=n_runs, replace=False)
    )
    ids = np.empty(U, np.int32)
    for k in range(n_runs):
        ids[bounds[k]: bounds[k + 1]] = run_ids[k]
    ids[n_real:] = R  # invalid (>= total) tail
    grads = rng.normal(size=(U, D)).astype(np.float32)
    grads[n_real:] = 0.0
    runs = [
        (int(run_ids[k]), int(bounds[k]), int(bounds[k + 1]))
        for k in range(n_runs)
    ]
    return ids, runs, grads


@pytest.mark.parametrize(
    "U,n_runs,chunk,wd",
    [
        pytest.param(150, 11, 64, 0.0, id="U150c64"),
        pytest.param(150, 3, 64, 0.01, id="U150c64wd-longruns"),
        pytest.param(130, 17, 64, 0.0, id="U130c64rem"),
        pytest.param(2100, 37, 0, 0.0, marks=pytest.mark.slow,
                     id="U2100prod"),
    ],
)
def test_row_scatter_write_segscan_oracle(U, n_runs, chunk, wd):
    """Fused run-sum + SGD + write vs a per-run numpy oracle. Covers runs
    crossing chunk boundaries (carry), a partial tail chunk (rem), the
    invalid-slot zero-grad tail, sentinel parking, and weight decay."""
    from torchrec_tpu.ops.tbe_pallas import row_scatter_write_segscan

    rng = np.random.default_rng(U + n_runs)
    R, D, lr = 3000, 128, 0.3
    S = -(-U // (chunk or 1024)) * (chunk or 1024)
    table = rng.normal(size=(R + S, D)).astype(np.float32)
    ids, runs, grads = _segscan_case(U, n_runs, rng, R=R, D=D)

    heads = np.zeros((U, 1), np.float32)
    heads[0] = 1.0
    heads[1:, 0] = (ids[1:] != ids[:-1]).astype(np.float32)
    is_end = np.concatenate([ids[1:] != ids[:-1], [True]])
    real_end = is_end & (ids < R)
    rows_end = np.where(real_end, ids, R + np.arange(U))
    ends = real_end.astype(np.float32)[:, None]
    old = table[np.minimum(ids, R - 1)]

    out = np.asarray(
        row_scatter_write_segscan(
            jnp.asarray(table), jnp.asarray(rows_end.astype(np.int32)),
            jnp.asarray(heads), jnp.asarray(ends), jnp.asarray(grads),
            jnp.asarray(old), jnp.asarray([lr, wd], np.float32),
            interpret=True, _chunk=chunk,
        )
    )
    want = table[:R].copy()
    for rid, lo, hi in runs:
        want[rid] = (1 - lr * wd) * want[rid] - lr * grads[lo:hi].sum(0)
    np.testing.assert_allclose(out[:R], want, rtol=2e-6, atol=2e-6)
    # scratch-tail rows written at sentinel positions are ZEROED (ends
    # mask) — the tail stays finite across steps
    touched_tail = sorted(int(r) - R for r in rows_end if r >= R)
    np.testing.assert_array_equal(out[R:][touched_tail], 0.0)


@pytest.mark.parametrize("opt_name", ["sgd", "rowwise_adagrad"])
def test_ebc_segscan_gate_equivalence(opt_name):
    """Forced-v3 EBC apply_gradients: fused segscan path vs the dedup +
    write path (gate off) — identical updates up to summation order."""
    from torchrec_tpu.modules import (
        EmbeddingBagCollection,
        EmbeddingBagConfig,
    )
    from torchrec_tpu.ops import SGD, RowWiseAdagrad
    from torchrec_tpu.sparse import KeyedJaggedTensor

    old_impl = EmbeddingBagCollection._CM_IMPL
    old_force = EmbeddingBagCollection._CM_FORCE_V3
    old_gate = EmbeddingBagCollection._FUSED_BWD_SEGSCAN
    try:
        EmbeddingBagCollection._CM_IMPL = "v3"
        EmbeddingBagCollection._CM_FORCE_V3 = True
        rng = np.random.default_rng(7)
        # dim must be lane-aligned (128): the segscan gate requires it
        tables = [
            EmbeddingBagConfig(
                name=f"t{i}", num_embeddings=r, embedding_dim=128,
                feature_names=[f"f{i}"],
            )
            for i, r in enumerate([60, 250_000, 90_000])
        ]
        ebc = EmbeddingBagCollection(tables, max_unique_gradient_rows=500)
        params = ebc.init(jax.random.key(0))
        opt = (
            SGD(learning_rate=0.2, weight_decay=0.01)
            if opt_name == "sgd"
            else RowWiseAdagrad(learning_rate=0.2, weight_decay=0.01)
        )
        states = ebc.init_optimizer(params, opt)
        B = 8
        lengths = rng.integers(1, 6, size=(3 * B,)).astype(np.int32)
        vals = np.concatenate([
            rng.integers(0, tables[i].num_embeddings,
                         size=int(lengths[i * B:(i + 1) * B].sum()))
            for i in range(3)
        ]).astype(np.int32)
        kjt = KeyedJaggedTensor.from_lengths(
            [f"f{i}" for i in range(3)], jnp.asarray(vals),
            jnp.asarray(lengths),
        )
        cot = jnp.asarray(rng.normal(size=(B, 3 * 128)).astype(np.float32))
        res = {}
        took_fused = {}
        import torchrec_tpu.ops.tbe_pallas as _tp

        kname = (
            "row_scatter_write_segscan" if opt_name == "sgd"
            else "row_scatter_write_segscan_rowwise"
        )
        orig_fused = getattr(_tp, kname)
        for gate in (False, True):
            EmbeddingBagCollection._FUSED_BWD_SEGSCAN = gate
            calls = {"n": 0}

            def spy(*a, **k):
                calls["n"] += 1
                return orig_fused(*a, **k)

            setattr(_tp, kname, spy)
            try:
                p2, s2 = ebc.apply_gradients(params, states, opt, kjt, cot)
            finally:
                setattr(_tp, kname, orig_fused)
            took_fused[gate] = calls["n"]
            # compare the LOGICAL region only: run-END vs run-START
            # layouts park their (contractually garbage) sentinel writes
            # at different scratch-tail rows
            totals = {g.key: g.total_rows for g in ebc._groups}
            p2 = {k: v[: totals[k]] for k, v in p2.items()}
            res[gate] = jax.tree.map(np.asarray, (p2, s2))
        assert took_fused[True] > 0 and took_fused[False] == 0
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
            res[False], res[True],
        )
    finally:
        EmbeddingBagCollection._CM_IMPL = old_impl
        EmbeddingBagCollection._CM_FORCE_V3 = old_force
        EmbeddingBagCollection._FUSED_BWD_SEGSCAN = old_gate


@pytest.mark.parametrize(
    "U,n_runs,chunk,wd",
    [
        pytest.param(150, 11, 64, 0.0, id="rw-U150c64"),
        pytest.param(130, 17, 64, 0.01, id="rw-U130c64rem-wd"),
        pytest.param(2100, 37, 0, 0.0, marks=pytest.mark.slow,
                     id="rw-U2100prod"),
    ],
)
def test_row_scatter_write_segscan_rowwise_oracle(U, n_runs, chunk, wd):
    """Fused EXACT_ROWWISE_ADAGRAD tail vs a per-run numpy oracle (same
    run structure / carry / sentinel / tail coverage as the SGD case,
    plus the accumulator output contract)."""
    from torchrec_tpu.ops.tbe_pallas import row_scatter_write_segscan_rowwise

    rng = np.random.default_rng(U + n_runs + 1)
    R, D, lr, eps = 3000, 128, 0.3, 1e-8
    S = -(-U // (chunk or 1024)) * (chunk or 1024)
    table = rng.normal(size=(R + S, D)).astype(np.float32)
    mom = np.abs(rng.normal(size=(R + S,))).astype(np.float32)
    ids, runs, grads = _segscan_case(U, n_runs, rng, R=R, D=D)

    heads = np.zeros((U, 1), np.float32)
    heads[0] = 1.0
    heads[1:, 0] = (ids[1:] != ids[:-1]).astype(np.float32)
    is_end = np.concatenate([ids[1:] != ids[:-1], [True]])
    real_end = is_end & (ids < R)
    rows_end = np.where(real_end, ids, R + np.arange(U)).astype(np.int32)
    ends = real_end.astype(np.float32)[:, None]
    old = table[np.minimum(ids, R - 1)]
    mom_rows = mom[np.minimum(rows_end, R + S - 1)]

    new_t, mv = row_scatter_write_segscan_rowwise(
        jnp.asarray(table), jnp.asarray(rows_end), jnp.asarray(heads),
        jnp.asarray(ends), jnp.asarray(grads), jnp.asarray(old),
        jnp.asarray(mom_rows), jnp.asarray([lr, wd, eps], np.float32),
        interpret=True, _chunk=chunk,
    )
    new_m = np.asarray(
        jnp.asarray(mom).at[jnp.asarray(rows_end)].set(
            mv[:, 0], mode="drop", unique_indices=True
        )
    )
    new_t = np.asarray(new_t)
    want_t = table[:R].copy()
    want_m = mom[:R].copy()
    for rid, lo, hi in runs:
        g = grads[lo:hi].sum(0) + wd * table[rid]
        want_m[rid] = mom[rid] + np.mean(g * g)
        want_t[rid] = table[rid] - lr * g / (np.sqrt(want_m[rid]) + eps)
    np.testing.assert_allclose(new_t[:R], want_t, rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(new_m[:R], want_m, rtol=2e-6, atol=2e-6)
    # sentinel-position writes are zeroed (finite scratch tail) and their
    # mvals are zero too
    touched_tail = sorted(int(r) - R for r in rows_end if r >= R)
    np.testing.assert_array_equal(new_t[R:][touched_tail], 0.0)
    np.testing.assert_array_equal(np.asarray(mv)[~real_end, 0], 0.0)
