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


@pytest.mark.parametrize("dim", [128, 256], ids=["d128", "d256tile"])
@pytest.mark.parametrize("opt_name", ["sgd", "rowwise_adagrad"])
def test_ebc_segscan_gate_equivalence(opt_name, dim):
    """Forced-v3 EBC apply_gradients: fused segscan path vs the dedup +
    write path (gate off) — identical updates up to summation order.
    dim 256 exercises the TILE-ROW storage ([R*2, 128] blobs, [2, 128]
    row DMAs — wide rows cannot be DMA-sliced directly)."""
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
        tables = [
            EmbeddingBagConfig(
                name=f"t{i}", num_embeddings=r, embedding_dim=dim,
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
        cot = jnp.asarray(rng.normal(size=(B, 3 * dim)).astype(np.float32))
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


@pytest.mark.parametrize("sr", [False, True], ids=["nearest", "sr"])
def test_ebc_segscan_bf16_gate(sr):
    """bf16 tables (with and without stochastic rounding) ENGAGE the fused
    segscan path, and the update tracks an fp32-EBC reference within bf16
    rounding noise."""
    from torchrec_tpu.modules import (
        EmbeddingBagCollection,
        EmbeddingBagConfig,
    )
    from torchrec_tpu.modules.embedding_configs import DataType
    from torchrec_tpu.ops import SGD
    from torchrec_tpu.sparse import KeyedJaggedTensor
    import torchrec_tpu.ops.tbe_pallas as _tp

    old_impl = EmbeddingBagCollection._CM_IMPL
    old_force = EmbeddingBagCollection._CM_FORCE_V3
    try:
        EmbeddingBagCollection._CM_IMPL = "v3"
        EmbeddingBagCollection._CM_FORCE_V3 = True
        rng = np.random.default_rng(5)

        def build(dt):
            # v3 (and hence segscan) needs a small table in the group
            tables = [
                EmbeddingBagConfig(
                    name="t0", num_embeddings=60, embedding_dim=128,
                    feature_names=["fs"], data_type=dt,
                ),
                EmbeddingBagConfig(
                    name="t1", num_embeddings=200_000, embedding_dim=128,
                    feature_names=["f0"], data_type=dt,
                ),
            ]
            ebc = EmbeddingBagCollection(
                tables, max_unique_gradient_rows=300
            )
            return ebc, ebc.init(jax.random.key(0))

        from torchrec_tpu.ops.tbe_pallas import unpack_pair_blob

        ebc16, p16 = build(DataType.BF16)
        ebc32, p32 = build(DataType.FP32)
        key = next(iter(p16))
        key32 = next(iter(p32))
        # bf16 blobs are pair-packed u32 storage; compare through the
        # logical view. identical starting values (bf16-representable) —
        # note the fp32 blob may have a different scratch-tail size
        logical16 = np.asarray(unpack_pair_blob(p16[key]))
        pad32 = p32[key32].shape[0]
        p32 = {key32: jnp.asarray(
            np.concatenate([
                logical16,
                np.zeros((max(pad32 - logical16.shape[0], 0), 128),
                         np.float32),
            ])[:pad32]
        )}
        B = 8
        lengths = rng.integers(1, 6, size=(2 * B,)).astype(np.int32)
        vals = np.concatenate([
            rng.integers(0, 60, size=int(lengths[:B].sum())),
            rng.integers(0, 200_000, size=int(lengths[B:].sum())),
        ]).astype(np.int32)
        kjt = KeyedJaggedTensor.from_lengths(
            ["fs", "f0"], jnp.asarray(vals), jnp.asarray(lengths)
        )
        cot = jnp.asarray(
            rng.normal(size=(B, 2 * 128)).astype(np.float32)
        )
        opt16 = SGD(learning_rate=0.05, stochastic_rounding=sr)
        opt32 = SGD(learning_rate=0.05)
        tot = ebc16._groups[0].total_rows
        # snapshot before apply_gradients donates the bf16 blob
        base = logical16[:tot]
        calls = {"n": 0, "sr_seed": []}
        orig = _tp.row_scatter_write_segscan_pair

        def spy(*a, **k):
            calls["n"] += 1
            calls["sr_seed"].append(
                a[8] is not None if len(a) > 8 else
                k.get("sr_seed") is not None
            )
            return orig(*a, **k)

        _tp.row_scatter_write_segscan_pair = spy
        try:
            n16, s16 = ebc16.apply_gradients(
                p16, ebc16.init_optimizer(p16, opt16), opt16, kjt, cot
            )
        finally:
            _tp.row_scatter_write_segscan_pair = orig
        assert calls["n"] == 1  # bf16 table took the fused path
        assert calls["sr_seed"] == [sr]
        if sr:
            # one rounding event per region: segscan (large) + dense
            # (small) each advance the counter
            assert int(s16[key]["sr_step"]) == 2
        n32, _ = ebc32.apply_gradients(
            p32, ebc32.init_optimizer(p32, opt32), opt32, kjt, cot
        )
        a = np.asarray(unpack_pair_blob(n16[key]))[:tot]
        b = np.asarray(n32[key32][:tot])
        # within ~2 bf16 ULPs of the fp32 reference, scaled by BOTH the
        # old and new magnitudes (the small path rounds the DELTA, whose
        # error scales with the update size, not the result)
        tol = (np.abs(b) + np.abs(base)) * 2 ** -6 + 1e-9
        assert (np.abs(a - b) <= tol).all()
        # rows actually moved
        assert (a != base).any()
    finally:
        EmbeddingBagCollection._CM_IMPL = old_impl
        EmbeddingBagCollection._CM_FORCE_V3 = old_force


@pytest.mark.parametrize("sr", [False, True], ids=["nearest", "sr"])
@pytest.mark.parametrize("rowwise", [False, True], ids=["sgd", "rowwise"])
def test_segscan_bf16_pair(rowwise, sr):
    """bf16 tables through the PAIR-granular fused segscan tail: fp32
    in-kernel compute, rounded at the store — nearest without SR; with SR
    every stored value is a bf16 neighbour of the fp32 result, the mean
    error is ~unbiased, the same seed reproduces bit-exactly, and
    UNTOUCHED pair siblings keep their exact bits."""
    from torchrec_tpu.ops.tbe_pallas import (
        row_scatter_write_segscan_pair,
        row_scatter_write_segscan_pair_rowwise,
    )

    rng = np.random.default_rng(11 + rowwise)
    U, n_runs, chunk = 150, 9, 64
    R, D, lr = 3000, 128, 0.017
    S = 2 * (-(-U // chunk) * chunk)
    table32 = rng.normal(size=(R + S, D)).astype(np.float32)
    table32 = np.asarray(
        jnp.asarray(table32).astype(jnp.bfloat16).astype(jnp.float32)
    )  # bf16-representable baseline
    mom = np.abs(rng.normal(size=(R + S,))).astype(np.float32)
    ids, runs, grads = _segscan_case(U, n_runs, rng, R=R, D=D)

    # pair-granular structure: key by pair id, invalid slots -> pair Rp
    Rp = (R + 1) // 2
    in_range = ids < R
    pid = np.where(in_range, ids >> 1, Rp).astype(np.int32)
    heads = np.zeros((U, 1), np.float32)
    heads[0] = 1.0
    heads[1:, 0] = (pid[1:] != pid[:-1]).astype(np.float32)
    is_end = np.concatenate([pid[1:] != pid[:-1], [True]])
    real_end = is_end & in_range
    pairs_end = np.where(real_end, pid, Rp + np.arange(U)).astype(np.int32)
    ends = real_end.astype(np.float32)[:, None]
    parity = (ids & 1).astype(np.float32)[:, None]
    # half-layout grads: col j < D/2 = lane 2j
    g_half = np.concatenate([grads[:, 0::2], grads[:, 1::2]], axis=1)
    # u32 pair words at slot positions
    pairs_all = np.asarray(jax.lax.bitcast_convert_type(
        jnp.asarray(table32).astype(jnp.bfloat16).reshape(
            (R + S) // 2, D, 2
        ),
        jnp.uint32,
    ))
    old_pairs = pairs_all[np.minimum(pid, (R + S) // 2 - 1)]
    mom_pairs = mom[: 2 * ((R + S) // 2)].reshape(-1, 2)[
        np.minimum(pairs_end, (R + S) // 2 - 1)
    ]

    from torchrec_tpu.ops.tbe_pallas import (
        pack_pairs_host,
        unpack_pairs_host,
    )

    bf16_np = np.asarray(
        jnp.asarray(table32).astype(jnp.bfloat16)
    )

    def run(seed):
        # fresh buffer per call: the kernel donates its table argument
        # (u32 pair-packed storage — the bf16 table format)
        table = jnp.asarray(pack_pairs_host(bf16_np))
        sr_seed = (
            None if seed is None else jnp.asarray([seed], jnp.uint32)
        )
        if rowwise:
            t, mv = row_scatter_write_segscan_pair_rowwise(
                table, jnp.asarray(pairs_end), jnp.asarray(heads),
                jnp.asarray(ends), jnp.asarray(parity),
                jnp.asarray(g_half), jnp.asarray(old_pairs),
                jnp.asarray(mom_pairs),
                jnp.asarray([lr, 0.0, 1e-8], np.float32),
                sr_seed, interpret=True, _chunk=chunk,
            )
        else:
            t = row_scatter_write_segscan_pair(
                table, jnp.asarray(pairs_end), jnp.asarray(heads),
                jnp.asarray(ends), jnp.asarray(parity),
                jnp.asarray(g_half), jnp.asarray(old_pairs),
                jnp.asarray([lr, 0.0], np.float32),
                sr_seed, interpret=True, _chunk=chunk,
            )
            mv = None
        logical = unpack_pairs_host(
            np.asarray(t), bf16_np.dtype
        ).astype(np.float32)
        return logical, None if mv is None else np.asarray(mv)

    # fp32 oracle of the updated rows + accumulators
    want = table32[:R].copy()
    want_m = mom[:R].copy()
    for rid, lo, hi in runs:
        g = grads[lo:hi].sum(0)
        if rowwise:
            want_m[rid] = mom[rid] + np.mean(g * g)
            want[rid] = table32[rid] - lr * g / (np.sqrt(want_m[rid]) + 1e-8)
        else:
            want[rid] = table32[rid] - lr * g

    touched = sorted({rid for rid, _, _ in runs})
    # untouched SIBLINGS of touched rows: exact bit preservation
    siblings = sorted(
        {rid ^ 1 for rid in touched} - set(touched) - {R}
    )

    out, mv = run(None if not sr else 3)
    np.testing.assert_array_equal(out[siblings], table32[siblings])
    if rowwise:
        # accumulator exact at real ends (fp32 math, no rounding)
        got_m = np.zeros_like(mom)
        got_m[:] = mom
        got2 = got_m[: 2 * ((R + S) // 2)].reshape(-1, 2)
        for i in range(U):
            if real_end[i]:
                got2[pairs_end[i]] = mv[i]
        np.testing.assert_allclose(
            got_m[touched], want_m[touched], rtol=2e-6
        )
        # untouched siblings keep their accumulator
        np.testing.assert_array_equal(got_m[siblings], mom[siblings])
    if not sr:
        # nearest rounding of the fp32 result: within half a bf16 ULP
        np.testing.assert_allclose(
            out[touched], want[touched], rtol=2 ** -8, atol=2 ** -24
        )
        return
    out1b, _ = run(3)
    out2, _ = run(4)
    np.testing.assert_array_equal(out, out1b)  # same seed -> bit-exact
    assert (out[touched] != out2[touched]).any()  # seeds decorrelate
    w = want[touched]
    o = out[touched]
    # every stored value is within one bf16 ULP (2^-7 relative) of the
    # fp32 result — i.e. one of the two bracketing grid points
    step = np.maximum(np.abs(w) * 2 ** -7, 2 ** -126)
    assert (np.abs(o - w) <= step + 1e-12).all()
    # ~unbiased: mean signed rounding error across many elements ~ 0
    errs = (o - w).ravel()
    assert abs(errs.mean()) < 4 * errs.std() / np.sqrt(errs.size) + 1e-9


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


@pytest.mark.parametrize("iav", [0.0, 0.5], ids=["iav0", "iav0.5"])
def test_ebc_colocated_rowwise_state(iav):
    """colocate_rowwise_state=True: the large-region accumulator rides a
    128-lane state block on the blob (no scalar state passes in the fused
    backward) and matches the plain state-dict form exactly — weights AND
    effective accumulator, over multiple steps."""
    from torchrec_tpu.modules import (
        EmbeddingBagCollection,
        EmbeddingBagConfig,
    )
    from torchrec_tpu.ops import RowWiseAdagrad
    from torchrec_tpu.sparse import KeyedJaggedTensor

    old_impl = EmbeddingBagCollection._CM_IMPL
    old_force = EmbeddingBagCollection._CM_FORCE_V3
    try:
        EmbeddingBagCollection._CM_IMPL = "v3"
        EmbeddingBagCollection._CM_FORCE_V3 = True
        rng = np.random.default_rng(9)
        tables = [
            EmbeddingBagConfig(name="s", num_embeddings=70,
                               embedding_dim=128, feature_names=["fs"]),
            EmbeddingBagConfig(name="l", num_embeddings=150_000,
                               embedding_dim=128, feature_names=["fl"]),
        ]
        opt = RowWiseAdagrad(
            learning_rate=0.2, weight_decay=0.01,
            initial_accumulator_value=iav,
        )
        res = {}
        for colo in (False, True):
            ebc = EmbeddingBagCollection(
                tables, max_unique_gradient_rows=300,
                colocate_rowwise_state=colo,
            )
            params = ebc.init(jax.random.key(0))
            g = ebc._groups[0]
            assert (g.state_lanes == 128) == colo
            states = ebc.init_optimizer(params, opt)
            B = 8
            for step in range(3):
                # identical batches across the colo=False/True runs
                lengths = res.setdefault(
                    ("lens", step),
                    rng.integers(1, 5, size=(2 * B,)).astype(np.int32),
                )
                vals = res.setdefault(
                    ("vals", step),
                    np.concatenate([
                        rng.integers(0, 70, size=int(lengths[:B].sum())),
                        rng.integers(
                            0, 150_000, size=int(lengths[B:].sum())
                        ),
                    ]).astype(np.int32),
                )
                cot = res.setdefault(
                    ("cot", step),
                    rng.normal(size=(B, 256)).astype(np.float32),
                )
                kjt = KeyedJaggedTensor.from_lengths(
                    ["fs", "fl"], jnp.asarray(vals), jnp.asarray(lengths)
                )
                params, states = ebc.apply_gradients(
                    params, states, opt, kjt, jnp.asarray(cot)
                )
            tot = g.total_rows
            blob = np.asarray(params[g.key])
            if colo:
                # flat small region + interleaved large pairs: logical
                # large row r at physical base small + 2*(r - small)
                # (base: weights; base+1 lane 0: accumulator delta)
                sm = g.small_rows
                weights = np.concatenate(
                    [blob[:sm], blob[sm : sm + 2 * (tot - sm) : 2]]
                )
                mom = np.asarray(states[g.key]["momentum"]).copy()
                mom[sm:] = blob[sm + 1 : sm + 2 * (tot - sm) : 2, 0] + iav
            else:
                weights = blob[:tot, :128]
                mom = np.asarray(states[g.key]["momentum"])
            res[("w", colo)] = weights
            res[("m", colo)] = mom
        np.testing.assert_allclose(
            res[("w", True)], res[("w", False)], rtol=2e-6, atol=2e-7
        )
        np.testing.assert_allclose(
            res[("m", True)], res[("m", False)], rtol=2e-6, atol=2e-7
        )
    finally:
        EmbeddingBagCollection._CM_IMPL = old_impl
        EmbeddingBagCollection._CM_FORCE_V3 = old_force


def test_empty_slot_window_is_noop_for_all_in_bounds_kernels():
    """u == 0 (static empty window) must leave the table untouched.
    Regression (advisor r4): _pad_window padded an empty window to one
    full chunk with rem=0, which the branch-free kernels read as a full
    chunk — CHUNK DMAs all aimed at padded row 0, clobbering it."""
    from torchrec_tpu.ops import tbe_pallas as tp

    rng = np.random.default_rng(7)
    R, D = 64, 128
    table_np = rng.normal(size=(R, D)).astype(np.float32)
    table = jnp.asarray(table_np)
    e_i = jnp.zeros((0,), jnp.int32)
    e_c = jnp.zeros((0, 1), jnp.float32)
    e_g = jnp.zeros((0, D), jnp.float32)

    # row_scatter_write donates the table; snapshot first, then re-make
    out = tp.row_scatter_write(
        table, e_i, e_g, in_bounds=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), table_np)
    table = jnp.asarray(table_np)

    out = tp.row_scatter_write_segscan(
        table, e_i, e_c, e_c, e_g, e_g, jnp.asarray([0.1, 0.0]),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), table_np)

    out, m = tp.row_scatter_write_segscan_rowwise(
        jnp.asarray(table_np), e_i, e_c, e_c, e_g, e_g,
        jnp.zeros((0,), jnp.float32),
        jnp.asarray([0.1, 0.0, 1e-8]), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), table_np)
    assert m.shape == (0, 1)

    out = tp.row_scatter_write_segscan_rowwise_colocated(
        jnp.asarray(table_np), e_i, e_c, e_c, e_g,
        jnp.zeros((0, 2 * D), jnp.float32),
        jnp.asarray([0.1, 0.0, 1e-8, 0.0]), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), table_np)

    ptable_np = rng.integers(0, 2**32, size=(R // 2, D), dtype=np.uint32)
    e_u = jnp.zeros((0, D), jnp.uint32)
    out = tp.row_scatter_write_segscan_pair(
        jnp.asarray(ptable_np), e_i, e_c, e_c, e_c, e_g, e_u,
        jnp.asarray([0.1, 0.0]), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), ptable_np)

    out, m = tp.row_scatter_write_segscan_pair_rowwise(
        jnp.asarray(ptable_np), e_i, e_c, e_c, e_c, e_g, e_u,
        jnp.zeros((0, 2), jnp.float32), jnp.asarray([0.1, 0.0, 1e-8]),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), ptable_np)
    assert m.shape == (0, 2)
