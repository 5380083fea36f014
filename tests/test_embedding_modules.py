"""Oracle tests: EBC/EC lookups and fused sparse updates vs numpy / dense
autodiff ground truth.

Mirrors the reference's test strategy (SURVEY §4): the sharded-vs-unsharded
equivalence oracle starts from a trustworthy *unsharded* compute; these tests
establish that trust. Sweeps pooling x weighted x multi-group x shared
features like torchrec/modules/tests/test_embedding_modules.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.modules import (
    EmbeddingBagCollection,
    EmbeddingBagConfig,
    EmbeddingCollection,
    EmbeddingConfig,
)
from torchrec_tpu.ops import RowWiseAdagrad, SGD, dedup_rows, make_optimizer
from torchrec_tpu.types import PoolingType
from tests.utils import make_numpy_kjt, make_tables, to_kjt


def ebc_fixture(pooling=PoolingType.SUM, weighted=False, seed=0, dims=None):
    rng = np.random.default_rng(seed)
    dims = dims or {"t0": 8, "t1": 8, "t2": 16}
    num_emb = {"t0": 20, "t1": 30, "t2": 10}
    tables = [
        EmbeddingBagConfig(
            name="t0", num_embeddings=20, embedding_dim=dims["t0"],
            feature_names=["f0", "f1"], pooling=pooling,
        ),
        EmbeddingBagConfig(
            name="t1", num_embeddings=30, embedding_dim=dims["t1"],
            feature_names=["f2"], pooling=pooling,
        ),
        EmbeddingBagConfig(
            name="t2", num_embeddings=10, embedding_dim=dims["t2"],
            feature_names=["f3"], pooling=pooling,
        ),
    ]
    ebc = EmbeddingBagCollection(tables, is_weighted=weighted)
    params = ebc.init(jax.random.key(seed))
    # numpy view of per-table weights + per-feature tables
    np_tables = {t.name: np.asarray(ebc.table_slice(params, t.name)) for t in tables}
    feat_tables = {"f0": "t0", "f1": "t0", "f2": "t1", "f3": "t2"}
    feature_num_emb = {f: num_emb[t] for f, t in feat_tables.items()}
    nk = make_numpy_kjt(
        rng, ["f0", "f1", "f2", "f3"], batch_size=6,
        num_embeddings=feature_num_emb, max_length=5, weighted=weighted,
    )
    kjt = to_kjt(nk, capacity=256)
    oracle_tables = {f: np_tables[t] for f, t in feat_tables.items()}
    return ebc, params, nk, kjt, oracle_tables


class TestEmbeddingBagCollection:
    @pytest.mark.parametrize("pooling", [PoolingType.SUM, PoolingType.MEAN])
    def test_matches_numpy_oracle(self, pooling):
        ebc, params, nk, kjt, oracle_tables = ebc_fixture(pooling=pooling)
        kt = jax.jit(ebc.apply)(params, kjt)
        assert kt.keys() == ["f0", "f1", "f2", "f3"]
        assert kt.length_per_key() == [8, 8, 8, 16]
        expected = nk.pooled(oracle_tables, pooling=pooling.value)
        for key in kt.keys():
            np.testing.assert_allclose(
                kt[key], expected[key], rtol=1e-5, atol=1e-5
            )

    def test_weighted(self):
        ebc, params, nk, kjt, oracle_tables = ebc_fixture(weighted=True)
        kt = ebc.apply(params, kjt)
        expected = nk.pooled(oracle_tables, pooling="SUM")
        for key in kt.keys():
            np.testing.assert_allclose(
                kt[key], expected[key], rtol=1e-5, atol=1e-5
            )

    def test_permuted_input_same_result(self):
        ebc, params, nk, kjt, oracle_tables = ebc_fixture()
        shuffled = kjt.permute([3, 1, 0, 2])  # module re-selects its order
        kt0 = ebc.apply(params, kjt)
        kt1 = ebc.apply(params, shuffled)
        np.testing.assert_allclose(kt0.values(), kt1.values(), rtol=1e-6)

    def test_multi_group_layout(self):
        ebc, params, *_ = ebc_fixture()
        assert len(ebc.groups) == 2  # d8 (t0,t1) and d16 (t2)
        assert set(params) == {g.key for g in ebc.groups}
        assert ebc.table_slice(params, "t1").shape == (30, 8)

    def test_split_params_fqns(self):
        ebc, params, *_ = ebc_fixture()
        per_table = ebc.split_params(params)
        assert set(per_table) == {"t0", "t1", "t2"}
        assert per_table["t2"].shape == (10, 16)

    def test_zero_length_rows_give_zero(self):
        tables = [
            EmbeddingBagConfig(name="t", num_embeddings=5, embedding_dim=4,
                               feature_names=["f"], pooling=PoolingType.MEAN)
        ]
        ebc = EmbeddingBagCollection(tables)
        params = ebc.init(jax.random.key(0))
        kjt = jax.tree_util.tree_map(
            lambda x: x,
            __import__("torchrec_tpu").KeyedJaggedTensor(
                keys=["f"],
                values=jnp.zeros(4, jnp.int32),
                lengths=jnp.array([[0, 2]], jnp.int32),
            ),
        )
        kt = ebc.apply(params, kjt)
        np.testing.assert_allclose(kt["f"][0], 0.0)

    def test_duplicate_feature_rejected(self):
        with pytest.raises(ValueError):
            EmbeddingBagCollection(
                [
                    EmbeddingBagConfig(name="a", num_embeddings=4,
                                       embedding_dim=4, feature_names=["f"]),
                    EmbeddingBagConfig(name="b", num_embeddings=4,
                                       embedding_dim=4, feature_names=["f"]),
                ]
            )


class TestFusedBackward:
    def _dense_reference_grad(self, ebc, params, kjt, cot):
        """Dense autodiff oracle: grad of <apply(params).values, cot>."""

        def loss(p):
            return jnp.sum(ebc.apply(p, kjt).values() * cot)

        return jax.grad(loss)(params)

    def test_sgd_matches_dense_autodiff(self):
        ebc, params, nk, kjt, _ = ebc_fixture()
        b, total_dim = 6, 8 + 8 + 8 + 16
        cot = jnp.asarray(
            np.random.default_rng(1).normal(size=(b, total_dim)).astype(np.float32)
        )
        dense_grads = self._dense_reference_grad(ebc, params, kjt, cot)
        lr = 0.1
        opt = SGD(learning_rate=lr)
        opt_states = ebc.init_optimizer(params, opt)
        new_params, _ = jax.jit(
            lambda p, s, k, c: ebc.apply_gradients(p, s, opt, k, c)
        )(params, opt_states, kjt, cot)
        for key in params:
            np.testing.assert_allclose(
                new_params[key],
                params[key] - lr * dense_grads[key],
                rtol=1e-4,
                atol=1e-5,
            )

    def test_sgd_matches_dense_autodiff_mean_weighted(self):
        for kwargs in ({"pooling": PoolingType.MEAN}, {"weighted": True}):
            ebc, params, nk, kjt, _ = ebc_fixture(**kwargs)
            cot = jnp.asarray(
                np.random.default_rng(2).normal(size=(6, 40)).astype(np.float32)
            )
            dense_grads = self._dense_reference_grad(ebc, params, kjt, cot)
            opt = SGD(learning_rate=1.0)
            new_params, _ = ebc.apply_gradients(
                params, ebc.init_optimizer(params, opt), opt, kjt, cot
            )
            for key in params:
                np.testing.assert_allclose(
                    new_params[key], params[key] - dense_grads[key],
                    rtol=1e-4, atol=1e-5,
                )

    def test_rowwise_adagrad_exact_semantics(self):
        """One step vs a numpy implementation of EXACT_ROWWISE_ADAGRAD."""
        ebc, params, nk, kjt, _ = ebc_fixture()
        cot = jnp.asarray(
            np.random.default_rng(3).normal(size=(6, 40)).astype(np.float32)
        )
        dense_grads = self._dense_reference_grad(ebc, params, kjt, cot)
        lr, eps = 0.05, 1e-8
        opt = RowWiseAdagrad(learning_rate=lr, eps=eps)
        states = ebc.init_optimizer(params, opt)
        new_params, new_states = ebc.apply_gradients(params, states, opt, kjt, cot)
        for key in params:
            G = np.asarray(dense_grads[key], dtype=np.float64)
            touched = (np.abs(G).sum(1) > 0)
            mom = np.where(touched, (G * G).mean(1), 0.0)
            expected = np.asarray(params[key], np.float64).copy()
            upd = lr * G / (np.sqrt(mom)[:, None] + eps)
            expected[touched] -= upd[touched]
            np.testing.assert_allclose(
                new_params[key], expected, rtol=1e-4, atol=1e-5
            )
            np.testing.assert_allclose(
                new_states[key]["momentum"], mom, rtol=1e-4, atol=1e-6
            )

    def test_second_step_accumulates(self):
        ebc, params, nk, kjt, _ = ebc_fixture()
        cot = jnp.ones((6, 40), jnp.float32)
        opt = RowWiseAdagrad(learning_rate=0.1)
        states = ebc.init_optimizer(params, opt)
        p1, s1 = ebc.apply_gradients(params, states, opt, kjt, cot)
        p2, s2 = ebc.apply_gradients(p1, s1, opt, kjt, cot)
        for key in params:
            m1 = np.asarray(s1[key]["momentum"])
            m2 = np.asarray(s2[key]["momentum"])
            assert (m2 >= m1 - 1e-7).all() and m2.sum() > m1.sum()

    def test_dedup_rows(self):
        ids = jnp.array([3, 1, 3, 7, 1, 0], jnp.int32)
        grads = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
        valid = jnp.array([1, 1, 1, 1, 1, 0], bool)  # last is padding
        uids, ugrads = dedup_rows(ids, grads, valid, num_rows=10)
        got = {
            int(uids[i]): np.asarray(ugrads[i])
            for i in range(6)
            if int(uids[i]) < 10
        }
        np.testing.assert_allclose(got[1], [2 + 8, 3 + 9])
        np.testing.assert_allclose(got[3], [0 + 4, 1 + 5])
        np.testing.assert_allclose(got[7], [6, 7])
        assert 0 not in got  # padding dropped

    def test_make_optimizer_registry(self):
        assert isinstance(make_optimizer("exact_rowwise_adagrad"), RowWiseAdagrad)
        with pytest.raises(ValueError):
            make_optimizer("nope")


class TestEmbeddingCollection:
    def test_sequence_lookup_matches_oracle(self):
        rng = np.random.default_rng(5)
        tables = [
            EmbeddingConfig(name="t0", num_embeddings=12, embedding_dim=8,
                            feature_names=["f0"]),
            EmbeddingConfig(name="t1", num_embeddings=9, embedding_dim=8,
                            feature_names=["f1"]),
        ]
        ec = EmbeddingCollection(tables)
        params = ec.init(jax.random.key(0))
        nk = make_numpy_kjt(
            rng, ["f0", "f1"], batch_size=4,
            num_embeddings={"f0": 12, "f1": 9}, max_length=4,
        )
        kjt = to_kjt(nk, capacity=64)
        out = jax.jit(ec.apply)(params, kjt)
        assert set(out) == {"f0", "f1"}
        for key, tname in [("f0", "t0"), ("f1", "t1")]:
            table = np.asarray(ec.table_slice(params, tname))
            jt = out[key]
            vals = np.asarray(jt.values())
            offs = np.asarray(jt.offsets())
            for b_i, idlist in enumerate(nk.ids[key]):
                for j, idx in enumerate(idlist):
                    np.testing.assert_allclose(
                        vals[offs[b_i] + j], table[idx], rtol=1e-6
                    )

    def test_embedding_dim_accessor(self):
        ec = EmbeddingCollection(
            [EmbeddingConfig(name="t", num_embeddings=4, embedding_dim=6,
                             feature_names=["f"])]
        )
        assert ec.embedding_dim() == 6


class TestDebugEmbeddingBagCollection:
    """Reference debug_embedding_modules.py: bounds + finite guards."""

    def test_clean_passes_and_matches(self):
        from torchrec_tpu.modules.debug import DebugEmbeddingBagCollection

        ebc, params, nk, kjt, oracle_tables = ebc_fixture()
        dbg = DebugEmbeddingBagCollection(ebc)
        out = dbg.apply(params, kjt)  # must not raise
        np.testing.assert_allclose(
            np.asarray(out.values()),
            np.asarray(ebc.apply(params, kjt).values()),
            rtol=1e-6,
        )

    def test_out_of_bounds_id_caught(self):
        import jax.numpy as jnp
        from torchrec_tpu.modules.debug import DebugEmbeddingBagCollection
        from torchrec_tpu.sparse import KeyedJaggedTensor

        ebc, params, nk, kjt, _ = ebc_fixture()
        bad_vals = kjt.values().at[0].set(10_000_000)
        bad = KeyedJaggedTensor(
            keys=kjt.keys(), values=bad_vals, lengths=kjt.lengths()
        )
        dbg = DebugEmbeddingBagCollection(ebc)
        with pytest.raises(Exception, match="out of bounds"):
            dbg.apply(params, bad)

    def test_nonfinite_param_caught(self):
        import jax.numpy as jnp
        from torchrec_tpu.modules.debug import DebugEmbeddingBagCollection

        ebc, params, nk, kjt, _ = ebc_fixture()
        key = ebc.groups[0].key
        bad_params = dict(params)
        bad_params[key] = params[key].at[0, 0].set(jnp.nan)
        dbg = DebugEmbeddingBagCollection(ebc)
        with pytest.raises(Exception, match="non-finite"):
            dbg.apply(bad_params, kjt)


def test_lazy_init_wrapper():
    """Reference lazy_extension.py: params materialize on first forward."""
    from torchrec_tpu.modules.lazy_extension import LazyInit

    ebc, params, nk, kjt, _ = ebc_fixture()
    lazy = LazyInit(ebc, seed=0)
    assert not lazy.initialized
    assert lazy.feature_names() == ebc.feature_names()  # delegation
    with pytest.raises(RuntimeError):
        _ = lazy.params
    out = lazy(kjt)
    assert lazy.initialized
    ref = ebc.apply(ebc.init(jax.random.key(0)), kjt)
    np.testing.assert_allclose(
        np.asarray(out.values()), np.asarray(ref.values()), rtol=1e-6
    )
    # second call reuses the same params
    out2 = lazy(kjt)
    np.testing.assert_array_equal(
        np.asarray(out.values()), np.asarray(out2.values())
    )
