"""Quantized inference tests: int8/fp8 accuracy vs fp32, conversion flow,
AOT compile, multi-device serve.

Reference analog: torchrec/quant/tests + inference tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.inference import quantize_inference_model, shard_quant_model
from torchrec_tpu.quant import (
    QuantEmbeddingBagCollection,
    dequantize_table,
    quantize_table,
)
from torchrec_tpu.types import DataType, PoolingType
from tests.test_dlrm import make_data, make_model
from tests.test_embedding_modules import ebc_fixture


class TestQuantizeTable:
    def test_int8_roundtrip_error(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(50, 16)).astype(np.float32))
        qt = quantize_table(w, DataType.INT8)
        assert qt["q"].dtype == jnp.int8
        back = dequantize_table(qt)
        # 8-bit rowwise: max error ~ row_range/255
        row_range = np.asarray(w.max(1) - w.min(1))
        err = np.abs(np.asarray(back) - np.asarray(w))
        assert (err <= row_range[:, None] / 255.0 + 1e-6).all()

    def test_int2_roundtrip_error(self):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(size=(50, 16)).astype(np.float32))
        qt = quantize_table(w, DataType.INT2)
        assert qt["q2"].shape == (50, 4)  # 4 ids per byte
        back = dequantize_table(qt)
        # 2-bit rowwise: 4 levels spanning the row range -> nearest-level
        # error <= scale/2 = row_range/6
        row_range = np.asarray(w.max(1) - w.min(1))
        err = np.abs(np.asarray(back) - np.asarray(w))
        assert (err <= row_range[:, None] / 6.0 + 1e-6).all()

    def test_fp16_bf16_fp8(self):
        w = jnp.ones((4, 8)) * 0.5
        for dt in (DataType.FP16, DataType.BF16, DataType.FP8):
            qt = quantize_table(w, dt)
            np.testing.assert_allclose(dequantize_table(qt), 0.5, rtol=0.1)


class TestQuantEBC:
    @pytest.mark.parametrize("dt", [DataType.INT8, DataType.FP16])
    def test_pooled_close_to_fp32(self, dt):
        ebc, params, nk, kjt, oracle = ebc_fixture()
        qebc = QuantEmbeddingBagCollection(ebc, dt)
        qparams = qebc.quantize_from(params)
        kt_q = jax.jit(qebc.apply)(qparams, kjt)
        kt = ebc.apply(params, kjt)
        np.testing.assert_allclose(
            np.asarray(kt_q.values()), np.asarray(kt.values()),
            rtol=0.1, atol=0.05,
        )
        assert kt_q.keys() == kt.keys()


class TestInferenceFlow:
    def test_quantize_and_predict(self):
        model = make_model(num_features=3, dim=8)
        params = model.init(jax.random.key(0))
        sparse = params.pop("sparse")
        pred = quantize_inference_model(model, sparse, params)
        batch = next(iter(make_data(model)))
        fp32_logits = model.apply(
            {"sparse": sparse, **params}, batch.dense_features,
            batch.sparse_features,
        )
        probs = pred.jitted()(batch.dense_features, batch.sparse_features)
        np.testing.assert_allclose(
            np.asarray(probs), jax.nn.sigmoid(fp32_logits), atol=0.03
        )

    def test_aot_compile(self):
        model = make_model(num_features=2, dim=8)
        params = model.init(jax.random.key(0))
        sparse = params.pop("sparse")
        pred = quantize_inference_model(model, sparse, params)
        batch = next(iter(make_data(model)))
        compiled = pred.compile_aot(batch.dense_features, batch.sparse_features)
        out = compiled(batch.dense_features, batch.sparse_features)
        assert out.shape == (8,)
        assert ((np.asarray(out) >= 0) & (np.asarray(out) <= 1)).all()

    def test_sharded_serve(self):
        model = make_model(num_features=2, dim=8)
        params = model.init(jax.random.key(0))
        sparse = params.pop("sparse")
        pred = quantize_inference_model(model, sparse, params)
        _, serve = shard_quant_model(pred, jax.devices()[:8])
        batch = next(iter(make_data(model, batch_size=16)))
        out = serve(batch.dense_features, batch.sparse_features)
        ref = pred.jitted()(batch.dense_features, batch.sparse_features)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4)


class TestShardedQuantTableWise:
    """Distinct TW all-to-one serving layout (reference
    quant_embeddingbag.py:171 + EmbeddingsAllToOne)."""

    def _mesh(self):
        return jax.sharding.Mesh(np.array(jax.devices()[:8]), ("serve",))

    @pytest.mark.parametrize(
        "dt",
        [
            DataType.INT8,
            pytest.param(DataType.INT4, marks=pytest.mark.slow),
            pytest.param(DataType.INT2, marks=pytest.mark.slow),
            pytest.param(DataType.FP8, marks=pytest.mark.slow),
        ],
    )
    def test_matches_unsharded(self, dt):
        from torchrec_tpu.inference.sharded_quant import (
            ShardedQuantEmbeddingBagCollection,
        )
        from torchrec_tpu.quant import QuantEmbeddingBagCollection

        ebc, params, nk, kjt, _ = ebc_fixture()
        qebc = QuantEmbeddingBagCollection(ebc, dt)
        qp = qebc.quantize_from(params)
        ref = qebc.apply(qp, kjt)

        sq = ShardedQuantEmbeddingBagCollection(qebc, self._mesh())
        sqp = sq.shard_qparams(qp)
        out = sq.apply(sqp, kjt)
        assert out.keys() == ref.keys()
        np.testing.assert_allclose(
            np.asarray(out.values()), np.asarray(ref.values()),
            rtol=1e-5, atol=1e-5,
        )

    def test_params_physically_sharded(self):
        from torchrec_tpu.inference.sharded_quant import (
            ShardedQuantEmbeddingBagCollection,
        )
        from torchrec_tpu.quant import QuantEmbeddingBagCollection

        ebc, params, nk, kjt, _ = ebc_fixture()
        qebc = QuantEmbeddingBagCollection(ebc, DataType.INT8)
        sq = ShardedQuantEmbeddingBagCollection(qebc, self._mesh())
        sqp = sq.shard_qparams(qebc.quantize_from(params))
        for cls_params in sqp.values():
            for v in cls_params.values():
                # leading (device) axis sharded: each chip holds 1/W rows
                shard_shapes = {
                    s.data.shape for s in v.addressable_shards
                }
                assert all(sh[0] == 1 for sh in shard_shapes), shard_shapes
        # every table must be placed on exactly one device
        assert set(sq.placement) == {"t0", "t1", "t2"}

    @pytest.mark.parametrize("pooling", [PoolingType.MEAN])
    def test_mean_and_weighted(self, pooling):
        from torchrec_tpu.inference.sharded_quant import (
            ShardedQuantEmbeddingBagCollection,
        )
        from torchrec_tpu.quant import QuantEmbeddingBagCollection

        for weighted in (False, True):
            ebc, params, nk, kjt, _ = ebc_fixture(
                pooling=PoolingType.SUM if weighted else pooling,
                weighted=weighted,
            )
            qebc = QuantEmbeddingBagCollection(ebc, DataType.INT8)
            qp = qebc.quantize_from(params)
            ref = qebc.apply(qp, kjt)
            sq = ShardedQuantEmbeddingBagCollection(qebc, self._mesh())
            out = sq.apply(sq.shard_qparams(qp), kjt)
            np.testing.assert_allclose(
                np.asarray(out.values()), np.asarray(ref.values()),
                rtol=1e-5, atol=1e-5,
            )

    def test_explicit_placement_respected(self):
        from torchrec_tpu.inference.sharded_quant import (
            ShardedQuantEmbeddingBagCollection,
        )
        from torchrec_tpu.quant import QuantEmbeddingBagCollection

        ebc, params, nk, kjt, _ = ebc_fixture()
        qebc = QuantEmbeddingBagCollection(ebc, DataType.INT8)
        qp = qebc.quantize_from(params)
        ref = qebc.apply(qp, kjt)
        place = {"t0": 3, "t1": 3, "t2": 5}
        sq = ShardedQuantEmbeddingBagCollection(
            qebc, self._mesh(), placement=place
        )
        assert sq.placement == place
        out = sq.apply(sq.shard_qparams(qp), kjt)
        np.testing.assert_allclose(
            np.asarray(out.values()), np.asarray(ref.values()),
            rtol=1e-5, atol=1e-5,
        )


def ec_fixture(seed=0):
    """EC over mixed-dim tables + a KJT, mirroring ebc_fixture."""
    from tests.utils import make_numpy_kjt, to_kjt
    from torchrec_tpu.modules import EmbeddingCollection, EmbeddingConfig

    rng = np.random.default_rng(seed)
    tables = [
        EmbeddingConfig(name="t0", num_embeddings=20, embedding_dim=8,
                        feature_names=["f0", "f1"]),
        EmbeddingConfig(name="t1", num_embeddings=30, embedding_dim=8,
                        feature_names=["f2"]),
        EmbeddingConfig(name="t2", num_embeddings=10, embedding_dim=16,
                        feature_names=["f3"]),
    ]
    ec = EmbeddingCollection(tables)
    params = ec.init(jax.random.key(seed))
    nk = make_numpy_kjt(
        rng, ["f0", "f1", "f2", "f3"], batch_size=6,
        num_embeddings={"f0": 20, "f1": 20, "f2": 30, "f3": 10},
        max_length=5,
    )
    return ec, params, nk, to_kjt(nk, capacity=256)


def _assert_jt_dicts_close(out, ref, rtol=0.1, atol=0.05):
    """Compare Dict[str, JaggedTensor] on VALID rows only (streams are
    padded + rolled; garbage beyond each feature's total length differs)."""
    assert set(out) == set(ref)
    for key in ref:
        n = int(np.asarray(ref[key].lengths()).sum())
        np.testing.assert_allclose(
            np.asarray(out[key].values())[:n],
            np.asarray(ref[key].values())[:n],
            rtol=rtol, atol=atol,
        )
        np.testing.assert_array_equal(
            np.asarray(out[key].lengths()), np.asarray(ref[key].lengths())
        )


class TestQuantEC:
    """Sequence (unpooled) quantized inference — reference
    QuantEmbeddingCollection (quant/embedding_modules.py:739)."""

    @pytest.mark.parametrize(
        "dt",
        [DataType.INT8, DataType.INT4, DataType.INT2, DataType.FP8,
         DataType.FP16],
    )
    def test_rows_close_to_fp32(self, dt):
        from torchrec_tpu.quant import QuantEmbeddingCollection

        ec, params, nk, kjt = ec_fixture()
        qec = QuantEmbeddingCollection(ec, dt)
        qp = qec.quantize_from(params)
        out = jax.jit(qec.apply)(qp, kjt)
        ref = ec.apply(params, kjt)
        tol = (
            1.2 if dt == DataType.INT2
            else 0.35 if dt in (DataType.INT4, DataType.FP8)
            else 0.05
        )
        _assert_jt_dicts_close(out, ref, rtol=0.2, atol=tol)

    def test_per_id_rows_match_table(self):
        """int8 rows land within rowwise quant error of the exact table row,
        id by id (the EC oracle-style check)."""
        from torchrec_tpu.quant import QuantEmbeddingCollection

        ec, params, nk, kjt = ec_fixture()
        qec = QuantEmbeddingCollection(ec, DataType.INT8)
        out = qec.apply(qec.quantize_from(params), kjt)
        feat_tables = {"f0": "t0", "f1": "t0", "f2": "t1", "f3": "t2"}
        for key, tname in feat_tables.items():
            table = np.asarray(ec.table_slice(params, tname))
            rng_row = table.max(1) - table.min(1)
            jt = out[key]
            vals = np.asarray(jt.values())
            offs = np.asarray(jt.offsets())
            for b_i, idlist in enumerate(nk.ids[key]):
                for j, idx in enumerate(idlist):
                    err = np.abs(vals[offs[b_i] + j] - table[idx])
                    assert (err <= rng_row[idx] / 255.0 + 1e-6).all()


class TestShardedQuantEC:
    """TW all-to-one sharded sequence serving — reference
    ShardedQuantEmbeddingCollection (distributed/quant_embedding.py:597)."""

    def _mesh(self):
        return jax.sharding.Mesh(np.array(jax.devices()[:8]), ("serve",))

    @pytest.mark.parametrize(
        "dt",
        [
            DataType.INT8,
            pytest.param(DataType.INT4, marks=pytest.mark.slow),
            pytest.param(DataType.INT2, marks=pytest.mark.slow),
            pytest.param(DataType.FP8, marks=pytest.mark.slow),
        ],
    )
    def test_matches_unsharded(self, dt):
        from torchrec_tpu.inference.sharded_quant import (
            ShardedQuantEmbeddingCollection,
        )
        from torchrec_tpu.quant import QuantEmbeddingCollection

        ec, params, nk, kjt = ec_fixture()
        qec = QuantEmbeddingCollection(ec, dt)
        qp = qec.quantize_from(params)
        ref = qec.apply(qp, kjt)
        sq = ShardedQuantEmbeddingCollection(qec, self._mesh())
        out = sq.apply(sq.shard_qparams(qp), kjt)
        _assert_jt_dicts_close(out, ref, rtol=1e-5, atol=1e-5)

    def test_explicit_placement_respected(self):
        from torchrec_tpu.inference.sharded_quant import (
            ShardedQuantEmbeddingCollection,
        )
        from torchrec_tpu.quant import QuantEmbeddingCollection

        ec, params, nk, kjt = ec_fixture()
        qec = QuantEmbeddingCollection(ec, DataType.INT8)
        qp = qec.quantize_from(params)
        ref = qec.apply(qp, kjt)
        place = {"t0": 7, "t1": 0, "t2": 4}
        sq = ShardedQuantEmbeddingCollection(
            qec, self._mesh(), placement=place
        )
        assert sq.placement == place
        out = sq.apply(sq.shard_qparams(qp), kjt)
        _assert_jt_dicts_close(out, ref, rtol=1e-5, atol=1e-5)

    def test_params_physically_sharded(self):
        from torchrec_tpu.inference.sharded_quant import (
            ShardedQuantEmbeddingCollection,
        )
        from torchrec_tpu.quant import QuantEmbeddingCollection

        ec, params, nk, kjt = ec_fixture()
        qec = QuantEmbeddingCollection(ec, DataType.INT8)
        sq = ShardedQuantEmbeddingCollection(qec, self._mesh())
        sqp = sq.shard_qparams(qec.quantize_from(params))
        for cls_params in sqp.values():
            for v in cls_params.values():
                shard_shapes = {s.data.shape for s in v.addressable_shards}
                assert all(sh[0] == 1 for sh in shard_shapes), shard_shapes


class TestQuantManagedCollision:
    """Frozen-remap MC + quant serving — reference
    QuantManagedCollisionEmbeddingCollection (quant/embedding_modules.py:1054)."""

    def _mc_setup(self):
        from torchrec_tpu.modules import (
            EmbeddingCollection,
            EmbeddingConfig,
            ManagedCollisionCollection,
            MCHManagedCollisionModule,
        )
        from torchrec_tpu.sparse import KeyedJaggedTensor

        zch = 8
        tables = [
            EmbeddingConfig(name="t0", num_embeddings=zch, embedding_dim=8,
                            feature_names=["f0"]),
        ]
        ec = EmbeddingCollection(tables)
        params = ec.init(jax.random.key(3))
        mcc = ManagedCollisionCollection(
            {"t0": MCHManagedCollisionModule(zch_size=zch, history_size=32)},
            {"f0": "t0"},
        )
        states = mcc.init_state()
        train_kjt = KeyedJaggedTensor(
            keys=["f0"],
            values=jnp.asarray([101, 101, 101, 202, 202, 303], jnp.int32),
            lengths=jnp.asarray([[6]], jnp.int32),
        )
        _, states = mcc.forward(states, train_kjt, train=True)
        serve_kjt = KeyedJaggedTensor(
            keys=["f0"],
            values=jnp.asarray([101, 202, 303, 999], jnp.int32),
            lengths=jnp.asarray([[4]], jnp.int32),
        )
        return ec, params, mcc, states, serve_kjt

    def test_sequence_matches_fp_eval(self):
        from torchrec_tpu.quant import (
            QuantEmbeddingCollection,
            QuantManagedCollisionEmbeddingCollection,
        )

        ec, params, mcc, states, kjt = self._mc_setup()
        qec = QuantEmbeddingCollection(ec, DataType.INT8)
        qmc = QuantManagedCollisionEmbeddingCollection(qec, mcc)
        out = qmc.apply(qec.quantize_from(params), states, kjt)
        remapped, _ = mcc.forward(states, kjt, train=False)
        ref = ec.apply(params, remapped)
        _assert_jt_dicts_close(out, ref, rtol=0.1, atol=0.05)
        # eval-mode serving must not touch collision state: unseen id 999
        # remaps to the miss slot, a valid bounded row
        vals = np.asarray(out["f0"].values())
        assert vals.shape[1] == 8

    def test_pooled_matches_fp_eval(self):
        from torchrec_tpu.modules import (
            EmbeddingBagCollection,
            EmbeddingBagConfig,
            ManagedCollisionCollection,
            MCHManagedCollisionModule,
        )
        from torchrec_tpu.quant import (
            QuantEmbeddingBagCollection,
            QuantManagedCollisionEmbeddingBagCollection,
        )
        from torchrec_tpu.sparse import KeyedJaggedTensor

        zch = 8
        ebc = EmbeddingBagCollection([
            EmbeddingBagConfig(name="t0", num_embeddings=zch,
                               embedding_dim=8, feature_names=["f0"]),
        ])
        params = ebc.init(jax.random.key(4))
        mcc = ManagedCollisionCollection(
            {"t0": MCHManagedCollisionModule(zch_size=zch, history_size=32)},
            {"f0": "t0"},
        )
        states = mcc.init_state()
        train_kjt = KeyedJaggedTensor(
            keys=["f0"],
            values=jnp.asarray([11, 11, 22, 22, 22, 33], jnp.int32),
            lengths=jnp.asarray([[6]], jnp.int32),
        )
        _, states = mcc.forward(states, train_kjt, train=True)
        serve_kjt = KeyedJaggedTensor(
            keys=["f0"],
            values=jnp.asarray([11, 22, 33, 44], jnp.int32),
            lengths=jnp.asarray([[2, 2]], jnp.int32),
        )
        qebc = QuantEmbeddingBagCollection(ebc, DataType.INT8)
        qmc = QuantManagedCollisionEmbeddingBagCollection(qebc, mcc)
        out = qmc.apply(qebc.quantize_from(params), states, serve_kjt)
        remapped, _ = mcc.forward(states, serve_kjt, train=False)
        ref = ebc.apply(params, remapped)
        np.testing.assert_allclose(
            np.asarray(out.values()), np.asarray(ref.values()),
            rtol=0.1, atol=0.05,
        )


from hypothesis import given, settings, strategies as st


@pytest.mark.slow
@settings(max_examples=12, deadline=None)
@given(
    sizes=st.lists(
        st.integers(min_value=2, max_value=5000), min_size=1, max_size=5
    ),
    dims=st.sampled_from([8, 16, 32]),
    batch=st.integers(min_value=1, max_value=10),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_sharded_quant_property_equivalence(sizes, dims, batch, seed):
    """Random tables x batch: TW all-to-one sharded quant must equal the
    unsharded quant module exactly."""
    from torchrec_tpu.inference.sharded_quant import (
        ShardedQuantEmbeddingBagCollection,
    )
    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
    from torchrec_tpu.quant import QuantEmbeddingBagCollection
    from torchrec_tpu.sparse import KeyedJaggedTensor

    rng = np.random.default_rng(seed)
    tables = [
        EmbeddingBagConfig(
            name=f"t{i}", num_embeddings=r, embedding_dim=dims,
            feature_names=[f"f{i}"],
        )
        for i, r in enumerate(sizes)
    ]
    f = len(sizes)
    ebc = EmbeddingBagCollection(tables)
    params = ebc.init(jax.random.key(seed % 991))
    lengths = rng.integers(0, 4, size=(f * batch,)).astype(np.int32)
    vals = (
        np.concatenate(
            [
                rng.integers(
                    0, sizes[i],
                    size=int(lengths[i * batch: (i + 1) * batch].sum()),
                )
                for i in range(f)
            ]
        ).astype(np.int32)
        if lengths.sum()
        else np.zeros((0,), np.int32)
    )
    kjt = KeyedJaggedTensor.from_lengths(
        [f"f{i}" for i in range(f)], jnp.asarray(vals), jnp.asarray(lengths)
    )
    qebc = QuantEmbeddingBagCollection(ebc, DataType.INT8)
    qp = qebc.quantize_from(params)
    ref = np.asarray(qebc.apply(qp, kjt).values())
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("serve",))
    sq = ShardedQuantEmbeddingBagCollection(qebc, mesh)
    out = np.asarray(sq.apply(sq.shard_qparams(qp), kjt).values())
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
