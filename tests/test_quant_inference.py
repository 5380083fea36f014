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

    @pytest.mark.parametrize("dt", [DataType.INT8, DataType.INT4, DataType.FP8])
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


from hypothesis import given, settings, strategies as st


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
