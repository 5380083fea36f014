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
from torchrec_tpu.types import DataType
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
