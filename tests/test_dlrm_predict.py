"""DLRM predict factory / packager (reference inference/dlrm_predict.py:67,
145 and dlrm_packager.py:74)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchrec_tpu.inference import (
    DLRMModelConfig,
    DLRMPredictFactory,
    package_dlrm_model,
)
from torchrec_tpu.types import DataType


def config():
    return DLRMModelConfig(
        dense_arch_layer_sizes=[16, 8],
        dense_in_features=13,
        embedding_dim=8,
        id_list_features_keys=["cat_0", "cat_1", "cat_2"],
        num_embeddings_per_feature=[40, 32, 24],
        over_arch_layer_sizes=[16, 1],
        sample_batch_size=4,
        sample_pooling=3,
    )


def test_predict_module_matches_fp32_model_within_quant_tol():
    factory = DLRMPredictFactory(config())
    predict, module = factory.create_predict_module(key=jax.random.key(1))
    params = module.init(jax.random.key(1))
    batch = factory.model_inputs_data()
    got = predict(batch)["default"]
    exp = module.predict_forward(params, batch)["default"]
    assert got.shape == (4,)
    # int8 row-wise quantization tolerance on probabilities
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=0.05)
    assert (np.asarray(got) >= 0).all() and (np.asarray(got) <= 1).all()


@pytest.mark.parametrize("dt", [DataType.INT8, DataType.FP16])
def test_quant_dtype_variants(dt):
    factory = DLRMPredictFactory(config())
    predict, _ = factory.create_predict_module(
        data_type=dt, key=jax.random.key(0)
    )
    out = predict(factory.model_inputs_data())["default"]
    assert np.isfinite(np.asarray(out)).all()


def test_metadata_surfaces():
    factory = DLRMPredictFactory(config())
    assert factory.batching_metadata() == {
        "float_features": "dense",
        "id_list_features": "sparse",
    }
    assert factory.result_metadata() == "dict_of_tensor"
    b = factory.model_inputs_data()
    assert set(b) == {
        "float_features",
        "id_list_features.values",
        "id_list_features.lengths",
    }


def test_package_roundtrip(tmp_path):
    factory = DLRMPredictFactory(config())
    predict, module = factory.create_predict_module(key=jax.random.key(2))
    params = module.init(jax.random.key(2))
    path = str(tmp_path / "pkg")
    package_dlrm_model(factory, params, path)

    from torchrec_tpu.ir import load_predict_package

    fn, configs = load_predict_package(path)
    batch = factory.model_inputs_data()
    got = fn(
        jnp.asarray(batch["float_features"]),
        jnp.asarray(batch["id_list_features.values"]),
        jnp.asarray(batch["id_list_features.lengths"]),
    )
    exp = predict(batch)["default"]
    got_arr = np.asarray(jax.tree_util.tree_leaves(got)[0]).reshape(-1)
    np.testing.assert_allclose(got_arr, np.asarray(exp), rtol=1e-5, atol=1e-5)
    assert configs is not None and len(configs) == 3
