"""Tests for MLP / CrossNet / DeepFM / SwishLayerNorm dense blocks."""

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.modules.activation import SwishLayerNorm
from torchrec_tpu.modules.crossnet import (
    CrossNet,
    LowRankCrossNet,
    LowRankMixtureCrossNet,
    VectorCrossNet,
)
from torchrec_tpu.modules.deepfm import DeepFM, FactorizationMachine
from torchrec_tpu.modules.mlp import MLP, Perceptron


def test_perceptron_shapes_and_activation():
    p = Perceptron(4, 8)
    params = p.init(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32))
    y = p.apply(params, x)
    assert y.shape == (3, 8)
    assert (np.asarray(y) >= 0).all()  # relu


def test_mlp_final_activation_identity():
    m = MLP(4, [8, 2], final_activation=lambda x: x)
    params = m.init(jax.random.key(0))
    x = jnp.ones((5, 4))
    y = m.apply(params, x)
    assert y.shape == (5, 2)
    assert (np.asarray(y) < 0).any() or True  # linear head may be negative


def test_mlp_grads_flow():
    m = MLP(4, [8, 1], final_activation=lambda x: x)
    params = m.init(jax.random.key(1))
    g = jax.grad(lambda p: jnp.sum(m.apply(p, jnp.ones((2, 4)))))(params)
    assert any(np.abs(np.asarray(v)).sum() > 0 for v in g.values())


def test_crossnet_variants_shapes():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 16)).astype(np.float32))
    for net in [
        CrossNet(16, 2),
        LowRankCrossNet(16, 2, low_rank=4),
        VectorCrossNet(16, 2),
        LowRankMixtureCrossNet(16, 2, num_experts=3, low_rank=4),
    ]:
        params = net.init(jax.random.key(0))
        y = jax.jit(net.apply)(params, x)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()


def test_crossnet_zero_weights_identity():
    net = CrossNet(8, 3)
    params = {k: jnp.zeros_like(v) for k, v in net.init(jax.random.key(0)).items()}
    x = jnp.ones((2, 8))
    np.testing.assert_allclose(net.apply(params, x), x)


def test_factorization_machine_oracle():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 5, 4)).astype(np.float32)
    fm = FactorizationMachine()
    got = fm.apply(jnp.asarray(x))
    # oracle: sum over pairs f<g of <x_f, x_g>
    expected = np.zeros((3, 1))
    for b in range(3):
        for f in range(5):
            for g in range(f + 1, 5):
                expected[b, 0] += x[b, f] @ x[b, g]
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_deepfm_shapes():
    dfm = DeepFM(dense_module_in=5 * 4, hidden_layer_size=16, deep_fm_dimension=8)
    params = dfm.init(jax.random.key(0))
    out = dfm.apply(params, [jnp.ones((3, 5, 4))])
    assert out.shape == (3, 8)


def test_swish_layer_norm():
    sln = SwishLayerNorm(8)
    params = sln.init(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(3).normal(size=(4, 8)).astype(np.float32))
    y = sln.apply(params, x)
    assert y.shape == x.shape
    # x * sigmoid(ln(x)): zero input -> zero output
    np.testing.assert_allclose(sln.apply(params, jnp.zeros((2, 8))), 0.0)
