"""Stochastic rounding for bf16 tables (FBGEMM fused-optimizer parity;
reference OptimType kernels round stochastically for fp16/bf16 tables).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.ops import SGD, RowWiseAdagrad
from torchrec_tpu.ops.fused_optim import stochastic_round_bf16


def test_unbiased_and_exact():
    key = jax.random.key(0)
    # x halfway between bf16 grid points 1.0 and 1.0078125
    x = jnp.full((20000,), 1.0 + 2.0 ** -8, jnp.float32)
    bits = jax.random.bits(key, x.shape, jnp.uint32)
    r = np.asarray(stochastic_round_bf16(x, bits), np.float32)
    grid = {1.0, 1.0078125}
    assert set(np.unique(r)).issubset(grid)
    np.testing.assert_allclose(r.mean(), float(x[0]), rtol=2e-3)
    # representable values never move
    y = jnp.full((1000,), 0.5, jnp.float32)
    ry = np.asarray(stochastic_round_bf16(
        y, jax.random.bits(key, y.shape, jnp.uint32)), np.float32)
    assert (ry == 0.5).all()
    # non-finite passes through
    z = jnp.array([np.inf, -np.inf, np.nan], jnp.float32)
    rz = np.asarray(stochastic_round_bf16(
        z, jnp.zeros((3,), jnp.uint32)).astype(jnp.float32))
    assert np.isinf(rz[0]) and np.isinf(rz[1]) and np.isnan(rz[2])


def test_tiny_steps_survive_on_average():
    """lr*g below half a bf16 ULP: nearest rounding freezes the weight;
    stochastic rounding advances it in expectation."""
    table = jnp.full((64, 8), 1.0, jnp.bfloat16)
    ids = jnp.arange(64, dtype=jnp.int32)
    g = jnp.full((64, 8), 1.0, jnp.float32)
    lr = 2.0 ** -11  # quarter of bf16 ULP at 1.0 (ULP = 2^-8 * 2 = 2^-7?)

    frozen = SGD(learning_rate=lr)
    st_f = frozen.init(table)
    t_f = table
    for _ in range(32):
        t_f, st_f = frozen.update(t_f, st_f, ids, g)
    # nearest rounding: every step rounds back -> unchanged
    np.testing.assert_array_equal(
        np.asarray(t_f, np.float32), np.asarray(table, np.float32)
    )

    sr = SGD(learning_rate=lr, stochastic_rounding=True)
    st = sr.init(table)
    assert "sr_step" in st
    t = table
    for _ in range(32):
        t, st = sr.update(t, st, ids, g)
    moved = np.asarray(table, np.float32) - np.asarray(t, np.float32)
    # expected total motion = 32 * lr = 0.015625; bf16 grid so noisy
    np.testing.assert_allclose(moved.mean(), 32 * lr, rtol=0.35)
    assert int(st["sr_step"]) == 32


def test_rowwise_adagrad_sr_state_and_motion():
    table = jnp.full((32, 8), 1.0, jnp.bfloat16)
    opt = RowWiseAdagrad(learning_rate=0.01, stochastic_rounding=True)
    st = opt.init(table)
    assert "sr_step" in st and "momentum" in st
    ids = jnp.arange(32, dtype=jnp.int32)
    g = jnp.full((32, 8), 0.5, jnp.float32)
    t, st = opt.update(table, st, ids, g)
    assert int(st["sr_step"]) == 1
    assert np.asarray(t, np.float32).mean() < 1.0  # moved


def test_fp32_table_rejected():
    with pytest.raises(ValueError):
        SGD(stochastic_rounding=True).init(jnp.zeros((4, 8), jnp.float32))


def test_dense_update_sr():
    table = jnp.full((16, 8), 1.0, jnp.bfloat16)
    opt = SGD(learning_rate=2.0 ** -11, stochastic_rounding=True)
    st = opt.init(table)
    touched = jnp.ones((16,), bool)
    g = jnp.ones((16, 8), jnp.float32)
    t = table
    for _ in range(32):
        t, st = opt.dense_update(t, st, g, touched)
    moved = np.asarray(table, np.float32) - np.asarray(t, np.float32)
    np.testing.assert_allclose(moved.mean(), 32 * 2.0 ** -11, rtol=0.35)


def test_dense_update_sr_rowwise():
    """RowWiseAdagrad dense path: SR applies at the store and sr_step
    survives the state round-trip (it once dropped the counter and
    rounded nearest, freezing sub-ULP steps)."""
    table = jnp.full((16, 8), 1.0, jnp.bfloat16)
    # accumulator starts at 1 => step = lr * g / (sqrt(1 + ...)) ~ tiny
    opt = RowWiseAdagrad(
        learning_rate=2.0 ** -11, stochastic_rounding=True,
        initial_accumulator_value=1.0,
    )
    st = opt.init(table)
    touched = jnp.ones((16,), bool)
    g = jnp.full((16, 8), 1e-3, jnp.float32)
    t = table
    for _ in range(64):
        t, st = opt.dense_update(t, st, g, touched)
    assert int(st["sr_step"]) == 64
    moved = np.asarray(table, np.float32) - np.asarray(t, np.float32)
    # nearest rounding would freeze (step ~ 2^-21 << half ULP 2^-9);
    # SR advances in expectation
    assert moved.mean() > 0
