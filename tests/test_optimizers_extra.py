"""LAMB / LARS / Adagrad / PartialRowWiseLAMB + int4 quant + sub-byte packs.

Reference analogs: torchrec/optim/tests + fbgemm OptimType coverage,
tensor_types tests, int4 quant kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.ops import (
    LAMB,
    Adagrad,
    LarsSGD,
    PartialRowWiseLAMB,
    make_optimizer,
)
from torchrec_tpu.sparse.tensor_types import (
    UInt2Tensor,
    UInt4Tensor,
    pack_int4,
    unpack_int4,
)

R, D = 64, 16


def run_both_paths(opt, gsum_rows):
    """Apply one update via sparse path and dense path; both must match."""
    key = jax.random.key(0)
    table = jax.random.normal(key, (R, D), jnp.float32)
    grads = np.zeros((R, D), np.float32)
    for r, g in gsum_rows.items():
        grads[r] = g
    touched = np.zeros(R, bool)
    touched[list(gsum_rows)] = True

    # sparse
    st = opt.init(table)
    uids = jnp.asarray(sorted(gsum_rows), jnp.int32)
    ugr = jnp.asarray(np.stack([gsum_rows[r] for r in sorted(gsum_rows)]))
    t_sparse, _ = jax.jit(opt.update)(table, st, uids, ugr)

    # dense
    st2 = opt.init(table)
    t_dense, _ = jax.jit(opt.dense_update)(
        table, st2, jnp.asarray(grads), jnp.asarray(touched)
    )
    np.testing.assert_allclose(
        np.asarray(t_sparse), np.asarray(t_dense), rtol=1e-5, atol=1e-6
    )
    # untouched rows unchanged
    un = [r for r in range(R) if r not in gsum_rows][:5]
    np.testing.assert_array_equal(np.asarray(t_sparse)[un], np.asarray(table)[un])
    return t_sparse, table


@pytest.mark.parametrize("name", ["adagrad", "lamb", "partial_rowwise_lamb",
                                  "lars_sgd"])
def test_sparse_dense_consistency(name):
    rng = np.random.default_rng(0)
    gsum = {3: rng.normal(size=D).astype(np.float32),
            17: rng.normal(size=D).astype(np.float32),
            40: rng.normal(size=D).astype(np.float32)}
    opt = make_optimizer(name, learning_rate=0.1)
    t_new, t_old = run_both_paths(opt, gsum)
    assert not np.allclose(np.asarray(t_new)[3], np.asarray(t_old)[3])


def test_lamb_trust_ratio_scales_update():
    opt = LAMB(learning_rate=0.1)
    table = jnp.ones((R, D)) * 10.0  # big weights -> big trust ratio
    st = opt.init(table)
    uids = jnp.asarray([0], jnp.int32)
    g = jnp.ones((1, D))
    t2, _ = opt.update(table, st, uids, g)
    small = jnp.ones((R, D)) * 0.01
    st2 = opt.init(small)
    s2, _ = opt.update(small, st2, uids, g)
    assert abs(float(t2[0, 0] - 10.0)) > abs(float(s2[0, 0] - 0.01))


def test_int4_pack_roundtrip():
    rng = np.random.default_rng(0)
    v = rng.integers(0, 16, (8, 32)).astype(np.uint8)
    packed = pack_int4(jnp.asarray(v))
    assert packed.shape == (8, 16)
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), v)
    t = UInt4Tensor.from_unpacked(jnp.asarray(v))
    assert t.shape == (8, 32)
    v2 = rng.integers(0, 4, (4, 16)).astype(np.uint8)
    t2 = UInt2Tensor.from_unpacked(jnp.asarray(v2))
    np.testing.assert_array_equal(np.asarray(t2.unpack()), v2)
    assert t2.packed.shape == (4, 4)


def test_int4_quant_ebc():
    from torchrec_tpu import KeyedJaggedTensor
    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
    from torchrec_tpu.quant.embedding_modules import (
        QuantEmbeddingBagCollection,
        dequantize_table,
        quantize_table,
    )
    from torchrec_tpu.types import DataType

    ebc = EmbeddingBagCollection([
        EmbeddingBagConfig(name="t", num_embeddings=32, embedding_dim=16,
                           feature_names=["f"]),
    ])
    params = ebc.init(jax.random.key(0))
    qebc = QuantEmbeddingBagCollection(ebc, data_type=DataType.INT4)
    qparams = qebc.quantize_from(params)
    g = ebc.groups[0]
    assert qparams[g.key]["q4"].dtype == jnp.uint8
    assert qparams[g.key]["q4"].shape == (32, 8)  # half the bytes of int8
    # dequant error bounded by the 4-bit step
    w = np.asarray(params[g.key])
    back = np.asarray(dequantize_table(qparams[g.key]))
    step = (w.max(1) - w.min(1)) / 15.0
    assert (np.abs(back - w).max(1) <= step + 1e-5).all()

    kjt = KeyedJaggedTensor(
        keys=["f"], values=jnp.asarray([1, 2, 3, 4], jnp.int32),
        lengths=jnp.asarray([[2, 2]], jnp.int32),
    )
    kt = jax.jit(qebc.apply)(qparams, kjt)
    want = back[1] + back[2]
    np.testing.assert_allclose(np.asarray(kt.values())[0], want, rtol=1e-4,
                               atol=1e-5)


# -- old_rows reuse (forward-gather CSE contract) ---------------------------

@pytest.mark.parametrize(
    "name", ["sgd", "rowwise_adagrad", "adam", "lamb", "partial_rowwise_lamb",
             "lars_sgd", "adagrad", "partial_rowwise_adam"]
)
def test_update_old_rows_equivalence(name):
    """update(old_rows=table[ids] with GARBAGE at sentinel positions) must
    produce the same table/state as the self-gathering form: sentinel-slot
    old values only feed dropped writes (the _scatter_add_rows contract the
    EBC v3 backward relies on for forward-gather CSE)."""
    kwargs = {"weight_decay": 0.01} if name in (
        "sgd", "rowwise_adagrad", "adam", "lamb", "lars_sgd"
    ) else {}
    opt = make_optimizer(name, learning_rate=0.05, **kwargs)
    key = jax.random.key(3)
    table = jax.random.normal(key, (R, D), jnp.float32)
    # position layout: real ids at run starts, OOB sentinels elsewhere
    uids = np.array([3, R + 1, 7, R + 2, 40, R + 5], np.int32)
    grads = jax.random.normal(jax.random.key(4), (6, D), jnp.float32)
    st = opt.init(table)

    t_ref, s_ref = opt.update(table, st, jnp.asarray(uids), grads,
                              ids_sorted=False)

    real = uids < R
    old = np.where(
        real[:, None],
        np.asarray(table)[np.minimum(uids, R - 1)],
        np.float32(1e30),  # garbage at sentinel positions
    )
    t_new, s_new = opt.update(table, st, jnp.asarray(uids), grads,
                              ids_sorted=False, old_rows=jnp.asarray(old))

    np.testing.assert_allclose(np.asarray(t_ref), np.asarray(t_new), rtol=0)
    for k in s_ref:
        if np.asarray(s_ref[k]).shape and np.asarray(s_ref[k]).shape[0] == R:
            np.testing.assert_allclose(
                np.asarray(s_ref[k]), np.asarray(s_new[k]), rtol=0
            )


def test_update_old_rows_equivalence_stochastic_rounding():
    """The gather+write branch of _scatter_add_rows (used on TPU and for
    stochastic rounding) must honor old_rows: bf16 tables round-trip
    exactly through the fp32 upcast the EBC forward hands over."""
    opt = make_optimizer("sgd", learning_rate=0.05, stochastic_rounding=True)
    table = jax.random.normal(jax.random.key(5), (R, D)).astype(jnp.bfloat16)
    uids = np.array([3, R + 1, 7, R + 2, 40, R + 5], np.int32)
    grads = jax.random.normal(jax.random.key(6), (6, D), jnp.float32)
    st = opt.init(table)

    t_ref, s_ref = opt.update(table, st, jnp.asarray(uids), grads,
                              ids_sorted=False)
    real = uids < R
    old = np.where(
        real[:, None],
        np.asarray(table)[np.minimum(uids, R - 1)].astype(np.float32),
        np.float32(1e30),
    )
    t_new, s_new = opt.update(table, st, jnp.asarray(uids), grads,
                              ids_sorted=False, old_rows=jnp.asarray(old))
    np.testing.assert_array_equal(
        np.asarray(t_ref, np.float32), np.asarray(t_new, np.float32)
    )
    assert int(s_ref["sr_step"]) == int(s_new["sr_step"])
