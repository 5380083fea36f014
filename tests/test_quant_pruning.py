"""Quant-time row pruning (reference distributed/tests/test_quant_pruning.py,
inference/modules.py:353 set_pruning_data + pruned-TBE index remapping):
pruned rows vanish from the stored blob, pruned ids look up as zeros,
kept ids are bit-identical to the unpruned quantization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchrec_tpu.modules import (
    EmbeddingBagConfig,
    EmbeddingBagCollection,
    EmbeddingCollection,
)
from torchrec_tpu.modules.embedding_configs import EmbeddingConfig
from torchrec_tpu.quant import (
    QuantEmbeddingBagCollection,
    QuantEmbeddingCollection,
    prune_rows_by_norm,
)
from torchrec_tpu.sparse import KeyedJaggedTensor
from torchrec_tpu.types import DataType


def build_ebc(rows=40, dim=16):
    tables = [
        EmbeddingBagConfig(name="a", num_embeddings=rows, embedding_dim=dim,
                           feature_names=["fa"]),
        EmbeddingBagConfig(name="b", num_embeddings=24, embedding_dim=dim,
                           feature_names=["fb"]),
    ]
    ebc = EmbeddingBagCollection(tables)
    return ebc, ebc.init(jax.random.key(0))


def kjt_for(ids_a, ids_b):
    vals = np.concatenate([ids_a, ids_b]).astype(np.int32)
    lengths = np.array([[len(ids_a)], [len(ids_b)]], np.int32)
    return KeyedJaggedTensor(
        keys=["fa", "fb"], values=jnp.asarray(vals),
        lengths=jnp.asarray(lengths),
    )


@pytest.mark.parametrize("dt", [DataType.INT8, DataType.INT4, DataType.FP16])
def test_pruned_ids_zero_kept_ids_exact(dt):
    ebc, params = build_ebc()
    q = QuantEmbeddingBagCollection(ebc, dt)
    keep_a = np.ones(40, bool)
    keep_a[::2] = False  # prune even rows of table a
    qp_full = q.quantize_from(params)
    qp_pruned = q.quantize_from(params, pruning={"a": keep_a})

    # storage shrank by exactly the pruned rows
    g = ebc.groups[0]
    qkey = "q4" if dt == DataType.INT4 else "q"
    assert (
        qp_pruned[g.key][qkey].shape[0]
        == qp_full[g.key][qkey].shape[0] - 20
    )

    # kept id -> same pooled value as unpruned; pruned id -> zero
    kept = kjt_for([1, 3], [5])
    np.testing.assert_allclose(
        np.asarray(q.apply(qp_pruned, kept).values()),
        np.asarray(q.apply(qp_full, kept).values()),
        rtol=1e-6,
    )
    pruned = kjt_for([2], [5])  # row 2 of a was pruned
    out = np.asarray(q.apply(qp_pruned, pruned).values())
    np.testing.assert_allclose(out[:, :16], 0.0)  # fa block zero
    assert np.abs(out[:, 16:]).sum() > 0  # fb untouched


def test_kept_indices_form_and_mixed_bags():
    ebc, params = build_ebc()
    q = QuantEmbeddingBagCollection(ebc, DataType.INT8)
    qp = q.quantize_from(params, pruning={"a": np.array([0, 1, 2, 3])})
    # a bag mixing kept and pruned ids pools only the kept rows
    mixed = kjt_for([1, 30], [0])
    only_kept = kjt_for([1], [0])
    got = np.asarray(q.apply(qp, mixed).values())
    exp = np.asarray(q.apply(qp, only_kept).values())
    np.testing.assert_allclose(got[:, :16], exp[:, :16], rtol=1e-6)


def test_prune_rows_by_norm_picks_largest():
    ebc, params = build_ebc()
    # make rows 7 and 9 of table a dominate
    g = ebc.groups[0]
    blob = np.asarray(params[g.key]).copy()
    blob[7] = 100.0
    blob[9] = -90.0
    params = dict(params)
    params[g.key] = jnp.asarray(blob)
    masks = prune_rows_by_norm(ebc, params, {"a": 2})
    assert masks["a"].sum() == 2
    assert masks["a"][7] and masks["a"][9]
    assert "b" not in masks


def test_sequence_pruning():
    tables = [EmbeddingConfig(name="t", num_embeddings=30, embedding_dim=8,
                              feature_names=["f"])]
    ec = EmbeddingCollection(tables)
    params = ec.init(jax.random.key(1))
    q = QuantEmbeddingCollection(ec, DataType.INT8)
    qp = q.quantize_from(params, pruning={"t": np.arange(15)})
    kjt = KeyedJaggedTensor(
        keys=["f"], values=jnp.asarray(np.array([3, 20, 14], np.int32)),
        lengths=jnp.asarray(np.array([[3]], np.int32)),
    )
    rows = np.asarray(q.apply(qp, kjt)["f"].values())
    assert np.abs(rows[0]).sum() > 0  # kept
    np.testing.assert_allclose(rows[1], 0.0)  # pruned
    assert np.abs(rows[2]).sum() > 0


def test_sharded_serving_rejects_pruned_params():
    from torchrec_tpu.inference import ShardedQuantEmbeddingBagCollection

    ebc, params = build_ebc()
    q = QuantEmbeddingBagCollection(ebc, DataType.INT8)
    qp = q.quantize_from(params, pruning={"a": np.arange(10)})
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("serve",))
    sq = ShardedQuantEmbeddingBagCollection(q, mesh)
    with pytest.raises(NotImplementedError, match="prune"):
        sq.shard_qparams(qp)


def test_bad_mask_shape_rejected():
    ebc, params = build_ebc()
    q = QuantEmbeddingBagCollection(ebc, DataType.INT8)
    with pytest.raises(ValueError, match="keep mask shape"):
        q.quantize_from(params, pruning={"a": np.ones(7, bool)})
