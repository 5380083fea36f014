"""torchrec state_dict interop: reference-FQN weights <-> param pytrees.

Reference FQN contract under test: EBC registers per-table weights as
``<path>.embedding_bags.<table>.weight``, EC as
``<path>.embeddings.<table>.weight`` (torchrec
modules/embedding_modules.py:217,474). Uses real torch CPU tensors (torch
is in the image) so the conversion path is the one a migrating user runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from torchrec_tpu.interop import (
    extract_embedding_tables,
    from_torchrec_state_dict,
    to_torchrec_state_dict,
)
from torchrec_tpu.modules import (
    EmbeddingBagCollection,
    EmbeddingBagConfig,
    EmbeddingCollection,
    EmbeddingConfig,
)
from torchrec_tpu.sparse import KeyedJaggedTensor


def make_ebc(n=3, dim=16):
    tables = [
        EmbeddingBagConfig(name=f"t{i}", num_embeddings=20 + i,
                           embedding_dim=dim, feature_names=[f"f{i}"])
        for i in range(n)
    ]
    return EmbeddingBagCollection(tables), tables


def fake_reference_state_dict(tables, marker, prefix, seed=0):
    rng = np.random.default_rng(seed)
    sd = {}
    for t in tables:
        w = rng.normal(size=(t.num_embeddings, t.embedding_dim)).astype(
            np.float32
        )
        sd[f"{prefix}{marker}.{t.name}.weight"] = torch.from_numpy(w)
    # distractors a real model state_dict carries
    sd[f"{prefix}over_arch.linear.weight"] = torch.zeros(4, 4)
    sd["dense_arch.bias"] = torch.ones(3)
    return sd


def test_ebc_load_from_nested_fqns():
    ebc, tables = make_ebc()
    sd = fake_reference_state_dict(
        tables, "embedding_bags",
        "model.sparse_arch.embedding_bag_collection.",
    )
    params = from_torchrec_state_dict(ebc, sd)
    for t in tables:
        want = sd[
            "model.sparse_arch.embedding_bag_collection."
            f"embedding_bags.{t.name}.weight"
        ].numpy()
        np.testing.assert_array_equal(
            np.asarray(ebc.table_slice(params, t.name)), want
        )
    # loaded params drive a real forward
    kjt = KeyedJaggedTensor(
        keys=[f"f{i}" for i in range(3)],
        values=jnp.arange(6, dtype=jnp.int32),
        lengths=jnp.ones((3, 2), jnp.int32),
    )
    out = ebc.apply(params, kjt)
    assert np.isfinite(np.asarray(out.values())).all()


def test_ec_marker_and_roundtrip():
    tables = [
        EmbeddingConfig(name="e0", num_embeddings=10, embedding_dim=8,
                        feature_names=["s0"]),
        EmbeddingConfig(name="e1", num_embeddings=12, embedding_dim=8,
                        feature_names=["s1"]),
    ]
    ec = EmbeddingCollection(tables)
    sd = fake_reference_state_dict(tables, "embeddings", "seq.")
    params = from_torchrec_state_dict(ec, sd)
    back = to_torchrec_state_dict(ec, params, prefix="seq")
    for t in tables:
        key = f"seq.embeddings.{t.name}.weight"
        assert isinstance(back[key], torch.Tensor)
        torch.testing.assert_close(back[key], sd[key])


def test_ebc_roundtrip_from_init():
    ebc, tables = make_ebc()
    params = ebc.init(jax.random.key(0))
    sd = to_torchrec_state_dict(ebc, params)
    params2 = from_torchrec_state_dict(ebc, sd)
    for t in tables:
        np.testing.assert_array_equal(
            np.asarray(ebc.table_slice(params, t.name)),
            np.asarray(ebc.table_slice(params2, t.name)),
        )


def test_prefix_disambiguates_duplicate_tables():
    ebc, tables = make_ebc(n=1)
    sd = {}
    sd.update(fake_reference_state_dict(tables, "embedding_bags", "a."))
    sd.update(fake_reference_state_dict(tables, "embedding_bags", "b.",
                                        seed=1))
    with pytest.raises(KeyError):
        extract_embedding_tables(sd)
    got = extract_embedding_tables(sd, prefix="b")
    np.testing.assert_array_equal(
        got["t0"], sd["b.embedding_bags.t0.weight"].numpy()
    )


def test_missing_table_and_shape_validated():
    ebc, tables = make_ebc()
    sd = fake_reference_state_dict(tables[:-1], "embedding_bags", "")
    with pytest.raises(KeyError):
        from_torchrec_state_dict(ebc, sd)
    sd_bad = fake_reference_state_dict(tables, "embedding_bags", "")
    sd_bad["embedding_bags.t0.weight"] = torch.zeros(5, 5)
    with pytest.raises(ValueError):
        from_torchrec_state_dict(ebc, sd_bad)
    with pytest.raises(KeyError):
        from_torchrec_state_dict(ebc, {"no.markers.here": torch.zeros(2)})
