"""SimpleDeepFMNN — the DeepFM model family.

Capability parity with torchrec/models/deepfm.py (SparseArch:48,
DenseArch:83, FMInteractionArch:123, OverArch:197, SimpleDeepFMNN:226):
dense features embedded to a per-feature embedding, EBC sparse features,
FM second-order interaction + deep MLP interaction, sigmoid-logit head.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from torchrec_tpu.modules.deepfm import DeepFM, FactorizationMachine
from torchrec_tpu.modules.embedding_modules import EmbeddingBagCollection
from torchrec_tpu.modules.mlp import MLP
from torchrec_tpu.sparse import KeyedJaggedTensor

__all__ = ["SimpleDeepFMNN"]

Params = Dict[str, jnp.ndarray]


class SimpleDeepFMNN:
    """Reference models/deepfm.py:226.

    dense [B, num_dense] -> DenseArch MLP -> [B, D] (one "dense feature
    embedding"); EBC(KJT) -> F x [B, D]; FMInteraction = deep([dense_emb,
    sparse_embs]) ++ fm([dense_emb, sparse_embs]) -> OverArch -> logit.
    """

    def __init__(
        self,
        num_dense_features: int,
        embedding_bag_collection: EmbeddingBagCollection,
        hidden_layer_size: int,
        deep_fm_dimension: int,
    ):
        dims = {
            t.embedding_dim for t in embedding_bag_collection.embedding_bag_configs()
        }
        if len(dims) != 1:
            raise ValueError("SimpleDeepFMNN requires uniform embedding dims")
        self.d = next(iter(dims))
        self.num_dense = num_dense_features
        self.ebc = embedding_bag_collection
        self.num_sparse = len(embedding_bag_collection.feature_names())
        self.dense_arch = MLP(num_dense_features, [self.d])
        self.deep = DeepFM(
            dense_module_in=(self.num_sparse + 1) * self.d,
            hidden_layer_size=hidden_layer_size,
            deep_fm_dimension=deep_fm_dimension,
        )
        self.fm = FactorizationMachine()
        self.over = MLP(deep_fm_dimension + 1, [1], activation=lambda x: x)

    def init(self, key: jax.Array) -> Params:
        ks = jax.random.split(key, 4)
        params: Params = {"sparse": self.ebc.init(ks[0])}
        params["dense"] = self.dense_arch.init(ks[1])
        params["deep"] = self.deep.init(ks[2])
        params["over"] = self.over.init(ks[3])
        return params

    def forward_sparse(self, params: Params, kjt: KeyedJaggedTensor) -> jnp.ndarray:
        """[B, F*D] pooled sparse embeddings."""
        return self.ebc.apply(params["sparse"], kjt).values()

    def forward_dense(
        self,
        params: Params,
        dense_features: jnp.ndarray,
        emb_values: jnp.ndarray,
    ) -> jnp.ndarray:
        b = dense_features.shape[0]
        dense_emb = self.dense_arch.apply(params["dense"], dense_features)
        stack = jnp.concatenate(
            [
                emb_values.reshape(b, self.num_sparse, self.d),
                dense_emb[:, None, :],
            ],
            axis=1,
        )  # [B, F+1, D]
        deep_out = self.deep.apply(params["deep"], [stack])
        fm_out = self.fm.apply(stack)
        logits = self.over.apply(
            params["over"], jnp.concatenate([deep_out, fm_out], axis=1)
        )
        return logits.squeeze(-1)

    def apply(
        self, params: Params, dense_features: jnp.ndarray, kjt: KeyedJaggedTensor
    ) -> jnp.ndarray:
        return self.forward_dense(
            params, dense_features, self.forward_sparse(params, kjt)
        )
