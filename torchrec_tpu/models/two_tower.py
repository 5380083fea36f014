"""Two-tower retrieval model with in-batch negatives.

Capability parity with the reference retrieval recipe
(examples/retrieval/two_tower_train.py:74 and modules/two_tower.py there):
query tower = EBC(user features) -> MLP -> unit embedding; candidate tower
likewise for items; training objective = softmax cross-entropy over
in-batch negatives (each example's positive item scored against the other
examples' items); retrieval = top-k dot products against the item corpus
(the reference uses FAISS; on TPU a jitted matmul + lax.top_k IS the knn
index for corpus sizes that fit HBM).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from torchrec_tpu.modules.embedding_modules import EmbeddingBagCollection
from torchrec_tpu.modules.mlp import MLP
from torchrec_tpu.sparse import KeyedJaggedTensor

__all__ = ["TwoTower", "two_tower_in_batch_negatives_loss", "knn"]

Params = Dict[str, jnp.ndarray]


class TwoTower:
    """Query/candidate towers over one EBC (reference two_tower.py)."""

    def __init__(
        self,
        embedding_bag_collection: EmbeddingBagCollection,
        query_features: Sequence[str],
        candidate_features: Sequence[str],
        layer_sizes: Sequence[int] = (128, 64),
    ):
        self.ebc = embedding_bag_collection
        self.query_features = list(query_features)
        self.candidate_features = list(candidate_features)
        feats = embedding_bag_collection.feature_names()
        dims = dict(zip(feats, embedding_bag_collection.embedding_dims()))
        q_in = sum(dims[f] for f in query_features)
        c_in = sum(dims[f] for f in candidate_features)
        self.query_mlp = MLP(q_in, list(layer_sizes), final_activation=lambda x: x)
        self.cand_mlp = MLP(c_in, list(layer_sizes), final_activation=lambda x: x)

    def init(self, key: jax.Array) -> Params:
        ks = jax.random.split(key, 3)
        return {
            "sparse": self.ebc.init(ks[0]),
            "query_mlp": self.query_mlp.init(ks[1]),
            "cand_mlp": self.cand_mlp.init(ks[2]),
        }

    def apply(
        self, params: Params, kjt: KeyedJaggedTensor
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(query_embedding [B, D], candidate_embedding [B, D]), unit-norm."""
        kt = self.ebc.apply(params["sparse"], kjt)
        d = kt.to_dict()
        q = jnp.concatenate([d[f] for f in self.query_features], axis=1)
        c = jnp.concatenate([d[f] for f in self.candidate_features], axis=1)
        qe = self.query_mlp.apply(params["query_mlp"], q)
        ce = self.cand_mlp.apply(params["cand_mlp"], c)
        qe = qe / (jnp.linalg.norm(qe, axis=1, keepdims=True) + 1e-12)
        ce = ce / (jnp.linalg.norm(ce, axis=1, keepdims=True) + 1e-12)
        return qe, ce

    def candidate_embeddings(
        self, params: Params, kjt: KeyedJaggedTensor
    ) -> jnp.ndarray:
        """Corpus-side encoding for index building."""
        return self.apply(params, kjt)[1]


def two_tower_in_batch_negatives_loss(
    query_emb: jnp.ndarray,
    cand_emb: jnp.ndarray,
    temperature: float = 0.05,
) -> jnp.ndarray:
    """Softmax CE where example i's positive is candidate i and negatives
    are the other in-batch candidates (reference two_tower_train.py:74)."""
    logits = query_emb @ cand_emb.T / temperature  # [B, B]
    labels = jnp.arange(logits.shape[0])
    return jnp.mean(
        -jax.nn.log_softmax(logits, axis=1)[jnp.arange(logits.shape[0]), labels]
    )


def knn(
    query_emb: jnp.ndarray, corpus_emb: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k inner-product retrieval (FAISS-knn analog,
    examples/retrieval/knn_index.py): scores [B, k], indices [B, k]."""
    scores = jnp.dot(
        query_emb, corpus_emb.T, preferred_element_type=jnp.float32
    )
    return jax.lax.top_k(scores, k)
