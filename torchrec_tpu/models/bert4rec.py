"""BERT4Rec — bidirectional transformer for sequential recommendation.

Capability parity with the reference example
(examples/bert4rec/models/bert4rec.py:262: EmbeddingCollection item/position
embeddings + transformer encoder + masked-item prediction head; eval by
NDCG@10 / Recall@10, bert4rec_metrics.py).

TPU-first: fixed max_seq_len padded sequences, one jitted forward; the
attention/matmul stack is plain jnp ops that XLA maps onto the MXU (bf16
friendly); item lookup shares the EmbeddingCollection machinery so the
table can be sharded with ShardedEmbeddingCollection.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from torchrec_tpu.modules.embedding_configs import EmbeddingConfig
from torchrec_tpu.modules.embedding_modules import EmbeddingCollection
from torchrec_tpu.sparse import KeyedJaggedTensor

__all__ = ["BERT4Rec", "recall_at_k", "ndcg_at_k"]

Params = Dict[str, jnp.ndarray]


def _layer_norm(x, scale, bias, eps=1e-12):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


class BERT4Rec:
    """Masked-item-modeling transformer over item id sequences.

    Vocabulary: item ids in [0, vocab_size); id ``mask_token`` =
    vocab_size (one extra row). Inputs are [B, L] int32 with 0..L valid
    prefix per example.
    """

    def __init__(
        self,
        vocab_size: int,
        max_seq_len: int = 64,
        emb_dim: int = 128,
        num_layers: int = 2,
        num_heads: int = 2,
        ff_dim: Optional[int] = None,
        dropout: float = 0.0,
    ):
        self.vocab_size = vocab_size
        self.mask_token = vocab_size
        self.L = max_seq_len
        self.d = emb_dim
        self.layers = num_layers
        self.heads = num_heads
        self.ff = ff_dim or 4 * emb_dim
        self.ec = EmbeddingCollection(
            [
                EmbeddingConfig(
                    name="item",
                    num_embeddings=vocab_size + 2,  # +mask +pad
                    embedding_dim=emb_dim,
                    feature_names=["item"],
                )
            ]
        )

    def init(self, key: jax.Array) -> Params:
        ks = jax.random.split(key, 3 + 8 * self.layers)
        params: Params = {"sparse": self.ec.init(ks[0])}
        params["pos_emb"] = (
            jax.random.normal(ks[1], (self.L, self.d)) * 0.02
        )
        params["head_b"] = jnp.zeros((self.vocab_size + 2,))
        i = 2
        for l in range(self.layers):
            for name, shape in [
                ("wq", (self.d, self.d)),
                ("wk", (self.d, self.d)),
                ("wv", (self.d, self.d)),
                ("wo", (self.d, self.d)),
                ("ff1", (self.d, self.ff)),
                ("ff2", (self.ff, self.d)),
            ]:
                params[f"l{l}/{name}"] = (
                    jax.random.normal(ks[i], shape) * (shape[0] ** -0.5)
                )
                i += 1
            params[f"l{l}/ln1_s"] = jnp.ones((self.d,))
            params[f"l{l}/ln1_b"] = jnp.zeros((self.d,))
            params[f"l{l}/ln2_s"] = jnp.ones((self.d,))
            params[f"l{l}/ln2_b"] = jnp.zeros((self.d,))
        return params

    def _item_table(self, params: Params) -> jnp.ndarray:
        return self.ec.table_slice(params["sparse"], "item")

    def encode(
        self, params: Params, item_ids: jnp.ndarray, valid: jnp.ndarray
    ) -> jnp.ndarray:
        """[B, L] ids + [B, L] bool -> [B, L, D] contextual embeddings."""
        b, L = item_ids.shape
        table = self._item_table(params)
        x = jnp.take(table, jnp.clip(item_ids, 0, self.vocab_size + 1), axis=0)
        x = x + params["pos_emb"][None, :, :]
        mask = valid[:, None, None, :]  # [B, 1, 1, L] attendable keys
        neg = jnp.finfo(jnp.float32).min
        h = self.d // self.heads
        for l in range(self.layers):
            q = (x @ params[f"l{l}/wq"]).reshape(b, L, self.heads, h)
            k = (x @ params[f"l{l}/wk"]).reshape(b, L, self.heads, h)
            v = (x @ params[f"l{l}/wv"]).reshape(b, L, self.heads, h)
            att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(float(h))
            att = jnp.where(mask, att, neg)
            att = jax.nn.softmax(att, axis=-1)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, L, self.d)
            x = _layer_norm(
                x + ctx @ params[f"l{l}/wo"],
                params[f"l{l}/ln1_s"],
                params[f"l{l}/ln1_b"],
            )
            ffn = jax.nn.gelu(x @ params[f"l{l}/ff1"]) @ params[f"l{l}/ff2"]
            x = _layer_norm(
                x + ffn, params[f"l{l}/ln2_s"], params[f"l{l}/ln2_b"]
            )
        return jnp.where(valid[:, :, None], x, 0.0)

    def logits(self, params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
        """Tied-weight prediction head: [B, L, vocab+2]."""
        table = self._item_table(params)
        return (
            jnp.einsum("bld,vd->blv", hidden, table) + params["head_b"]
        )

    def masked_lm_loss(
        self,
        params: Params,
        item_ids: jnp.ndarray,  # [B, L] with mask_token at masked slots
        valid: jnp.ndarray,  # [B, L]
        targets: jnp.ndarray,  # [B, L] true ids (only read at masked slots)
        masked: jnp.ndarray,  # [B, L] bool
    ) -> jnp.ndarray:
        hidden = self.encode(params, item_ids, valid)
        lg = self.logits(params, hidden)
        logp = jax.nn.log_softmax(lg, axis=-1)
        tgt_logp = jnp.take_along_axis(
            logp, jnp.clip(targets, 0, self.vocab_size + 1)[:, :, None], axis=2
        ).squeeze(-1)
        m = masked & valid
        return -jnp.sum(jnp.where(m, tgt_logp, 0.0)) / jnp.maximum(
            jnp.sum(m.astype(jnp.float32)), 1.0
        )


def recall_at_k(scores: jnp.ndarray, target: jnp.ndarray, k: int) -> jnp.ndarray:
    """Reference bert4rec_metrics.py recall@k: scores [B, V], target [B]."""
    _, topk = jax.lax.top_k(scores, k)
    return jnp.mean(jnp.any(topk == target[:, None], axis=1).astype(jnp.float32))


def ndcg_at_k(scores: jnp.ndarray, target: jnp.ndarray, k: int) -> jnp.ndarray:
    """NDCG@k with a single relevant item (reference bert4rec_metrics.py)."""
    _, topk = jax.lax.top_k(scores, k)
    hits = topk == target[:, None]  # [B, k]
    ranks = jnp.argmax(hits, axis=1)
    dcg = jnp.where(
        jnp.any(hits, axis=1), 1.0 / jnp.log2(ranks.astype(jnp.float32) + 2.0), 0.0
    )
    return jnp.mean(dcg)
