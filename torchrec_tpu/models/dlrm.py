"""DLRM model family: SparseArch / DenseArch / Interaction* / OverArch /
DLRM / DLRM_DCN / DLRM_Projection / DLRMTrain.

Capability parity with torchrec/models/dlrm.py (SparseArch:38, DenseArch:116,
InteractionArch:155, InteractionDCNArch:225, InteractionProjectionArch:293,
OverArch:394, DLRM:442, DLRM_Projection:633, DLRM_DCN:780, DLRMTrain:902).

TPU-first: the model exposes a *split* forward (``forward_sparse`` /
``forward_dense``) in addition to plain ``apply`` so the train step can take
dense gradients with ``jax.grad`` while routing embedding gradients to the
fused sparse optimizer — the functional analog of the reference's
apply_optimizer_in_backward training recipe
(examples/golden_training/train_dlrm.py:114-118).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.modules.crossnet import LowRankCrossNet
from torchrec_tpu.modules.embedding_modules import EmbeddingBagCollection
from torchrec_tpu.modules.mlp import MLP
from torchrec_tpu.sparse import KeyedJaggedTensor

__all__ = [
    "SparseArch",
    "DenseArch",
    "InteractionArch",
    "InteractionDCNArch",
    "InteractionProjectionArch",
    "InteractionTransformerArch",
    "OverArch",
    "DLRM",
    "DLRM_DCN",
    "DLRM_Projection",
    "DLRM_Transformer",
    "DLRMTrain",
    "bce_with_logits",
]

Params = Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class SparseArch:
    """EBC wrapper producing a [B, F, D] stack (reference dlrm.py:38)."""

    embedding_bag_collection: EmbeddingBagCollection

    def __post_init__(self):
        dims = set(self.embedding_bag_collection.embedding_dims())
        if len(dims) != 1:
            raise ValueError("DLRM requires all embedding dims equal")

    @property
    def embedding_dim(self) -> int:
        return self.embedding_bag_collection.embedding_dims()[0]

    @property
    def num_features(self) -> int:
        return len(self.embedding_bag_collection.feature_names())

    def init(self, key: jax.Array) -> Params:
        return self.embedding_bag_collection.init(key)

    def apply(self, params: Params, kjt: KeyedJaggedTensor) -> jnp.ndarray:
        kt = self.embedding_bag_collection.apply(params, kjt)
        b = kt.values().shape[0]
        return kt.values().reshape(b, self.num_features, self.embedding_dim)


@dataclasses.dataclass(frozen=True)
class DenseArch:
    """MLP over dense (float) features (reference dlrm.py:116)."""

    in_features: int
    layer_sizes: Tuple[int, ...]

    def _mlp(self) -> MLP:
        return MLP(self.in_features, list(self.layer_sizes))

    def init(self, key: jax.Array) -> Params:
        return self._mlp().init(key)

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        return self._mlp().apply(params, x)


@dataclasses.dataclass(frozen=True)
class InteractionArch:
    """Pairwise dot interactions of dense + F sparse vectors
    (reference dlrm.py:155): output [B, D + (F+1)F/2]."""

    num_sparse_features: int

    def num_pairs(self) -> int:
        f = self.num_sparse_features + 1
        return f * (f - 1) // 2

    def apply(self, dense: jnp.ndarray, sparse: jnp.ndarray) -> jnp.ndarray:
        b, d = dense.shape
        combined = jnp.concatenate([dense[:, None, :], sparse], axis=1)  # [B, F+1, D]
        # one batched MXU matmul; take strictly-upper-triangular pairs
        gram = jnp.einsum(
            "bfd,bgd->bfg", combined, combined, preferred_element_type=jnp.float32
        )
        f = self.num_sparse_features + 1
        iu = np.triu_indices(f, k=1)
        pairs = gram[:, iu[0], iu[1]].astype(dense.dtype)
        return jnp.concatenate([dense, pairs], axis=1)


@dataclasses.dataclass(frozen=True)
class InteractionDCNArch:
    """Cross-network interaction over concat(dense, sparse_flat)
    (reference dlrm.py:225)."""

    num_sparse_features: int
    crossnet: LowRankCrossNet

    def init(self, key: jax.Array) -> Params:
        return self.crossnet.init(key)

    def apply(self, params: Params, dense: jnp.ndarray, sparse: jnp.ndarray) -> jnp.ndarray:
        b = dense.shape[0]
        combined = jnp.concatenate([dense, sparse.reshape(b, -1)], axis=1)
        return self.crossnet.apply(params, combined)


@dataclasses.dataclass(frozen=True)
class InteractionProjectionArch:
    """MLP-projected interactions (reference dlrm.py:293): project the
    (F+1) x D stack to I1 x D and I2 x D, interact via batched matmul."""

    num_sparse_features: int
    embedding_dim: int
    interaction_branch1_layer_sizes: Tuple[int, ...]
    interaction_branch2_layer_sizes: Tuple[int, ...]

    def _check(self, sizes) -> int:
        if sizes[-1] % self.embedding_dim != 0:
            raise ValueError("branch output must be a multiple of embedding_dim")
        return sizes[-1] // self.embedding_dim

    @property
    def i1(self) -> int:
        return self._check(tuple(self.interaction_branch1_layer_sizes))

    @property
    def i2(self) -> int:
        return self._check(tuple(self.interaction_branch2_layer_sizes))

    def _mlps(self):
        in_size = (self.num_sparse_features + 1) * self.embedding_dim
        return (
            MLP(in_size, list(self.interaction_branch1_layer_sizes)),
            MLP(in_size, list(self.interaction_branch2_layer_sizes)),
        )

    def init(self, key: jax.Array) -> Params:
        m1, m2 = self._mlps()
        k1, k2 = jax.random.split(key)
        return {
            **{f"b1/{k}": v for k, v in m1.init(k1).items()},
            **{f"b2/{k}": v for k, v in m2.init(k2).items()},
        }

    def apply(self, params: Params, dense: jnp.ndarray, sparse: jnp.ndarray) -> jnp.ndarray:
        b, d = dense.shape
        combined = jnp.concatenate([dense[:, None, :], sparse], axis=1).reshape(b, -1)
        m1, m2 = self._mlps()
        p1 = {k.split("/", 1)[1]: v for k, v in params.items() if k.startswith("b1/")}
        p2 = {k.split("/", 1)[1]: v for k, v in params.items() if k.startswith("b2/")}
        a = m1.apply(p1, combined).reshape(b, self.i1, d)
        bb = m2.apply(p2, combined).reshape(b, self.i2, d)
        inter = jnp.einsum("bid,bjd->bij", a, bb, preferred_element_type=jnp.float32)
        return jnp.concatenate(
            [dense, inter.reshape(b, -1).astype(dense.dtype)], axis=1
        )


def _layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                eps: float = 1e-5) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


@dataclasses.dataclass(frozen=True)
class InteractionTransformerArch:
    """Transformer-encoder interaction over the (F+1) x D token stack
    (reference models/experimental/transformerdlrm.py:18): the dense
    vector and the F pooled embeddings form a length-(F+1) sequence; a
    post-norm encoder (MHA + ReLU FFN, the nn.TransformerEncoderLayer
    contract) mixes them and the output flattens to [B, (F+1)*D].

    TPU-first: attention over the tiny (F+1) sequence is three batched
    einsums on the MXU (no kv-cache/masking machinery — every token
    attends to all); ``ff_dim`` defaults to 4*D rather than the
    reference's fixed 2048 so the FFN matmuls stay proportionate."""

    num_sparse_features: int
    embedding_dim: int
    nhead: int = 8
    ntransformer_layers: int = 4
    ff_dim: Optional[int] = None

    def __post_init__(self):
        if self.embedding_dim % self.nhead:
            raise ValueError(
                f"embedding_dim {self.embedding_dim} must be divisible by "
                f"nhead {self.nhead}"
            )

    @property
    def _ff(self) -> int:
        return self.ff_dim or 4 * self.embedding_dim

    def init(self, key: jax.Array) -> Params:
        d, ff = self.embedding_dim, self._ff
        ks = jax.random.split(key, 6 * self.ntransformer_layers)
        params: Params = {}
        i = 0
        for l in range(self.ntransformer_layers):
            for name, shape in [
                ("wq", (d, d)), ("wk", (d, d)), ("wv", (d, d)), ("wo", (d, d)),
                ("ff1", (d, ff)), ("ff2", (ff, d)),
            ]:
                params[f"l{l}/{name}"] = (
                    jax.random.normal(ks[i], shape) * (shape[0] ** -0.5)
                )
                i += 1
            params[f"l{l}/ln1_s"] = jnp.ones((d,))
            params[f"l{l}/ln1_b"] = jnp.zeros((d,))
            params[f"l{l}/ln2_s"] = jnp.ones((d,))
            params[f"l{l}/ln2_b"] = jnp.zeros((d,))
        return params

    def apply(
        self, params: Params, dense: jnp.ndarray, sparse: jnp.ndarray
    ) -> jnp.ndarray:
        b, d = dense.shape
        t = self.num_sparse_features + 1
        h = d // self.nhead
        x = jnp.concatenate([dense[:, None, :], sparse], axis=1)  # [B, T, D]
        for l in range(self.ntransformer_layers):
            q = (x @ params[f"l{l}/wq"]).reshape(b, t, self.nhead, h)
            k = (x @ params[f"l{l}/wk"]).reshape(b, t, self.nhead, h)
            v = (x @ params[f"l{l}/wv"]).reshape(b, t, self.nhead, h)
            att = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) / jnp.sqrt(float(h))
            att = jax.nn.softmax(att, axis=-1).astype(x.dtype)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, t, d)
            x = _layer_norm(
                x + ctx @ params[f"l{l}/wo"],
                params[f"l{l}/ln1_s"], params[f"l{l}/ln1_b"],
            )
            ffn = jax.nn.relu(x @ params[f"l{l}/ff1"]) @ params[f"l{l}/ff2"]
            x = _layer_norm(
                x + ffn, params[f"l{l}/ln2_s"], params[f"l{l}/ln2_b"]
            )
        return x.reshape(b, t * d)


@dataclasses.dataclass(frozen=True)
class OverArch:
    """Final MLP + linear logit head (reference dlrm.py:394)."""

    in_features: int
    layer_sizes: Tuple[int, ...]

    def _mlp(self) -> MLP:
        if len(self.layer_sizes) <= 1:
            raise ValueError("OverArch needs >= 2 layers")
        return MLP(
            self.in_features,
            list(self.layer_sizes),
            final_activation=lambda x: x,  # last layer linear
        )

    def init(self, key: jax.Array) -> Params:
        return self._mlp().init(key)

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        return self._mlp().apply(params, x)


@dataclasses.dataclass(frozen=True)
class DLRM:
    """Deep Learning Recommendation Model (reference dlrm.py:442).

    dense -> DenseArch -> [B, D];  kjt -> SparseArch -> [B, F, D];
    InteractionArch -> OverArch -> [B] logits.
    """

    embedding_bag_collection: EmbeddingBagCollection
    dense_in_features: int
    dense_arch_layer_sizes: Tuple[int, ...]
    over_arch_layer_sizes: Tuple[int, ...]

    def __post_init__(self):
        if self.dense_arch_layer_sizes[-1] != self.sparse_arch.embedding_dim:
            raise ValueError(
                "dense arch output must equal embedding_dim "
                f"({self.dense_arch_layer_sizes[-1]} != {self.sparse_arch.embedding_dim})"
            )

    @property
    def sparse_arch(self) -> SparseArch:
        return SparseArch(self.embedding_bag_collection)

    @property
    def dense_arch(self) -> DenseArch:
        return DenseArch(self.dense_in_features, tuple(self.dense_arch_layer_sizes))

    def _interaction(self):
        return InteractionArch(self.sparse_arch.num_features)

    def _over_in(self) -> int:
        return self.sparse_arch.embedding_dim + self._interaction().num_pairs()

    @property
    def over_arch(self) -> OverArch:
        return OverArch(self._over_in(), tuple(self.over_arch_layer_sizes) + (1,))

    def init(self, key: jax.Array) -> Params:
        ks, kd, ko = jax.random.split(key, 3)
        return {
            "sparse": self.sparse_arch.init(ks),
            "dense_arch": self.dense_arch.init(kd),
            "over_arch": self.over_arch.init(ko),
        }

    # -- split forward (fused sparse training) --------------------------------
    def forward_sparse(self, params: Params, kjt: KeyedJaggedTensor) -> jnp.ndarray:
        """[B, F*D] pooled embedding values (KeyedTensor.values layout)."""
        return self.embedding_bag_collection.apply(params["sparse"], kjt).values()

    def forward_dense(
        self, dense_params: Params, dense_features: jnp.ndarray, emb_values: jnp.ndarray
    ) -> jnp.ndarray:
        b = dense_features.shape[0]
        f, d = self.sparse_arch.num_features, self.sparse_arch.embedding_dim
        embedded_dense = self.dense_arch.apply(
            dense_params["dense_arch"], dense_features
        )
        interactions = self._interaction().apply(
            embedded_dense, emb_values.reshape(b, f, d)
        )
        return self.over_arch.apply(dense_params["over_arch"], interactions)[:, 0]

    def apply(
        self, params: Params, dense_features: jnp.ndarray, kjt: KeyedJaggedTensor
    ) -> jnp.ndarray:
        return self.forward_dense(params, dense_features, self.forward_sparse(params, kjt))


@dataclasses.dataclass(frozen=True)
class DLRM_DCN(DLRM):
    """DLRM with DCN-v2 low-rank cross interaction (reference dlrm.py:780)."""

    dcn_num_layers: int = 2
    dcn_low_rank_dim: int = 32

    def _interaction(self):
        f, d = self.sparse_arch.num_features, self.sparse_arch.embedding_dim
        return InteractionDCNArch(
            f, LowRankCrossNet((f + 1) * d, self.dcn_num_layers, self.dcn_low_rank_dim)
        )

    def _over_in(self) -> int:
        f, d = self.sparse_arch.num_features, self.sparse_arch.embedding_dim
        return (f + 1) * d

    def init(self, key: jax.Array) -> Params:
        p = super().init(key)
        p["interaction"] = self._interaction().init(jax.random.fold_in(key, 7))
        return p

    def forward_dense(self, dense_params, dense_features, emb_values):
        b = dense_features.shape[0]
        f, d = self.sparse_arch.num_features, self.sparse_arch.embedding_dim
        embedded_dense = self.dense_arch.apply(
            dense_params["dense_arch"], dense_features
        )
        interactions = self._interaction().apply(
            dense_params["interaction"], embedded_dense, emb_values.reshape(b, f, d)
        )
        return self.over_arch.apply(dense_params["over_arch"], interactions)[:, 0]


@dataclasses.dataclass(frozen=True)
class DLRM_Projection(DLRM):
    """DLRM with MLP-projected interactions (reference dlrm.py:633)."""

    interaction_branch1_layer_sizes: Tuple[int, ...] = ()
    interaction_branch2_layer_sizes: Tuple[int, ...] = ()

    def _interaction(self):
        return InteractionProjectionArch(
            self.sparse_arch.num_features,
            self.sparse_arch.embedding_dim,
            tuple(self.interaction_branch1_layer_sizes),
            tuple(self.interaction_branch2_layer_sizes),
        )

    def _over_in(self) -> int:
        d = self.sparse_arch.embedding_dim
        inter = self._interaction()
        return d + inter.i1 * inter.i2

    def init(self, key: jax.Array) -> Params:
        p = super().init(key)
        p["interaction"] = self._interaction().init(jax.random.fold_in(key, 7))
        return p

    def forward_dense(self, dense_params, dense_features, emb_values):
        b = dense_features.shape[0]
        f, d = self.sparse_arch.num_features, self.sparse_arch.embedding_dim
        embedded_dense = self.dense_arch.apply(
            dense_params["dense_arch"], dense_features
        )
        interactions = self._interaction().apply(
            dense_params["interaction"], embedded_dense, emb_values.reshape(b, f, d)
        )
        return self.over_arch.apply(dense_params["over_arch"], interactions)[:, 0]


@dataclasses.dataclass(frozen=True)
class DLRM_Transformer(DLRM):
    """DLRM with transformer-encoder interactions (reference
    models/experimental/transformerdlrm.py:94)."""

    nhead: int = 8
    ntransformer_layers: int = 4
    ff_dim: Optional[int] = None

    def _interaction(self):
        return InteractionTransformerArch(
            self.sparse_arch.num_features,
            self.sparse_arch.embedding_dim,
            nhead=self.nhead,
            ntransformer_layers=self.ntransformer_layers,
            ff_dim=self.ff_dim,
        )

    def _over_in(self) -> int:
        f, d = self.sparse_arch.num_features, self.sparse_arch.embedding_dim
        return (f + 1) * d

    def init(self, key: jax.Array) -> Params:
        p = super().init(key)
        p["interaction"] = self._interaction().init(jax.random.fold_in(key, 7))
        return p

    def forward_dense(self, dense_params, dense_features, emb_values):
        b = dense_features.shape[0]
        f, d = self.sparse_arch.num_features, self.sparse_arch.embedding_dim
        embedded_dense = self.dense_arch.apply(
            dense_params["dense_arch"], dense_features
        )
        interactions = self._interaction().apply(
            dense_params["interaction"], embedded_dense,
            emb_values.reshape(b, f, d),
        )
        return self.over_arch.apply(dense_params["over_arch"], interactions)[:, 0]


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable mean binary cross-entropy with logits."""
    z = jnp.maximum(logits, 0.0)
    loss = z - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


@dataclasses.dataclass(frozen=True)
class DLRMTrain:
    """Train-task wrapper: (batch) -> (loss, (loss, logits, labels))
    (reference dlrm.py:902)."""

    model: DLRM

    def apply(self, params, dense_features, kjt, labels):
        logits = self.model.apply(params, dense_features, kjt)
        loss = bce_with_logits(logits, labels.astype(jnp.float32))
        return loss, (jax.lax.stop_gradient(loss), logits, labels)
