"""Feature processors: per-id weighting before pooled lookup.

Capability parity with torchrec/modules/feature_processor_.py
(PositionWeightedModule:52, PositionWeightedModuleCollection:175) and the
FeatureProcessedEmbeddingBagCollection composition
(torchrec/modules/fp_embedding_modules.py + sharded fp_embeddingbag.py).

TPU-first: processors are pure functions over explicit param pytrees; the
position of each value inside its bag is derived from the KJT's lengths
with one cumsum + gather (no per-bag loops), and the output is a weighted
KJT feeding a SUM-pooled weighted EmbeddingBagCollection — weights flow
through the existing weighted lookup/backward paths unchanged.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.modules.embedding_modules import EmbeddingBagCollection
from torchrec_tpu.sparse import JaggedTensor, KeyedJaggedTensor, KeyedTensor

__all__ = [
    "PositionWeightedModule",
    "PositionWeightedModuleCollection",
    "FeatureProcessedEmbeddingBagCollection",
]

Params = Dict[str, jnp.ndarray]


def _positions_in_bag(kjt: KeyedJaggedTensor) -> jnp.ndarray:
    """[capacity] position of each value slot within its (feature, example)
    bag; padding slots get 0 (their weight is irrelevant)."""
    lengths_flat = kjt._lengths.reshape(-1).astype(jnp.int32)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(lengths_flat)[:-1]]
    )
    seg = kjt.segment_ids()  # physical stream order
    n_seg = lengths_flat.shape[0]
    seg_phys = jnp.minimum(seg, n_seg)  # OOB -> sentinel
    starts_pad = jnp.concatenate([starts, jnp.zeros((1,), jnp.int32)])
    bag_start = jnp.take(starts_pad, seg_phys)
    pos = jnp.arange(kjt.capacity, dtype=jnp.int32) - bag_start
    return jnp.clip(pos, 0, None)


class PositionWeightedModule:
    """Learnable weight per position within a bag (reference :52)."""

    def __init__(self, max_feature_length: int):
        if max_feature_length <= 0:
            raise ValueError("max_feature_length must be positive")
        self.max_feature_length = max_feature_length

    def init(self, key: jax.Array) -> jnp.ndarray:
        return jnp.ones((self.max_feature_length,), jnp.float32)

    def apply(self, weights: jnp.ndarray, jt: JaggedTensor) -> JaggedTensor:
        lengths_flat = jt.lengths().reshape(-1).astype(jnp.int32)
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(lengths_flat)[:-1]]
        )
        cap = jt.values().shape[0]
        b = lengths_flat.shape[0]
        from torchrec_tpu.sparse.jagged import _repeat_with_oob_tail

        seg = _repeat_with_oob_tail(
            jnp.arange(b, dtype=jnp.int32), jt.lengths(), cap, b
        )
        bag_start = jnp.take(
            jnp.concatenate([starts, jnp.zeros((1,), jnp.int32)]),
            jnp.minimum(seg, b),
        )
        pos = jnp.clip(
            jnp.arange(cap, dtype=jnp.int32) - bag_start,
            0,
            self.max_feature_length - 1,
        )
        return JaggedTensor(
            values=jt.values(),
            lengths=jt.lengths(),
            weights=jnp.take(weights, pos),
        )


class PositionWeightedModuleCollection:
    """Position weighting across a KJT (reference :175).

    ``max_feature_lengths``: feature name -> max bag length. Features not
    listed pass through with weight 1.
    """

    def __init__(self, max_feature_lengths: Dict[str, int]):
        self.max_feature_lengths = dict(max_feature_lengths)
        self._max_len = max(max_feature_lengths.values()) if max_feature_lengths else 1

    def init(self, key: jax.Array) -> Params:
        return {
            f"position_weights.{name}": jnp.ones((mfl,), jnp.float32)
            for name, mfl in self.max_feature_lengths.items()
        }

    def apply(self, params: Params, kjt: KeyedJaggedTensor) -> KeyedJaggedTensor:
        kjt = kjt.materialize()
        keys = kjt.keys()
        b = kjt.stride()
        f = kjt.num_keys
        pos = _positions_in_bag(kjt)
        seg = kjt.segment_ids()
        slot_feature = jnp.minimum(seg // b, f)

        # stack per-feature weight tables into [F, max_len] (missing -> 1)
        table = np.ones((f + 1, self._max_len), np.float32)
        w_stack = jnp.asarray(table)
        for fi, name in enumerate(keys):
            if name in self.max_feature_lengths:
                mfl = self.max_feature_lengths[name]
                row = jnp.ones((self._max_len,), jnp.float32)
                row = jax.lax.dynamic_update_slice(
                    row, params[f"position_weights.{name}"], (0,)
                )
                w_stack = w_stack.at[fi].set(row)
        pos_c = jnp.clip(pos, 0, self._max_len - 1)
        weights = w_stack[slot_feature, pos_c]
        return KeyedJaggedTensor(
            keys=keys,
            values=kjt.values(),
            lengths=kjt._lengths,
            weights=weights,
        )


class FeatureProcessedEmbeddingBagCollection:
    """Processor + weighted EBC (reference fp_embedding_modules.py:27).

    The wrapped EBC must be ``is_weighted=True`` (SUM pooling).
    """

    def __init__(
        self,
        embedding_bag_collection: EmbeddingBagCollection,
        feature_processors: PositionWeightedModuleCollection,
    ):
        if not embedding_bag_collection.is_weighted():
            raise ValueError(
                "FeatureProcessedEmbeddingBagCollection requires a weighted EBC"
            )
        self._ebc = embedding_bag_collection
        self._fp = feature_processors

    @property
    def embedding_bag_collection(self) -> EmbeddingBagCollection:
        return self._ebc

    def init(self, key: jax.Array) -> Params:
        params = self._ebc.init(key)
        params.update(self._fp.init(jax.random.fold_in(key, 1)))
        return params

    def apply(self, params: Params, kjt: KeyedJaggedTensor) -> KeyedTensor:
        weighted = self._fp.apply(params, kjt)
        return self._ebc.apply(params, weighted)

    def fp_grads(
        self, params: Params, kjt: KeyedJaggedTensor, kt_grad: jnp.ndarray
    ) -> Params:
        """Gradients of the position weights via jax.grad over the weighted
        forward (the dense autodiff path — position weights are dense
        params, unlike the sparse tables)."""
        fp_keys = [k for k in params if k.startswith("position_weights.")]

        def f(fp_params):
            p = {**params, **fp_params}
            kt = self.apply(p, kjt)
            return jnp.vdot(kt.values(), kt_grad)

        return jax.grad(f)({k: params[k] for k in fp_keys})
