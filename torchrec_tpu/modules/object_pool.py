"""Object pools: id-addressed updatable device storage.

Capability parity with torchrec/modules/object_pool.py (ObjectPool ABC:18),
tensor_pool.py (TensorPool:28) and keyed_jagged_tensor_pool.py
(KeyedJaggedTensorPool:77) — shared-state lookup/update patterns (e.g.
cross-request user-history caches).

TPU-first: pools are explicit array pytrees updated functionally;
KJT storage is a fixed ``[pool_size, F, max_len]`` padded layout (the
reference stores variable-length rows host-side; bounded padding is the
static-shape equivalent and keeps lookup/update one gather/scatter each).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from torchrec_tpu.sparse import KeyedJaggedTensor

__all__ = ["TensorPool", "KeyedJaggedTensorPool"]

State = Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class TensorPool:
    """[pool_size, dim] updatable dense storage (reference tensor_pool.py:28)."""

    pool_size: int
    dim: int
    dtype: jnp.dtype = jnp.float32

    def init_state(self) -> State:
        return {"values": jnp.zeros((self.pool_size, self.dim), self.dtype)}

    def lookup(self, state: State, ids: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(
            state["values"], jnp.clip(ids, 0, self.pool_size - 1), axis=0
        )

    def update(
        self, state: State, ids: jnp.ndarray, values: jnp.ndarray
    ) -> State:
        safe = jnp.where(
            (ids >= 0) & (ids < self.pool_size), ids, self.pool_size
        )
        return {
            "values": state["values"].at[safe].set(
                values.astype(self.dtype), mode="drop"
            )
        }


@dataclasses.dataclass(frozen=True)
class KeyedJaggedTensorPool:
    """Id-addressed jagged storage (reference keyed_jagged_tensor_pool.py:77).

    Each pool row holds, per feature, up to ``max_len`` ids (padded).
    """

    pool_size: int
    keys: Tuple[str, ...]
    max_len: int = 16

    def init_state(self) -> State:
        f = len(self.keys)
        return {
            "values": jnp.zeros(
                (self.pool_size, f, self.max_len), jnp.int32
            ),
            "lengths": jnp.zeros((self.pool_size, f), jnp.int32),
        }

    def update(
        self, state: State, ids: jnp.ndarray, kjt: KeyedJaggedTensor
    ) -> State:
        """Store each example's per-feature id lists at pool rows ``ids``."""
        kjt = kjt.select_keys(list(self.keys)).materialize()
        b = kjt.stride()
        f = len(self.keys)
        dense = _kjt_to_padded(kjt, self.max_len)  # [F, B, max_len]
        dense = jnp.transpose(dense, (1, 0, 2))  # [B, F, max_len]
        lengths = jnp.minimum(kjt.lengths(), self.max_len).T  # [B, F]
        safe = jnp.where((ids >= 0) & (ids < self.pool_size), ids, self.pool_size)
        return {
            "values": state["values"].at[safe].set(dense, mode="drop"),
            "lengths": state["lengths"].at[safe].set(
                lengths.astype(jnp.int32), mode="drop"
            ),
        }

    def lookup(self, state: State, ids: jnp.ndarray) -> KeyedJaggedTensor:
        """Fetch pool rows as a KJT batch of len(ids) examples."""
        safe = jnp.clip(ids, 0, self.pool_size - 1)
        vals = jnp.take(state["values"], safe, axis=0)  # [N, F, max_len]
        lens = jnp.take(state["lengths"], safe, axis=0)  # [N, F]
        return padded_to_kjt(list(self.keys), vals, lens)


def padded_to_kjt(
    keys: List[str], vals: jnp.ndarray, lens: jnp.ndarray
) -> KeyedJaggedTensor:
    """Assemble a KJT batch from dense padded storage rows:
    ``vals [N, F, max_len]`` / ``lens [N, F]`` -> N-example KJT."""
    n, f, max_len = vals.shape
    # flatten feature-major: [F, N, max_len] -> padded value stream
    vals_fm = jnp.transpose(vals, (1, 0, 2)).reshape(f * n, max_len)
    lens_fm = jnp.transpose(lens, (1, 0)).reshape(-1)  # [F*N]
    # compact: write each bag's ids at its offset
    cap = f * n * max_len
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(lens_fm)[:-1]]
    )
    pos_in_bag = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    tgt = offsets[:, None] + pos_in_bag  # [F*N, max_len]
    keep = pos_in_bag < lens_fm[:, None]
    tgt = jnp.where(keep, tgt, cap)
    stream = jnp.zeros((cap,), jnp.int32).at[tgt.reshape(-1)].set(
        vals_fm.reshape(-1), mode="drop"
    )
    return KeyedJaggedTensor(
        keys=list(keys),
        values=stream,
        lengths=lens_fm.reshape(f, n),
    )


def _kjt_to_padded(kjt: KeyedJaggedTensor, max_len: int) -> jnp.ndarray:
    """[F, B, max_len] padded ids from a materialized KJT."""
    b = kjt.stride()
    f = kjt.num_keys
    lengths = kjt.lengths()  # [F, B]
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(lengths.reshape(-1))[:-1]]
    ).reshape(f, b)
    pos = jnp.arange(max_len, dtype=jnp.int32)[None, None, :]
    src = offsets[:, :, None] + pos  # [F, B, max_len]
    keep = pos < lengths[:, :, None]
    cap = kjt.capacity
    src = jnp.where(keep, jnp.minimum(src, cap - 1), cap - 1)
    vals = jnp.take(kjt.values(), src.reshape(-1)).reshape(f, b, max_len)
    return jnp.where(keep, vals, 0)
