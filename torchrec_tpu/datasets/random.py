"""Synthetic recommendation batches.

Capability parity with torchrec/datasets/random.py:125 (RandomRecDataset):
criteo-shaped batches of dense floats + KJT id-lists + binary labels, with
per-feature hash sizes and Poisson-ish lengths. Host-side numpy generation
(cheap, overlappable with device compute); a fixed value-buffer capacity
keeps shapes static across steps (one XLA program).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from torchrec_tpu.sparse import KeyedJaggedTensor
from torchrec_tpu.training import Batch

__all__ = ["RandomRecDataset"]


@dataclasses.dataclass
class RandomRecDataset:
    """Synthetic dense+KJT+label batches (reference datasets/random.py:125)."""

    keys: Sequence[str]
    batch_size: int
    hash_sizes: Sequence[int]  # per key (or broadcast one)
    ids_per_feature: int = 2  # mean list length
    num_dense: int = 13
    max_length: int = 8
    weighted: bool = False
    seed: int = 0

    def __post_init__(self):
        if len(self.hash_sizes) == 1:
            self.hash_sizes = list(self.hash_sizes) * len(self.keys)
        if len(self.hash_sizes) != len(self.keys):
            raise ValueError("hash_sizes must match keys")
        # static value-buffer capacity: F * B * max_length upper bound
        self.capacity = len(self.keys) * self.batch_size * self.max_length

    def __iter__(self) -> Iterator[Batch]:
        rng = np.random.default_rng(self.seed)
        f, b = len(self.keys), self.batch_size
        while True:
            lengths = np.minimum(
                rng.poisson(self.ids_per_feature, size=(f, b)), self.max_length
            ).astype(np.int32)
            total = int(lengths.sum())
            values = np.zeros(self.capacity, dtype=np.int32)
            pos = 0
            for fi in range(f):
                n = int(lengths[fi].sum())
                values[pos : pos + n] = rng.integers(
                    0, self.hash_sizes[fi], size=n
                )
                pos += n
            weights = None
            if self.weighted:
                weights = np.ones(self.capacity, dtype=np.float32)
                weights[:total] = rng.uniform(0.1, 2.0, size=total)
            kjt = KeyedJaggedTensor(
                keys=list(self.keys),
                values=jnp.asarray(values),
                lengths=jnp.asarray(lengths),
                weights=jnp.asarray(weights) if weights is not None else None,
            )
            yield Batch(
                dense_features=jnp.asarray(
                    rng.normal(size=(b, self.num_dense)).astype(np.float32)
                ),
                sparse_features=kjt,
                labels=jnp.asarray(rng.integers(0, 2, size=b).astype(np.float32)),
            )
