"""Learnable synthetic click streams: a planted ground-truth click model.

Extends the reference's RandomRecDataset shape (datasets/random.py:125 —
whose labels are COIN FLIPS, so no trainer can beat AUC 0.5) with labels
drawn from a planted logistic model over the same features. A correctly
wired trainer provably recovers signal: end-to-end quality tests pin the
reachable AUC (tests/test_golden_quality.py), mirroring how the
reference's golden_training example is validated against Criteo AUC
externally (facebookresearch/dlrm baselines; see BASELINE.md).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from torchrec_tpu.sparse import KeyedJaggedTensor
from torchrec_tpu.training import Batch

__all__ = ["ClickModelRecDataset"]


@dataclasses.dataclass
class ClickModelRecDataset:
    """Criteo-shaped batches whose labels follow a planted click model.

    label ~ Bernoulli(sigmoid(signal_scale * score)) with
    ``score = dense @ w / sqrt(D) + sum_f mean(theta_f[ids_f])`` — dense
    weights ``w`` and per-id propensities ``theta_f`` are drawn once from
    ``truth_seed`` (default: ``seed``). Held-out eval streams must share
    ``truth_seed`` with the train stream and vary only ``seed``. ``bayes_score()`` exposes the planted score so tests can
    compare a trained model's AUC against the Bayes-optimal ranking.
    """

    keys: Sequence[str]
    batch_size: int
    hash_sizes: Sequence[int]  # per key (or broadcast one)
    ids_per_feature: int = 2
    num_dense: int = 13
    max_length: int = 8
    signal_scale: float = 2.0
    seed: int = 0
    truth_seed: Optional[int] = None  # planted-model seed; defaults to seed

    def __post_init__(self):
        if len(self.hash_sizes) == 1:
            self.hash_sizes = list(self.hash_sizes) * len(self.keys)
        if len(self.hash_sizes) != len(self.keys):
            raise ValueError("hash_sizes must match keys")
        self.capacity = len(self.keys) * self.batch_size * self.max_length
        ts = self.seed if self.truth_seed is None else self.truth_seed
        truth = np.random.default_rng(ts ^ 0x5EED)
        self._w = truth.normal(size=self.num_dense).astype(np.float32)
        self._theta = [
            truth.normal(size=h).astype(np.float32) for h in self.hash_sizes
        ]

    def _score(self, dense: np.ndarray, lengths, values) -> np.ndarray:
        """Planted score for a batch laid out feature-major."""
        b = dense.shape[0]
        s = dense @ self._w / np.sqrt(self.num_dense)
        pos = 0
        for fi in range(len(self.keys)):
            th = self._theta[fi]
            for ex in range(b):
                n = int(lengths[fi, ex])
                if n:
                    s[ex] += th[values[pos : pos + n]].mean()
                pos += n
        return s

    def bayes_score(self, batch: Batch) -> np.ndarray:
        """Planted score of a batch produced by THIS dataset (the
        Bayes-optimal ranking for its labels)."""
        kjt = batch.sparse_features
        return self._score(
            np.asarray(batch.dense_features),
            np.asarray(kjt.lengths()),
            np.asarray(kjt.values()),
        )

    def __iter__(self) -> Iterator[Batch]:
        rng = np.random.default_rng(self.seed)
        f, b = len(self.keys), self.batch_size
        while True:
            lengths = np.minimum(
                rng.poisson(self.ids_per_feature, size=(f, b)),
                self.max_length,
            ).astype(np.int32)
            values = np.zeros(self.capacity, dtype=np.int32)
            pos = 0
            for fi in range(f):
                n = int(lengths[fi].sum())
                values[pos : pos + n] = rng.integers(
                    0, self.hash_sizes[fi], size=n
                )
                pos += n
            dense = rng.normal(size=(b, self.num_dense)).astype(np.float32)
            score = self._score(dense, lengths, values)
            p = 1.0 / (1.0 + np.exp(-self.signal_scale * score))
            labels = (rng.uniform(size=b) < p).astype(np.float32)
            yield Batch(
                dense_features=jnp.asarray(dense),
                sparse_features=KeyedJaggedTensor(
                    keys=list(self.keys),
                    values=jnp.asarray(values),
                    lengths=jnp.asarray(lengths),
                ),
                labels=jnp.asarray(labels),
            )
