"""MovieLens 20M/25M ingest.

Capability parity with torchrec/datasets/movielens.py (_movielens:38,
movielens_20m:81, movielens_25m:110): ratings.csv row dicts with optional
movies.csv join, plus a batcher producing (user, movie) id pairs as a KJT
with the rating as label.
"""

from __future__ import annotations

import csv
import dataclasses
import os
from typing import Dict, Iterator, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from torchrec_tpu.sparse import KeyedJaggedTensor
from torchrec_tpu.training import Batch

__all__ = ["movielens_20m", "movielens_25m", "MovieLensRatingsBatcher"]

RATINGS_FILENAME = "ratings.csv"
MOVIES_FILENAME = "movies.csv"

DEFAULT_RATINGS_COLUMN_NAMES = ["userId", "movieId", "rating", "timestamp"]
DEFAULT_MOVIES_COLUMN_NAMES = ["movieId", "title", "genres"]


def _movielens(
    root: str,
    include_movies_data: bool = False,
) -> Iterator[Dict[str, object]]:
    """Row dicts from ratings.csv, optionally joined with movies.csv
    (reference movielens.py:38)."""
    movies: Dict[str, Dict[str, str]] = {}
    if include_movies_data:
        with open(os.path.join(root, MOVIES_FILENAME), newline="") as f:
            for row in csv.DictReader(f):
                movies[row["movieId"]] = row
    with open(os.path.join(root, RATINGS_FILENAME), newline="") as f:
        for row in csv.DictReader(f):
            out: Dict[str, object] = {
                "userId": int(row["userId"]),
                "movieId": int(row["movieId"]),
                "rating": float(row["rating"]),
                "timestamp": int(row["timestamp"]),
            }
            if include_movies_data:
                m = movies.get(row["movieId"], {})
                out["title"] = m.get("title", "")
                out["genres"] = m.get("genres", "")
            yield out


def movielens_20m(root: str, **kwargs) -> Iterator[Dict[str, object]]:
    """Reference movielens.py:81."""
    return _movielens(root, **kwargs)


def movielens_25m(root: str, **kwargs) -> Iterator[Dict[str, object]]:
    """Reference movielens.py:110."""
    return _movielens(root, **kwargs)


@dataclasses.dataclass
class MovieLensRatingsBatcher:
    """Fixed-shape training batches from a ratings iterator: KJT with
    ``user``/``movie`` single-id features, label = rating (optionally
    binarized at ``positive_threshold``)."""

    root: str
    batch_size: int
    num_users_hash: int = 200_000
    num_movies_hash: int = 200_000
    positive_threshold: Optional[float] = 3.5

    def __iter__(self) -> Iterator[Batch]:
        users: List[int] = []
        movies: List[int] = []
        labels: List[float] = []
        for row in _movielens(self.root):
            users.append(int(row["userId"]) % self.num_users_hash)
            movies.append(int(row["movieId"]) % self.num_movies_hash)
            r = float(row["rating"])
            labels.append(
                float(r > self.positive_threshold)
                if self.positive_threshold is not None
                else r
            )
            if len(users) == self.batch_size:
                yield self._batch(users, movies, labels)
                users, movies, labels = [], [], []

    def _batch(self, users, movies, labels) -> Batch:
        b = len(users)
        values = np.asarray(users + movies, np.int32)
        lengths = np.ones((2, b), np.int32)
        kjt = KeyedJaggedTensor(
            keys=["user", "movie"],
            values=jnp.asarray(values),
            lengths=jnp.asarray(lengths),
        )
        return Batch(
            dense_features=jnp.zeros((b, 1), jnp.float32),
            sparse_features=kjt,
            labels=jnp.asarray(np.asarray(labels, np.float32)),
        )
