"""Criteo (Kaggle / Terabyte) ingest.

Capability parity with torchrec/datasets/criteo.py: TSV datapipes
(criteo_terabyte:143, criteo_kaggle:171), ``BinaryCriteoUtils`` tsv->npy
conversion + day splits (:198), and ``InMemoryBinaryCriteoIterDataPipe``
(:715 — per-rank npy slices, shuffle, hash-mod, fixed batches).

Layout constants mirror the reference (criteo.py:62-67):
13 int ("dense") features, 26 categorical features, 1 label.

TPU-first notes: batches come out with STATIC shapes (fixed batch size,
fixed per-feature single-id lists — Criteo categorical features are
exactly one id each, so the KJT has constant lengths == 1 and the whole
epoch reuses one XLA program). Dense ints take the reference's
log(x+3)/log(|x|+3) transform when ``transform_dense`` is set.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from torchrec_tpu.sparse import KeyedJaggedTensor
from torchrec_tpu.training import Batch

__all__ = [
    "INT_FEATURE_COUNT",
    "CAT_FEATURE_COUNT",
    "DEFAULT_INT_NAMES",
    "DEFAULT_CAT_NAMES",
    "BinaryCriteoUtils",
    "InMemoryBinaryCriteoIterDataPipe",
    "criteo_tsv_reader",
]

INT_FEATURE_COUNT = 13
CAT_FEATURE_COUNT = 26
DEFAULT_LABEL_NAME = "label"
DEFAULT_INT_NAMES: List[str] = [f"int_{i}" for i in range(INT_FEATURE_COUNT)]
DEFAULT_CAT_NAMES: List[str] = [f"cat_{i}" for i in range(CAT_FEATURE_COUNT)]


def criteo_tsv_reader(path: str) -> Iterator[Dict[str, object]]:
    """Row dicts from a Criteo-format TSV (reference _default_row_mapper).

    Missing ints -> 0; categorical hex strings -> int (missing -> 0).
    """
    with open(path, "r") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            # label + 13 + 26
            label = int(parts[0]) if parts[0] else 0
            ints = [
                int(parts[1 + i]) if 1 + i < len(parts) and parts[1 + i] else 0
                for i in range(INT_FEATURE_COUNT)
            ]
            cats = [
                int(parts[14 + i], 16)
                if 14 + i < len(parts) and parts[14 + i]
                else 0
                for i in range(CAT_FEATURE_COUNT)
            ]
            row: Dict[str, object] = {DEFAULT_LABEL_NAME: label}
            row.update(zip(DEFAULT_INT_NAMES, ints))
            row.update(zip(DEFAULT_CAT_NAMES, cats))
            yield row


class BinaryCriteoUtils:
    """tsv -> npy conversion + per-rank row-range math (reference :198)."""

    @staticmethod
    def tsv_to_npys(
        tsv_path: str,
        out_dense_path: str,
        out_sparse_path: str,
        out_labels_path: str,
    ) -> None:
        dense, sparse, labels = [], [], []
        for row in criteo_tsv_reader(tsv_path):
            labels.append(row[DEFAULT_LABEL_NAME])
            dense.append([row[k] for k in DEFAULT_INT_NAMES])
            sparse.append([row[k] for k in DEFAULT_CAT_NAMES])
        np.save(out_dense_path, np.asarray(dense, np.float32))
        np.save(out_sparse_path, np.asarray(sparse, np.int64))
        np.save(out_labels_path, np.asarray(labels, np.int32))

    @staticmethod
    def get_shape_from_npy(path: str) -> Tuple[int, ...]:
        with open(path, "rb") as f:
            np.lib.format.read_magic(f)
            shape, _, _ = np.lib.format.read_array_header_1_0(f)
        return shape

    @staticmethod
    def get_file_row_ranges_and_remainder(
        lengths: Sequence[int],
        rank: int,
        world_size: int,
    ) -> Tuple[Dict[int, Tuple[int, int]], int]:
        """Which [start, stop) row range of each file belongs to ``rank``
        (reference :304): global rows split evenly, remainder to the last."""
        total = sum(lengths)
        per_rank = total // world_size
        remainder = total % world_size
        start_g = rank * per_rank
        stop_g = start_g + per_rank + (remainder if rank == world_size - 1 else 0)
        out: Dict[int, Tuple[int, int]] = {}
        off = 0
        for i, n in enumerate(lengths):
            lo, hi = max(start_g - off, 0), min(stop_g - off, n)
            if lo < hi:
                out[i] = (lo, hi)
            off += n
        return out, remainder


@dataclasses.dataclass
class InMemoryBinaryCriteoIterDataPipe:
    """Per-rank in-memory npy batch iterator (reference :715).

    ``dense_paths/sparse_paths/labels_paths``: day-file npys (criteo layout
    [N, 13] float32 / [N, 26] int / [N] int).
    """

    dense_paths: Sequence[str]
    sparse_paths: Sequence[str]
    labels_paths: Sequence[str]
    batch_size: int
    rank: int = 0
    world_size: int = 1
    shuffle_batches: bool = False
    hashes: Optional[Sequence[int]] = None  # per-cat-feature hash mod
    transform_dense: bool = True
    drop_last: bool = True
    seed: int = 0

    def __post_init__(self):
        lengths = [
            BinaryCriteoUtils.get_shape_from_npy(p)[0] for p in self.dense_paths
        ]
        ranges, _ = BinaryCriteoUtils.get_file_row_ranges_and_remainder(
            lengths, self.rank, self.world_size
        )
        dense, sparse, labels = [], [], []
        for i, (lo, hi) in ranges.items():
            dense.append(np.load(self.dense_paths[i])[lo:hi])
            sparse.append(np.load(self.sparse_paths[i])[lo:hi])
            labels.append(np.load(self.labels_paths[i])[lo:hi])
        self._dense = np.concatenate(dense) if dense else np.zeros((0, 13), np.float32)
        self._sparse = np.concatenate(sparse) if sparse else np.zeros((0, 26), np.int64)
        self._labels = np.concatenate(labels) if labels else np.zeros((0,), np.int32)
        if self.hashes is not None:
            self._sparse = self._sparse % np.asarray(self.hashes, np.int64)[None, :]
        if self.transform_dense:
            d = self._dense
            self._dense = np.log(np.abs(d) + 3.0, dtype=np.float32) * np.sign(d)

    def __len__(self) -> int:
        n = self._dense.shape[0]
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Batch]:
        n = self._dense.shape[0]
        order = np.arange(n)
        if self.shuffle_batches:
            np.random.default_rng(self.seed).shuffle(order)
        b = self.batch_size
        for i in range(len(self)):
            idx = order[i * b : (i + 1) * b]
            # drop_last=False yields a genuinely SMALLER tail batch (the
            # reference's last_batch_sizes, criteo.py:831) — padding it
            # with copies of row 0 would flow fake examples into loss and
            # metrics with no mask. The shape change costs one extra jit
            # compile per epoch; use drop_last=True for static shapes.
            bi = len(idx)
            dense = self._dense[idx]
            cats = self._sparse[idx]  # [B, 26]
            labels = self._labels[idx].astype(np.float32)
            # criteo cat features: exactly one id per example per feature
            values = cats.T.reshape(-1).astype(np.int32)  # feature-major
            lengths = np.ones((CAT_FEATURE_COUNT, bi), np.int32)
            kjt = KeyedJaggedTensor(
                keys=DEFAULT_CAT_NAMES,
                values=jnp.asarray(values),
                lengths=jnp.asarray(lengths),
            )
            yield Batch(
                dense_features=jnp.asarray(dense.astype(np.float32)),
                sparse_features=kjt,
                labels=jnp.asarray(labels),
            )


def criteo_terabyte(paths, **kwargs) -> "object":
    """Reference criteo.py:143 — iterate rows across the 24 day files."""
    def gen():
        for p in paths:
            yield from criteo_tsv_reader(p)
    return gen()


def criteo_kaggle(path, **kwargs) -> "object":
    """Reference criteo.py:171 — the single Kaggle train.txt file."""
    return criteo_tsv_reader(path)
