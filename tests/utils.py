"""Shared test fixtures: random sparse-batch generators + numpy oracles.

Analog of the reference's torchrec/distributed/test_utils/test_model.py
(ModelInput.generate:54) — generates one *global* batch plus numpy
ground-truth structures for equivalence oracles.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from torchrec_tpu.sparse import KeyedJaggedTensor


@dataclasses.dataclass
class NumpyKJT:
    """Ground-truth ragged batch in plain numpy lists-of-lists."""

    keys: List[str]
    ids: Dict[str, List[List[int]]]  # key -> per-example id lists
    weights: Optional[Dict[str, List[List[float]]]] = None

    @property
    def batch_size(self) -> int:
        return len(next(iter(self.ids.values())))

    def pooled(
        self, tables: Dict[str, np.ndarray], pooling: str = "SUM"
    ) -> Dict[str, np.ndarray]:
        """Per-key pooled embeddings oracle."""
        out = {}
        for key in self.keys:
            table = tables[key]
            d = table.shape[1]
            rows = []
            for b, idlist in enumerate(self.ids[key]):
                if len(idlist) == 0:
                    rows.append(np.zeros(d, dtype=np.float64))
                    continue
                emb = table[np.array(idlist)].astype(np.float64)
                if self.weights is not None:
                    emb = emb * np.array(self.weights[key][b])[:, None]
                v = emb.sum(0)
                if pooling == "MEAN":
                    v = v / len(idlist)
                rows.append(v)
            out[key] = np.stack(rows)
        return out


def make_numpy_kjt(
    rng: np.random.Generator,
    keys: Sequence[str],
    batch_size: int,
    num_embeddings: Dict[str, int],
    max_length: int = 8,
    weighted: bool = False,
    allow_empty: bool = True,
) -> NumpyKJT:
    ids: Dict[str, List[List[int]]] = {}
    weights: Dict[str, List[List[float]]] = {}
    lo = 0 if allow_empty else 1
    for key in keys:
        n = num_embeddings[key]
        per_example = []
        per_example_w = []
        for _ in range(batch_size):
            length = int(rng.integers(lo, max_length + 1))
            per_example.append(rng.integers(0, n, size=length).tolist())
            per_example_w.append(rng.uniform(0.5, 1.5, size=length).tolist())
        ids[key] = per_example
        weights[key] = per_example_w
    return NumpyKJT(
        keys=list(keys), ids=ids, weights=weights if weighted else None
    )


def to_kjt(nk: NumpyKJT, capacity: Optional[int] = None) -> KeyedJaggedTensor:
    """Pack a NumpyKJT into a padded-buffer KeyedJaggedTensor."""
    values: List[int] = []
    w: List[float] = []
    lengths = np.zeros((len(nk.keys), nk.batch_size), dtype=np.int32)
    for f, key in enumerate(nk.keys):
        for b, idlist in enumerate(nk.ids[key]):
            lengths[f, b] = len(idlist)
            values.extend(idlist)
            if nk.weights is not None:
                w.extend(nk.weights[key][b])
    total = len(values)
    cap = capacity if capacity is not None else max(total, 1)
    assert cap >= total, f"capacity {cap} < total {total}"
    vals = np.zeros(cap, dtype=np.int32)
    vals[:total] = values
    weights_arr = None
    if nk.weights is not None:
        weights_arr = np.ones(cap, dtype=np.float32)
        weights_arr[:total] = w
    return KeyedJaggedTensor(
        keys=nk.keys,
        values=jnp.asarray(vals),
        lengths=jnp.asarray(lengths),
        weights=jnp.asarray(weights_arr) if weights_arr is not None else None,
    )


def make_tables(
    rng: np.random.Generator,
    num_embeddings: Dict[str, int],
    dims: Dict[str, int],
) -> Dict[str, np.ndarray]:
    return {
        k: rng.normal(size=(n, dims[k])).astype(np.float32)
        for k, n in num_embeddings.items()
    }
