"""Structural validation for KeyedJaggedTensor.

Capability parity with the reference's
``torchrec/sparse/jagged_tensor_validator.py:20``. Host-side (numpy) checks —
not for use inside jit.
"""

from __future__ import annotations

import numpy as np

from torchrec_tpu.sparse.jagged import KeyedJaggedTensor


def validate_keyed_jagged_tensor(
    kjt: KeyedJaggedTensor,
    num_embeddings_per_key: dict | None = None,
) -> None:
    """Raise ValueError on structural inconsistency.

    Checks (mirroring the reference validator):
      * lengths non-negative
      * total logical length fits the padded values capacity
      * weights (if present) match values capacity
      * ids in-bounds per key when table sizes are provided
    """
    lengths = np.asarray(kjt.lengths())
    if (lengths < 0).any():
        raise ValueError("KJT lengths must be non-negative")
    total = int(np.asarray(kjt._lengths).sum())
    if total > kjt.capacity:
        raise ValueError(
            f"KJT total length {total} exceeds values capacity {kjt.capacity}"
        )
    if kjt.weights_or_none() is not None:
        w = np.asarray(kjt.weights())
        if w.shape[0] != kjt.capacity:
            raise ValueError(
                f"weights capacity {w.shape[0]} != values capacity {kjt.capacity}"
            )
    if num_embeddings_per_key:
        values = np.asarray(kjt.values())
        seg = np.asarray(kjt.segment_ids())
        b = kjt.stride()
        for i, key in enumerate(kjt.keys()):
            if key not in num_embeddings_per_key:
                continue
            mask = (seg >= i * b) & (seg < (i + 1) * b)
            ids = values[mask]
            n = num_embeddings_per_key[key]
            if ids.size and (ids.min() < 0 or ids.max() >= n):
                raise ValueError(
                    f"ids for key {key!r} out of range [0, {n}): "
                    f"min={ids.min()}, max={ids.max()}"
                )
