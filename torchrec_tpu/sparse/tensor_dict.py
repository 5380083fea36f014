"""Dict/TensorDict-style feature mappings -> KeyedJaggedTensor.

Capability parity with the reference's optional TensorDict interop
(torchrec/sparse/tensor_dict.py::maybe_td_to_kjt — accepts a TensorDict of
per-feature nested/jagged tensors at module boundaries and converts to the
canonical KJT).

TPU-native shape: the accepted mapping values are whatever a host input
pipeline naturally produces — numpy/jax arrays (dense [B, L] with a pad
value, or (values, lengths) pairs), python lists-of-lists, torch dense or
nested tensors (torch is host-side only here), or JaggedTensors. Output is
always the padded static-capacity KJT the kernels consume.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from torchrec_tpu.sparse.jagged import JaggedTensor, KeyedJaggedTensor

__all__ = ["maybe_dict_to_kjt"]


def _one_key(v: Any, pad_value: int):
    """-> (flat int values, [B] lengths, per-id weights | None) for one
    feature."""
    try:  # torch dense / nested tensors (host-side)
        import torch

        if isinstance(v, torch.Tensor):
            if getattr(v, "is_nested", False):
                rows = [t.detach().cpu().numpy().reshape(-1) for t in v.unbind()]
                return (
                    np.concatenate(rows) if rows else np.zeros(0, np.int64),
                    np.array([len(r) for r in rows], np.int32),
                    None,
                )
            v = v.detach().cpu().numpy()
    except ImportError:  # pragma: no cover - torch is in the image
        pass
    if isinstance(v, JaggedTensor):
        w = v.weights_or_none()
        return (
            np.asarray(v.values()),
            np.asarray(v.lengths(), np.int32),
            None if w is None else np.asarray(w, np.float32),
        )
    if isinstance(v, tuple) and len(v) == 2:
        values, lengths = v
        return (
            np.asarray(values).reshape(-1),
            np.asarray(lengths, np.int32).reshape(-1),
            None,
        )
    if isinstance(v, (list,)):  # list of per-example id lists
        rows = [np.asarray(r).reshape(-1) for r in v]
        return (
            np.concatenate(rows) if rows else np.zeros(0, np.int64),
            np.array([len(r) for r in rows], np.int32),
            None,
        )
    arr = np.asarray(v)
    if arr.ndim == 1:  # [B] single id per example
        return arr, np.ones(arr.shape[0], np.int32), None
    if arr.ndim == 2:  # dense [B, L] with pad sentinel
        mask = arr != pad_value
        lengths = mask.sum(axis=1).astype(np.int32)
        return arr[mask].reshape(-1), lengths, None
    raise TypeError(f"cannot interpret feature value of shape {arr.shape}")


def maybe_dict_to_kjt(
    features: Any,
    keys: Optional[Sequence[str]] = None,
    *,
    pad_value: int = -1,
    capacity: Optional[int] = None,
) -> KeyedJaggedTensor:
    """Pass KJTs through; convert feature mappings to a KJT.

    ``keys`` fixes the feature order (default: mapping order). Dense 2-D
    arrays use ``pad_value`` to mark padding slots. ``capacity`` pads the
    value buffer to a static size (stable jit signatures across batches).
    """
    if isinstance(features, KeyedJaggedTensor):
        return features
    if not isinstance(features, Mapping):
        raise TypeError(
            f"expected KJT or feature mapping, got {type(features).__name__}"
        )
    keys = list(keys if keys is not None else features.keys())
    vals, lens, wts = [], [], []
    batch = None
    for k in keys:
        v, l, w = _one_key(features[k], pad_value)
        if batch is None:
            batch = l.shape[0]
        elif l.shape[0] != batch:
            raise ValueError(
                f"feature {k!r}: batch {l.shape[0]} != {batch}"
            )
        vals.append(v.astype(np.int32))
        lens.append(l)
        wts.append(w)
    values = np.concatenate(vals) if vals else np.zeros(0, np.int32)
    lengths = np.concatenate(lens) if lens else np.zeros(0, np.int32)
    weights = None
    if any(w is not None for w in wts):
        # weighted features keep their weights; unweighted ones get 1.0
        weights = np.concatenate(
            [
                w if w is not None else np.ones(len(v), np.float32)
                for v, w in zip(vals, wts)
            ]
        ) if vals else np.zeros(0, np.float32)
    if capacity is not None:
        if values.shape[0] > capacity:
            raise ValueError(
                f"{values.shape[0]} values exceed capacity {capacity}"
            )
        pad = capacity - values.shape[0]
        values = np.pad(values, (0, pad))
        if weights is not None:
            weights = np.pad(weights, (0, pad))
    return KeyedJaggedTensor.from_lengths(
        keys,
        jnp.asarray(values),
        jnp.asarray(lengths),
        weights=None if weights is None else jnp.asarray(weights, jnp.float32),
    )
