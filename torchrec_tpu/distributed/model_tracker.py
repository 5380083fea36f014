"""Model delta tracker: which embedding rows changed since the last
checkpoint/publish.

Capability parity with torchrec/distributed/model_tracker/
(ModelDeltaTracker model_delta_tracker.py:66, TrackingMode types.py:52
ID_ONLY / EMBEDDING, delta store, DMP hooks model_parallel.py:369-380):
per-batch touched-id recording for incremental checkpointing / online
publishing of only the rows that moved.

TPU-first: tracking state is an explicit fixed-shape pytree updated inside
the jitted step (a [rows] touch-count per table — no host sync per batch);
``get_delta`` pulls the counts once at publish time and materializes
(ids, rows) host-side.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.sparse import KeyedJaggedTensor

__all__ = ["TrackingMode", "ModelDeltaTracker"]


class TrackingMode:
    """What the delta tracker records per batch (reference model_tracker/types.py:52)."""

    ID_ONLY = "id_only"  # reference types.py:52
    EMBEDDING = "embedding"  # ids + current rows at publish


class ModelDeltaTracker:
    """Per-table touched-row tracking for a collection of tables.

    ``table_rows``: table name -> row count; ``feature_to_table`` routes
    KJT features. Use :meth:`record` inside the train step (pure function
    of the state pytree) and :meth:`get_delta`/:meth:`reset` at publish
    points (reference get_delta + per-consumer compact, delta_store).
    """

    def __init__(
        self,
        table_rows: Dict[str, int],
        feature_to_table: Dict[str, str],
        mode: str = TrackingMode.ID_ONLY,
    ):
        self.table_rows = dict(table_rows)
        self.feature_to_table = dict(feature_to_table)
        self.mode = mode

    def init_state(self) -> Dict[str, jnp.ndarray]:
        return {
            name: jnp.zeros((rows,), jnp.int32)
            for name, rows in self.table_rows.items()
        }

    def record(
        self, state: Dict[str, jnp.ndarray], kjt: KeyedJaggedTensor
    ) -> Dict[str, jnp.ndarray]:
        """Accumulate per-row touch counts from one batch (jit-safe)."""
        kjt = kjt.materialize()
        b = kjt.stride()
        f = kjt.num_keys
        seg = kjt.segment_ids()
        slot_feature = jnp.minimum(seg // b, f)
        values = kjt.values()
        valid = kjt.valid_mask()
        keys = kjt.keys()
        new_state = dict(state)
        for tname, rows in self.table_rows.items():
            feats = [
                i for i, k in enumerate(keys)
                if self.feature_to_table.get(k) == tname
            ]
            if not feats:
                continue
            member = np.zeros(f + 1, np.bool_)
            member[feats] = True
            mine = jnp.take(jnp.asarray(member), slot_feature) & valid
            tgt = jnp.where(mine, jnp.clip(values, 0, rows - 1), rows)
            new_state[tname] = new_state[tname].at[tgt].add(
                jnp.ones_like(tgt), mode="drop"
            )
        return new_state

    def get_delta_ids(
        self, state: Dict[str, jnp.ndarray]
    ) -> Dict[str, np.ndarray]:
        """Host-side: table -> sorted touched row ids (reference
        get_delta_ids)."""
        out = {}
        for name, counts in state.items():
            c = np.asarray(jax.device_get(counts))
            out[name] = np.nonzero(c)[0].astype(np.int64)
        return out

    def get_delta(
        self,
        state: Dict[str, jnp.ndarray],
        table_weights: Optional[Dict[str, jnp.ndarray]] = None,
        top_k: Optional[int] = None,
    ) -> Dict[str, Tuple[np.ndarray, Optional[np.ndarray]]]:
        """table -> (touched ids, rows or None). ``top_k`` keeps the most
        frequently touched rows only (reference top-k incremental publish,
        model_parallel.py:399-410). EMBEDDING mode requires
        ``table_weights`` (full per-table weights, e.g. from
        unshard_params)."""
        out: Dict[str, Tuple[np.ndarray, Optional[np.ndarray]]] = {}
        for name, counts in state.items():
            c = np.asarray(jax.device_get(counts))
            ids = np.nonzero(c)[0]
            if top_k is not None and len(ids) > top_k:
                ids = ids[np.argsort(-c[ids], kind="stable")[:top_k]]
                ids = np.sort(ids)
            rows = None
            if self.mode == TrackingMode.EMBEDDING:
                if table_weights is None:
                    raise ValueError("EMBEDDING mode needs table_weights")
                rows = np.asarray(table_weights[name])[ids]
            out[name] = (ids.astype(np.int64), rows)
        return out

    def reset(self) -> Dict[str, jnp.ndarray]:
        """Fresh state after a publish (reference per-consumer compact)."""
        return self.init_state()
