"""KeyValueEmbeddingBagCollection — host-backed cached embedding tables
(the UVM-caching / SSD tier).

Capability parity with torchrec/distributed/batched_embedding_kernel.py's
KeyValueEmbeddingBag (SSDTableBatchedEmbeddingBags wrapper, :3148),
ZeroCollisionKeyValueEmbedding (:2126 "KVZCH" — collision-free unbounded
ids on a bounded device table) and the FUSED_UVM_CACHING kernel
(HBM cache over host memory).

TPU-first composition from first-class parts already in the framework:

* the C++ **IDTransformer** (cpp/dynamic_embedding/id_transformer.cc) maps
  unbounded raw ids -> bounded HBM cache slots host-side, in the input
  pipeline — the device program only ever sees int32 slots (the role UVM
  page-faulting plays for FBGEMM);
* the C++ **ParameterServer** holds cold rows (+ optimizer state rows) in
  host RAM — the DRAM/SSD tier;
* cache fill/spill is two bounded transfers per step: evicted slot rows
  are pulled from HBM and pushed to the PS; newly-admitted ids' rows are
  pulled from the PS and scattered into the HBM cache with the Pallas
  row-RMW kernel path (O(touched rows), no full-cache traffic).

The wrapped EBC sees a normal bounded table, so lookup/backward/fused
optimizers are the standard fused path.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.modules.embedding_configs import EmbeddingBagConfig
from torchrec_tpu.modules.embedding_modules import EmbeddingBagCollection
from torchrec_tpu.sparse import KeyedJaggedTensor

__all__ = ["KeyValueEmbeddingBagCollection"]


class KeyValueEmbeddingBagCollection:
    """EBC over virtual (unbounded-id) tables with bounded HBM caches.

    ``cache_rows``: per-table device cache capacity. Raw ids may span the
    full int64 range; per-table optimizer state rows ride along in the PS
    as extra columns (reference: SSD tables checkpoint optimizer state with
    the rows, ShardingBucketMetadata).
    """

    def __init__(
        self,
        tables: Sequence[EmbeddingBagConfig],
        cache_rows: Dict[str, int],
        optimizer_state_width: int = 1,  # rowwise-adagrad momentum scalar
    ):
        from torchrec_tpu.dynamic_embedding import (
            IDTransformer,
            ParameterServer,
        )

        cached = [
            EmbeddingBagConfig(
                name=t.name,
                num_embeddings=cache_rows[t.name],
                embedding_dim=t.embedding_dim,
                feature_names=list(t.feature_names),
                pooling=t.pooling,
            )
            for t in tables
        ]
        self._virtual_tables = list(tables)
        self._ebc = EmbeddingBagCollection(cached)
        self._cache_rows = dict(cache_rows)
        self._osw = optimizer_state_width
        self._idt = {
            t.name: IDTransformer(cache_rows[t.name]) for t in tables
        }
        # PS rows carry [dim | optimizer state] so spill/fill moves both
        self._ps = {
            t.name: ParameterServer(t.embedding_dim + optimizer_state_width)
            for t in tables
        }
        self._feature_to_table = {
            f: t.name for t in tables for f in t.feature_names
        }

    @property
    def embedding_bag_collection(self) -> EmbeddingBagCollection:
        return self._ebc

    def init(self, key: jax.Array):
        return self._ebc.init(key)

    def init_optimizer(self, params, optimizer):
        return self._ebc.init_optimizer(params, optimizer)

    def transform(
        self,
        kjt_keys: Sequence[str],
        values: np.ndarray,
        lengths: np.ndarray,
        params,
        opt_states,
        optimizer,
    ):
        """Host-side pre-batch transform: remap raw ids -> cache slots,
        spilling evicted rows to the PS and filling admitted rows from it.

        Returns (remapped int32 values, params, opt_states). Must run
        BEFORE the jitted step (the reference's UVM prefetch phase /
        dynamic-embedding dataloader transform).
        """
        per_key = lengths.sum(axis=1)
        offs = np.concatenate([[0], np.cumsum(per_key)]).astype(np.int64)
        out = values.astype(np.int64).copy()
        for tname, idt in self._idt.items():
            feats = [
                i for i, k in enumerate(kjt_keys)
                if self._feature_to_table.get(k) == tname
            ]
            if not feats:
                continue
            spans = [(int(offs[i]), int(offs[i + 1])) for i in feats]
            gids = np.concatenate([values[a:b] for a, b in spans]).astype(
                np.int64
            )
            if not len(gids):
                continue
            before = idt.export_state()
            cids, evicted_g, evicted_s = idt.transform(gids)
            params, opt_states = self._spill_and_fill(
                tname, idt, evicted_g, evicted_s, gids, cids,
                params, opt_states,
            )
            pos = 0
            for a, b in spans:
                out[a:b] = cids[pos : pos + (b - a)]
                pos += b - a
        return out.astype(np.int32), params, opt_states

    def _spill_and_fill(
        self, tname, idt, evicted_g, evicted_s, gids, cids, params, opt_states
    ):
        ebc = self._ebc
        ti = next(i for i, t in enumerate(ebc._tables) if t.name == tname)
        gi, row_off = ebc._table_group[ti]
        grp = ebc._groups[gi]
        dim = grp.dim
        ps = self._ps[tname]

        if len(evicted_g):
            # spill: device rows + optimizer state -> PS
            slots = np.asarray(evicted_s, np.int64) + row_off
            rows = np.asarray(
                jax.device_get(params[grp.key][jnp.asarray(slots)])
            )
            st_cols = np.zeros((len(slots), self._osw), np.float32)
            if opt_states and "momentum" in opt_states.get(grp.key, {}):
                st_cols[:, 0] = np.asarray(
                    jax.device_get(
                        opt_states[grp.key]["momentum"][jnp.asarray(slots)]
                    )
                )
            ps.push(evicted_g, np.concatenate([rows, st_cols], axis=1))

        # fill: ids that are newly mapped need their rows from the PS
        # (rows never seen before come back zero-filled = fresh init)
        uniq, first = np.unique(gids, return_index=True)
        slots_of = cids[first].astype(np.int64)
        fetched, hits = ps.pull(uniq)
        if hits or len(evicted_g):
            need = np.abs(fetched).sum(axis=1) > 0  # only rows with history
            if need.any():
                tgt = jnp.asarray(slots_of[need] + row_off, jnp.int32)
                rows = jnp.asarray(fetched[need, :dim])
                params = dict(params)
                params[grp.key] = params[grp.key].at[tgt].set(rows)
                if opt_states and "momentum" in opt_states.get(grp.key, {}):
                    opt_states = dict(opt_states)
                    sub = dict(opt_states[grp.key])
                    sub["momentum"] = sub["momentum"].at[tgt].set(
                        jnp.asarray(fetched[need, dim])
                    )
                    opt_states[grp.key] = sub
        return params, opt_states

    def apply(self, params, kjt: KeyedJaggedTensor):
        """Device-side lookup (ids must already be transformed slots)."""
        return self._ebc.apply(params, kjt)

    def apply_gradients(self, params, opt_states, optimizer, kjt, kt_grad,
                        lr=None):
        return self._ebc.apply_gradients(
            params, opt_states, optimizer, kjt, kt_grad, lr=lr
        )

    # ------------------------------------------------------------ checkpoint
    def export_tier_state(self) -> Dict[str, Dict[str, np.ndarray]]:
        """Bucket-aware checkpoint metadata: per table, the id->slot map
        (reference ShardingBucketMetadata for KVZCH/SSD tables)."""
        out = {}
        for tname, idt in self._idt.items():
            gids, slots = idt.export_state()
            out[tname] = {"global_ids": gids, "slots": slots}
        return out

    def restore_tier_state(self, state: Dict[str, Dict[str, np.ndarray]]):
        from torchrec_tpu.dynamic_embedding import IDTransformer

        for tname, s in state.items():
            idt = IDTransformer(self._cache_rows[tname])
            idt.restore_state(s["global_ids"], s["slots"])
            self._idt[tname] = idt
