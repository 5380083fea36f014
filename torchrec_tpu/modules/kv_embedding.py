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
        ps_provider: str = "memory",
        ps_config: str = "",  # "{table}" expands to the table name
    ):
        from torchrec_tpu.dynamic_embedding import (
            IDTransformer,
            ParameterServer,
        )
        from torchrec_tpu.modules.virtual_table_eviction import (
            EvictionTracker,
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
        # PS rows carry [dim | optimizer state] so spill/fill moves both;
        # ps_provider selects the storage backend (reference io_registry:
        # "file" + per-table paths gives a durable Redis-analog tier)
        self._ps = {
            t.name: ParameterServer(
                t.embedding_dim + optimizer_state_width,
                provider=ps_provider,
                config=ps_config.format(table=t.name),
            )
            for t in tables
        }
        self._feature_to_table = {
            f: t.name for t in tables for f in t.feature_names
        }
        # virtual-table eviction policies (reference embedding_configs.py
        # :181-359) drive the policy-eviction pass; the tracker holds the
        # per-slot metadata the reference packs into the KV row header
        self._policies = {
            t.name: t.virtual_table_eviction_policy for t in tables
        }
        self._trackers = {
            t.name: EvictionTracker(cache_rows[t.name]) for t in tables
        }
        self._clock_min = 0.0  # logical minutes when now_min not supplied

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
        now_min: Optional[float] = None,
    ):
        """Host-side pre-batch transform: remap raw ids -> cache slots,
        spilling evicted rows to the PS and filling admitted rows from it.

        Returns (remapped int32 values, params, opt_states). Must run
        BEFORE the jitted step (the reference's UVM prefetch phase /
        dynamic-embedding dataloader transform). ``now_min``: wall-clock
        minutes for timestamp eviction policies (defaults to a logical
        clock advancing 1/batch, keeping tests deterministic).
        """
        if now_min is None:
            self._clock_min += 1.0
            now_min = self._clock_min
        else:
            self._clock_min = float(now_min)
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
            cids, evicted_g, evicted_s, fresh = idt.transform_with_fresh(gids)
            params, opt_states = self._spill_and_fill(
                tname, idt, evicted_g, evicted_s, gids, cids, fresh,
                params, opt_states,
            )
            tracker = self._trackers[tname]
            tracker.free(evicted_s)
            policy = self._policies[tname]
            score_map = getattr(policy, "feature_score_mapping", None) or {}
            default_score = getattr(
                policy, "feature_score_default_value", 1.0
            )
            pos = 0
            for fi, (a, b) in zip(feats, spans):
                span_cids = cids[pos : pos + (b - a)]
                tracker.touch(
                    span_cids,
                    now_min,
                    feature_score=score_map.get(
                        kjt_keys[fi], default_score
                    ),
                )
                out[a:b] = span_cids
                pos += b - a
        return out.astype(np.int32), params, opt_states

    def _fresh_rows(self, tname: str, gids: np.ndarray, dim: int) -> np.ndarray:
        """Deterministic per-gid fresh-init rows: uniform(-b, b) with
        b = sqrt(1/cache_rows), the default table init bounds — a fresh id
        admitted into a recycled slot must NOT inherit the previous
        tenant's trained row."""
        b = float(np.sqrt(1.0 / self._cache_rows[tname]))
        rows = np.empty((len(gids), dim), np.float32)
        for i, g in enumerate(gids):
            rng = np.random.default_rng(np.uint64(g) ^ np.uint64(0x9E3779B9))
            rows[i] = rng.uniform(-b, b, dim).astype(np.float32)
        return rows

    def _spill_and_fill(
        self, tname, idt, evicted_g, evicted_s, gids, cids, fresh,
        params, opt_states,
    ):
        ebc = self._ebc
        ti = next(i for i, t in enumerate(ebc._tables) if t.name == tname)
        gi, row_off = ebc._table_group[ti]
        grp = ebc._groups[gi]
        dim = grp.dim
        ps = self._ps[tname]

        if len(evicted_g):
            params, opt_states = self._spill(
                tname, evicted_g, evicted_s, params, opt_states
            )

        # fill: newly-mapped ids take their row from the PS if they have
        # history, else a deterministic fresh-init row (their slot may be
        # recycled and hold the previous tenant's values)
        uniq, first = np.unique(gids, return_index=True)
        uniq_fresh = fresh[first]
        slots_of = cids[first].astype(np.int64)
        if uniq_fresh.any():
            f_ids = uniq[uniq_fresh]
            f_slots = slots_of[uniq_fresh]
            fetched, hits = ps.pull(f_ids)
            has_hist = np.abs(fetched).sum(axis=1) > 0
            rows_np = np.where(
                has_hist[:, None],
                fetched[:, :dim],
                self._fresh_rows(tname, f_ids, dim),
            ).astype(np.float32)
            tgt = jnp.asarray(f_slots + row_off, jnp.int32)
            params = dict(params)
            params[grp.key] = params[grp.key].at[tgt].set(
                jnp.asarray(rows_np)
            )
            if opt_states and "momentum" in opt_states.get(grp.key, {}):
                mom = np.where(
                    has_hist, fetched[:, dim], 0.0
                ).astype(np.float32)
                opt_states = dict(opt_states)
                sub = dict(opt_states[grp.key])
                sub["momentum"] = sub["momentum"].at[tgt].set(
                    jnp.asarray(mom)
                )
                opt_states[grp.key] = sub
        return params, opt_states

    def _spill(self, tname, gids, slots, params, opt_states):
        """Device rows + optimizer state rows -> PS (host tier)."""
        ebc = self._ebc
        ti = next(i for i, t in enumerate(ebc._tables) if t.name == tname)
        gi, row_off = ebc._table_group[ti]
        grp = ebc._groups[gi]
        ps = self._ps[tname]
        tgt = np.asarray(slots, np.int64) + row_off
        rows = np.asarray(jax.device_get(params[grp.key][jnp.asarray(tgt)]))
        st_cols = np.zeros((len(tgt), self._osw), np.float32)
        if opt_states and "momentum" in opt_states.get(grp.key, {}):
            st_cols[:, 0] = np.asarray(
                jax.device_get(
                    opt_states[grp.key]["momentum"][jnp.asarray(tgt)]
                )
            )
        ps.push(np.asarray(gids, np.int64),
                np.concatenate([rows, st_cols], axis=1))
        return params, opt_states

    # ------------------------------------------------------ policy eviction
    def run_policy_eviction(
        self,
        params,
        opt_states=None,
        now_min: Optional[float] = None,
        inference: bool = False,
    ):
        """Run each table's virtual-table eviction policy NOW: selected
        rows are spilled to the PS and their cache slots freed (the
        reference's FBGEMM-KVZCH eviction pass, driven by the
        embedding_configs.py:181-359 policy family).

        Returns (params, opt_states, {table: n_evicted}).
        """
        from torchrec_tpu.modules.embedding_configs import (
            FeatureL2NormBasedEvictionPolicy,
        )

        if now_min is None:
            now_min = self._clock_min
        counts: Dict[str, int] = {}
        for tname, idt in self._idt.items():
            policy = self._policies[tname]
            if policy is None:
                counts[tname] = 0
                continue
            tracker = self._trackers[tname]
            l2 = None
            if isinstance(policy, FeatureL2NormBasedEvictionPolicy):
                ebc = self._ebc
                ti = next(
                    i for i, t in enumerate(ebc._tables) if t.name == tname
                )
                gi, row_off = ebc._table_group[ti]
                grp = ebc._groups[gi]
                cap = self._cache_rows[tname]
                cache = np.asarray(
                    jax.device_get(
                        params[grp.key][row_off : row_off + cap]
                    )
                )
                l2 = np.linalg.norm(cache, axis=1)
            victims = tracker.select(
                policy, now_min, l2_norms=l2, inference=inference
            )
            if not len(victims):
                counts[tname] = 0
                continue
            rg, rs = idt.remove(victims)
            params, opt_states = self._spill(
                tname, rg, rs, params, opt_states
            )
            tracker.free(rs)
            counts[tname] = int(len(rs))
        return params, opt_states, counts

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
        """Per table: the id->slot map + eviction-tracker metadata
        (the reference checkpoints KVZCH eviction headers with the rows)."""
        out = {}
        for tname, idt in self._idt.items():
            gids, slots = idt.export_state()
            out[tname] = {
                "global_ids": gids,
                "slots": slots,
                **{
                    f"tracker_{k}": v
                    for k, v in self._trackers[tname].export_state().items()
                },
            }
        return out

    def restore_tier_state(self, state: Dict[str, Dict[str, np.ndarray]]):
        from torchrec_tpu.dynamic_embedding import IDTransformer

        for tname, s in state.items():
            idt = IDTransformer(self._cache_rows[tname])
            idt.restore_state(s["global_ids"], s["slots"])
            self._idt[tname] = idt
            if "tracker_count" in s:
                self._trackers[tname].restore_state(
                    {
                        k[len("tracker_"):]: v
                        for k, v in s.items()
                        if k.startswith("tracker_")
                    }
                )

    def bucket_metadata(self, num_buckets: int = 1):
        """Per-table ShardingBucketMetadata for the VIRTUAL id spaces
        (reference distributed/types.py:1581 + utils.py:651) — emitted in
        checkpoints so a resharded restore can route buckets to owners."""
        from torchrec_tpu.distributed.types import (
            bucket_metadata_from_rows,
        )

        return {
            t.name: bucket_metadata_from_rows(
                # bucket over the BOUNDED cache rows (the physical shard)
                [self._cache_rows[t.name]],
                num_buckets,
            )
            for t in self._virtual_tables
        }
