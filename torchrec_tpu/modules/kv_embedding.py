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

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.modules.embedding_configs import EmbeddingBagConfig
from torchrec_tpu.modules.embedding_modules import EmbeddingBagCollection
from torchrec_tpu.sparse import KeyedJaggedTensor

__all__ = ["KeyValueEmbeddingBagCollection"]


# fmix32 (murmur3 finalizer) constants for the fresh-row counter hash
_FMIX1 = 0x85EBCA6B
_FMIX2 = 0xC2B2AE35
_GOLD = 0x9E3779B9


def _fresh_rows_hash(xp, lo, hi, dim: int, bound):
    """uniform(-bound, bound) rows from an fmix32 counter hash of
    (gid, column). ``lo``/``hi``: uint32 arrays [n] (the gid's 64-bit
    halves); ``bound``: scalar or [n]. ``xp`` is numpy or jax.numpy — the
    two implementations are bit-identical, so host-side fresh init (eager
    transform) and device-side fresh init (batched transform) agree and
    fresh-row generation can live wherever it's cheapest (~0.1 us/row on
    device vs ~25 us/row for a per-row numpy Generator)."""
    u32 = xp.uint32
    lo = lo.astype(u32)[:, None]
    hi = hi.astype(u32)[:, None]
    col = xp.arange(1, dim + 1, dtype=u32)[None, :]
    x = (lo ^ (hi * u32(_FMIX1))) + col * u32(_GOLD)
    x = x ^ (x >> u32(16))
    x = x * u32(_FMIX1)
    x = x ^ (x >> u32(13))
    x = x * u32(_FMIX2)
    x = x ^ (x >> u32(16))
    u = x.astype(xp.float32) * xp.float32(2.0**-32)  # [0, 1)
    b = xp.asarray(bound, xp.float32)
    if b.ndim == 1:
        b = b[:, None]
    return (xp.float32(2.0) * u - xp.float32(1.0)) * b


def _row_write(table: jnp.ndarray, idx: jnp.ndarray, rows: jnp.ndarray):
    """``table[idx] = rows`` for distinct in-range idx; out-of-range
    (sentinel) entries dropped. Pallas write kernel on TPU (O(touched)
    vs XLA's whole-table streaming scatter), plain drop-scatter elsewhere."""
    from torchrec_tpu.ops.tbe_pallas import (
        row_scatter_write,
        supports_row_scatter_add,
    )

    if supports_row_scatter_add(table):
        return row_scatter_write(table, idx, rows)
    return table.at[idx].set(
        rows.astype(table.dtype), mode="drop", unique_indices=True
    )


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _spill_fill_device(params, opt_states, args):
    """ONE device program for a whole step's cache-tier traffic: per group
    blob, gather the evicted rows (+ momentum), generate fresh-init rows
    in-device from the gid hash, and write history + fresh rows into their
    slots. Replaces the eager per-table gather/scatter dispatches — over a
    tunneled backend each eager op costs ~0.5 s of dispatch latency, and
    XLA's eager scatter streams the whole cache blob.

    ``args[key]``: spill_idx [S], hist_idx [H], hist_rows [H, dim],
    hist_mom [H], fresh_idx [F], fresh_lo/hi [F] uint32, fresh_b [F].
    Sentinel idx == blob rows -> dropped (gathers clamp; host ignores the
    padded tail). Returns (params, opt_states, {key: (rows [S, dim],
    mom [S] | None)}).
    """
    params = dict(params)
    if opt_states:
        opt_states = {
            k: dict(v) if isinstance(v, dict) else v
            for k, v in opt_states.items()
        }
    spilled = {}
    for key in sorted(args.keys()):
        a = args[key]
        tbl = params[key]
        n, dim = tbl.shape
        sub = opt_states.get(key) if opt_states else None
        has_mom = isinstance(sub, dict) and "momentum" in sub
        # spill gathers read the PRE-fill table (SSA: the fill below
        # produces a new value)
        sp = jnp.clip(a["spill_idx"], 0, n - 1)
        sp_rows = jnp.take(tbl, sp, axis=0).astype(jnp.float32)
        sp_mom = jnp.take(sub["momentum"], sp) if has_mom else None
        fresh_rows = _fresh_rows_hash(
            jnp, a["fresh_lo"], a["fresh_hi"], dim, a["fresh_b"]
        )
        idx = jnp.concatenate([a["hist_idx"], a["fresh_idx"]])
        rows = jnp.concatenate(
            [a["hist_rows"].astype(tbl.dtype), fresh_rows.astype(tbl.dtype)]
        )
        params[key] = _row_write(tbl, idx, rows)
        if has_mom:
            mom_vals = jnp.concatenate(
                [
                    a["hist_mom"],
                    jnp.zeros(a["fresh_idx"].shape[0], jnp.float32),
                ]
            )
            sub["momentum"] = sub["momentum"].at[idx].set(
                mom_vals, mode="drop", unique_indices=True
            )
            opt_states[key] = sub
        spilled[key] = (sp_rows, sp_mom)
    return params, opt_states, spilled


def _pad_pow2(n: int, lo: int = 256) -> int:
    c = lo
    while c < n:
        c *= 2
    return c


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
        max_unique_gradient_rows: Optional[int] = None,
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
        self._ebc = EmbeddingBagCollection(
            cached, max_unique_gradient_rows=max_unique_gradient_rows
        )
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
        # deferred spill-push (batched mode): (by_key plans, device rows)
        # fetched + pushed at the NEXT transform/flush, so the blocking
        # device_get overlaps the intervening train-step compute
        self._spill_pending = None

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
        device_batched: bool = False,
    ):
        """Host-side pre-batch transform: remap raw ids -> cache slots,
        spilling evicted rows to the PS and filling admitted rows from it.

        Returns (remapped int32 values, params, opt_states). Must run
        BEFORE the jitted step (the reference's UVM prefetch phase /
        dynamic-embedding dataloader transform). ``now_min``: wall-clock
        minutes for timestamp eviction policies (defaults to a logical
        clock advancing 1/batch, keeping tests deterministic).

        ``device_batched=True`` defers all device-side spill/fill traffic
        into ONE jitted donated program per step (:func:`_spill_fill_device`
        — fresh rows generated on device, Pallas write scatter on TPU)
        instead of eager per-table gather/scatter ops. Numerically
        identical to the eager path; use it whenever dispatch latency or
        cache-blob size matters (the UVM benchmark path).
        """
        if now_min is None:
            self._clock_min += 1.0
            now_min = self._clock_min
        else:
            self._clock_min = float(now_min)
        # deferred spills must land in the PS before any pull sees stale
        # history
        self.flush_spills()
        per_key = lengths.sum(axis=1)
        offs = np.concatenate([[0], np.cumsum(per_key)]).astype(np.int64)
        out = values.astype(np.int64).copy()
        pending: List[dict] = []
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
            if device_batched:
                pending.append(
                    self._plan_transfer(
                        tname, evicted_g, evicted_s, gids, cids, fresh
                    )
                )
            else:
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
        if pending:
            params, opt_states = self._execute_transfers(
                pending, params, opt_states
            )
        return out.astype(np.int32), params, opt_states

    def _plan_transfer(self, tname, evicted_g, evicted_s, gids, cids, fresh):
        """Host bookkeeping for one table's step traffic (batched mode):
        which blob slots spill, which fill from PS history (rows pulled
        here), which fill fresh on-device."""
        ebc = self._ebc
        ti = next(i for i, t in enumerate(ebc._tables) if t.name == tname)
        gi, row_off = ebc._table_group[ti]
        grp = ebc._groups[gi]
        dim = grp.dim
        uniq, first = np.unique(gids, return_index=True)
        uniq_fresh = fresh[first]
        slots_of = cids[first].astype(np.int64) + row_off
        f_ids = uniq[uniq_fresh]
        f_slots = slots_of[uniq_fresh]
        if len(f_ids):
            fetched, _hits = self._ps[tname].pull(f_ids)
            has_hist = np.abs(fetched).sum(axis=1) > 0
        else:
            fetched = np.zeros((0, dim + self._osw), np.float32)
            has_hist = np.zeros((0,), bool)
        g = f_ids[~has_hist].astype(np.uint64)
        return {
            "table": tname,
            "key": grp.key,
            "dim": dim,
            "spill_idx": np.asarray(evicted_s, np.int64) + row_off,
            "spill_gids": np.asarray(evicted_g, np.int64),
            "hist_idx": f_slots[has_hist],
            "hist_rows": fetched[has_hist, :dim].astype(np.float32),
            "hist_mom": fetched[has_hist, dim].astype(np.float32)
            if self._osw
            else np.zeros((int(has_hist.sum()),), np.float32),
            "fresh_idx": f_slots[~has_hist],
            "fresh_lo": (g & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            "fresh_hi": (g >> np.uint64(32)).astype(np.uint32),
            "fresh_b": np.full(
                len(g),
                np.sqrt(1.0 / self._cache_rows[tname]),
                np.float32,
            ),
        }

    def _execute_transfers(self, pending, params, opt_states):
        """Merge per-table transfer plans by group blob, pad to pow2 caps
        (sentinel idx = blob rows -> dropped), run ONE jitted device
        program, then push the returned spilled rows to the PS."""
        by_key: Dict[str, List[dict]] = {}
        for p in pending:
            by_key.setdefault(p["key"], []).append(p)
        args = {}
        for key, plans in by_key.items():
            n_blob = int(params[key].shape[0])
            dim = plans[0]["dim"]

            def cat(field, pad_val, cap, dtype, width=None):
                a = np.concatenate([p[field] for p in plans]) if plans else []
                a = np.asarray(a, dtype)
                shape = (cap,) if width is None else (cap, width)
                out = np.full(shape, pad_val, dtype)
                out[: len(a)] = a
                return jnp.asarray(out)

            n_sp = sum(len(p["spill_idx"]) for p in plans)
            n_hi = sum(len(p["hist_idx"]) for p in plans)
            n_fr = sum(len(p["fresh_idx"]) for p in plans)
            s_cap, h_cap, f_cap = (
                _pad_pow2(n_sp), _pad_pow2(n_hi), _pad_pow2(n_fr),
            )
            # scatter-target padding must keep the combined hist+fresh idx
            # array ALL-DISTINCT (the device program asserts
            # unique_indices=True): give every pad slot its own OOB
            # sentinel instead of repeating n_blob. All are >= n_blob, so
            # mode="drop" / the Pallas OOB skip discards them either way.
            hist_pad = n_blob + np.arange(h_cap, dtype=np.int64)
            fresh_pad = n_blob + h_cap + np.arange(f_cap, dtype=np.int64)

            def cat_idx(field, pads, cap):
                a = np.concatenate(
                    [np.asarray(p[field], np.int64) for p in plans]
                )
                out = pads[:cap].copy()
                out[: len(a)] = a
                return jnp.asarray(out.astype(np.int32))

            args[key] = {
                "spill_idx": cat("spill_idx", n_blob, s_cap, np.int32),
                "hist_idx": cat_idx("hist_idx", hist_pad, h_cap),
                "hist_rows": cat("hist_rows", 0.0, h_cap, np.float32, dim),
                "hist_mom": cat("hist_mom", 0.0, h_cap, np.float32),
                "fresh_idx": cat_idx("fresh_idx", fresh_pad, f_cap),
                "fresh_lo": cat("fresh_lo", 0, f_cap, np.uint32),
                "fresh_hi": cat("fresh_hi", 0, f_cap, np.uint32),
                "fresh_b": cat("fresh_b", 1.0, f_cap, np.float32),
            }
        params, opt_states, spilled = _spill_fill_device(
            params, opt_states, args
        )
        # defer the blocking fetch+push: flushed at the next transform (or
        # flush_spills), by when the step's device compute has overlapped it
        self._spill_pending = (by_key, spilled)
        return params, opt_states

    def flush_spills(self) -> None:
        """Push any deferred batched-mode spills to the PS. Called
        automatically at the start of every transform and before any PS /
        tier-state read; call explicitly before inspecting the PS."""
        if self._spill_pending is None:
            return
        by_key, spilled = self._spill_pending
        self._spill_pending = None
        spilled = jax.device_get(spilled)
        for key, plans in by_key.items():
            rows, mom = spilled[key]
            off = 0
            for p in plans:
                n = len(p["spill_gids"])
                if not n:
                    continue
                st = np.zeros((n, self._osw), np.float32)
                if mom is not None and self._osw:
                    st[:, 0] = mom[off : off + n]
                self._ps[p["table"]].push(
                    p["spill_gids"],
                    np.concatenate(
                        [np.asarray(rows[off : off + n], np.float32), st],
                        axis=1,
                    ),
                )
                off += n

    def _fresh_rows(self, tname: str, gids: np.ndarray, dim: int) -> np.ndarray:
        """Deterministic per-gid fresh-init rows: uniform(-b, b) with
        b = sqrt(1/cache_rows), the default table init bounds — a fresh id
        admitted into a recycled slot must NOT inherit the previous
        tenant's trained row. Host-side form of :func:`_fresh_rows_hash`
        (bit-identical to the device-side form the batched transform
        uses)."""
        g = np.asarray(gids, np.uint64)
        lo = (g & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (g >> np.uint64(32)).astype(np.uint32)
        b = np.float32(np.sqrt(1.0 / self._cache_rows[tname]))
        return _fresh_rows_hash(np, lo, hi, dim, b).astype(np.float32)

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
            # osw == 0 means optimizer state is NOT preserved across
            # eviction (PS rows have no state columns); momentum of
            # re-admitted ids restarts at 0 — same as the batched path
            if self._osw and opt_states and "momentum" in opt_states.get(
                grp.key, {}
            ):
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
        # osw == 0: optimizer state is not carried through eviction
        if self._osw and opt_states and "momentum" in opt_states.get(
            grp.key, {}
        ):
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
        self.flush_spills()
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
        self.flush_spills()
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

        # a deferred batched-mode spill belongs to the timeline being
        # rolled back — pushing it AFTER the restore would leak
        # post-snapshot rows into the restored PS history
        self._spill_pending = None
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
