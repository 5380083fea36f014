"""Dynamic resharding: move table shards to a new plan/topology at runtime.

Capability parity with torchrec/distributed/sharding/dynamic_sharding.py
(plan delta -> shard transfer + optimizer-state move,
update_state_dictionaries:617, transfer_data:807) and the plan-reuse path
(planner/planners.py:906-926).

TPU-first: a resharding step is a LAYOUT change of the packed per-device
blobs. Both layouts are described by the same packing metadata
(distributed/_layout.py WidthClass.packing), so the transfer is computed
as a schedule of (row-range x column-range) INTERVAL copies between old
and new blobs — interval intersection over the packing runs, never a
per-row enumeration, so schedule-building cost is O(shard runs), not
O(table rows) (the reference likewise transfers whole shard tensors with
range metadata rather than rows). Column RE-SPLITS (e.g. CW 2 blocks ->
4 blocks, or 4 -> 2) are ordinary column-interval intersections; rowwise
optimizer state merges exactly across column blocks (the accumulator is
a mean over the block's columns, so the merged value is the
column-width-weighted mean of the contributing blocks). The device-to-
device movement is static slice/update pairs under jit — collectives are
inserted by GSPMD from the sharding specs, the code never names a rank
pair.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["reshard"]


def _run_schedule(old_classes, new_classes, world: int):
    """Interval-intersection copy schedule between two packings.

    Returns ``{(new_class_idx, old_class_idx): [run, ...]}`` with each run
    ``(new_dev, new_row, old_dev, old_row, n_rows, new_col, old_col,
    n_cols)`` — blob-local row starts and class-local column offsets.
    Raises if the old plan does not fully cover a new shard (a genuinely
    different table set, not a re-split).
    """
    old_runs: Dict[str, List[tuple]] = {}
    for ci, c in enumerate(old_classes):
        for d in range(world):
            for name, col_start, row_lo, row_hi, brow in c.packing[d]:
                old_runs.setdefault(name, []).append(
                    (col_start, col_start + c.width, row_lo, row_hi,
                     ci, d, brow)
                )
    plans: Dict[Tuple[int, int], List[tuple]] = {}
    for nci, nc in enumerate(new_classes):
        for d in range(world):
            for name, ncol, nrow_lo, nrow_hi, nbrow in nc.packing[d]:
                ncol_hi = ncol + nc.width
                covered = 0
                for (ocol, ocol_hi, orow_lo, orow_hi, oci, od,
                     obrow) in old_runs.get(name, ()):
                    c_a, c_b = max(ncol, ocol), min(ncol_hi, ocol_hi)
                    r_a, r_b = max(nrow_lo, orow_lo), min(nrow_hi, orow_hi)
                    if c_a >= c_b or r_a >= r_b:
                        continue
                    plans.setdefault((nci, oci), []).append((
                        d, nbrow + (r_a - nrow_lo),
                        od, obrow + (r_a - orow_lo),
                        r_b - r_a,
                        c_a - ncol, c_a - ocol,
                        c_b - c_a,
                    ))
                    covered += (r_b - r_a) * (c_b - c_a)
                if covered != (nrow_hi - nrow_lo) * nc.width:
                    raise ValueError(
                        f"old plan does not cover new shard of {name!r} "
                        f"rows [{nrow_lo},{nrow_hi}) cols [{ncol},{ncol_hi})"
                    )
    return plans


def reshard(
    old_sharded,
    new_sharded,
    params: Dict[str, jnp.ndarray],
    opt_states: Optional[Dict[str, Dict[str, jnp.ndarray]]] = None,
):
    """Re-layout ``params`` (and per-row optimizer state) from
    ``old_sharded``'s plan to ``new_sharded``'s plan.

    Both must wrap the same collection. Returns (new_params[, new_states]).
    Column splits may differ (CW block-count changes re-split / merge via
    column intervals; rowwise accumulators merge as the width-weighted
    mean, which is exact for mean-of-squares state).
    """
    world = old_sharded.env.world_size
    if new_sharded.env.world_size != world:
        raise ValueError("resharding across world sizes: re-plan instead")
    if opt_states is not None and any(
        c.state_lanes
        for sh in (old_sharded, new_sharded)
        for c in sh._classes
    ):
        raise NotImplementedError(
            "reshard with colocate_rowwise_state: the live accumulator "
            "rides the blob's state lanes (the pytree entry is stale) — "
            "materialize via unshard_opt_states / "
            "shard_opt_states_from_tables instead"
        )
    plans = _run_schedule(
        old_sharded._classes, new_sharded._classes, world
    )

    new_params: Dict[str, jnp.ndarray] = {}
    new_states: Dict[str, Dict[str, jnp.ndarray]] = {}

    for nci, nc in enumerate(new_sharded._classes):
        w = world
        out = jnp.zeros((w * nc.local_rows, nc.width), jnp.float32)
        # rowwise ([W, rows]-shaped) state merges across column blocks:
        # accumulate width-weighted sums + covered widths, divide at the
        # end (exact for per-column-block mean-of-squares accumulators)
        row_state_sum: Dict[str, jnp.ndarray] = {}
        row_state_w: Dict[str, jnp.ndarray] = {}
        tail_state: Dict[str, jnp.ndarray] = {}
        scalar_state: Dict[str, jnp.ndarray] = {}
        for (tnci, oci), runs in plans.items():
            if tnci != nci:
                continue
            oc = old_sharded._classes[oci]
            from torchrec_tpu.distributed._layout import (
                class_logical_blob_jnp,
            )

            blob = class_logical_blob_jnp(oc, params[oc.key]).reshape(
                -1, oc.width
            )
            states = opt_states[oc.key] if opt_states is not None else {}
            for (nd, nr, od, orow, n, ncol_off, ocol_off, ncols) in runs:
                o0 = od * oc.local_rows + orow
                n0 = nd * nc.local_rows + nr
                rows = blob[o0:o0 + n, ocol_off:ocol_off + ncols]
                out = jax.lax.dynamic_update_slice(
                    out, rows, (n0, ncol_off)
                )
                for k, v in states.items():
                    if v.ndim < 2 or v.shape[1] != oc.local_rows:
                        # scalar entries (e.g. the stochastic-rounding
                        # counter "sr_step", shape [W]) pass through —
                        # CLAUDE.md invariant: row-slicing them corrupts
                        scalar_state.setdefault(k, v)
                        continue
                    flat = v.reshape((-1,) + v.shape[2:])
                    if v.ndim >= 3 and v.shape[2] == oc.width:
                        # width-shaped tail (e.g. Adam moments): the
                        # column interval applies to the tail too
                        seg = flat[
                            o0:o0 + n, ocol_off:ocol_off + ncols
                        ]
                        if k not in tail_state:
                            tail_state[k] = jnp.zeros(
                                (w * nc.local_rows, nc.width)
                                + v.shape[3:],
                                v.dtype,
                            )
                        tail_state[k] = jax.lax.dynamic_update_slice(
                            tail_state[k],
                            seg,
                            (n0, ncol_off) + (0,) * (v.ndim - 3),
                        )
                    else:
                        # rowwise state: width-weighted accumulation
                        seg = flat[o0:o0 + n].astype(jnp.float32)
                        if k not in row_state_sum:
                            row_state_sum[k] = jnp.zeros(
                                (w * nc.local_rows,) + v.shape[2:],
                                jnp.float32,
                            )
                            row_state_w[k] = jnp.zeros(
                                (w * nc.local_rows,), jnp.float32
                            )
                        row_state_sum[k] = (
                            row_state_sum[k]
                            .at[n0:n0 + n]
                            .add(seg * float(ncols))
                        )
                        row_state_w[k] = (
                            row_state_w[k]
                            .at[n0:n0 + n]
                            .add(float(ncols))
                        )
        dst_sharding = new_sharded._sharding(
            new_sharded.env.shard_axis, None, None
        )
        from torchrec_tpu.distributed._layout import class_from_logical_jnp

        new_params[nc.key] = jax.device_put(
            class_from_logical_jnp(
                nc, out.reshape(w, nc.local_rows, nc.width)
            ),
            dst_sharding,
        )
        if opt_states is not None:
            dst = {}
            for k, v in scalar_state.items():
                dst[k] = v
            for k, v in tail_state.items():
                dst[k] = jax.device_put(
                    v.reshape((w, nc.local_rows) + v.shape[1:]),
                    new_sharded._sharding(
                        new_sharded.env.shard_axis, *([None] * v.ndim)
                    ),
                )
            for k, s in row_state_sum.items():
                # broadcast the per-row weight over any state tail dims
                # explicitly: row_state_w[k] is (N,) while s is (N,)+tail,
                # so bare division would only line up for tail-less state
                # (and could silently form an (N, N) outer division if a
                # tail dim happened to equal N)
                wts = jnp.maximum(row_state_w[k], 1.0).reshape(
                    (-1,) + (1,) * (s.ndim - 1)
                )
                merged = s / wts
                tail_nd = merged.ndim - 1
                dst[k] = jax.device_put(
                    merged.reshape(
                        (w, nc.local_rows) + merged.shape[1:]
                    ).astype(opt_states_dtype(opt_states, k)),
                    new_sharded._sharding(
                        new_sharded.env.shard_axis,
                        *([None] * (tail_nd + 1)),
                    ),
                )
            new_states[nc.key] = dst

    # DP tables pass through
    for key, v in params.items():
        if key.startswith("dp_"):
            new_params[key] = v
            if opt_states is not None:
                new_states[key] = opt_states[key]

    if opt_states is not None:
        return new_params, new_states
    return new_params


def opt_states_dtype(opt_states, k):
    for sub in opt_states.values():
        if k in sub:
            return sub[k].dtype
    return jnp.float32
