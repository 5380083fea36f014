"""Dynamic resharding: move table shards to a new plan/topology at runtime.

Capability parity with torchrec/distributed/sharding/dynamic_sharding.py
(plan delta -> shard transfer + optimizer-state move,
update_state_dictionaries:617) and the plan-reuse path
(planner/planners.py:906-926).

TPU-first: a resharding step is a LAYOUT change of the packed per-device
blobs. Both layouts are described by the same packing metadata
(distributed/_layout.py WidthClass.packing), so the transfer is computed as
a static row-copy schedule between old and new blobs; weights AND per-row
fused-optimizer state move together (the reference transfers both). The
device-to-device movement is one XLA gather per (old-class, new-class)
pair under jit — collectives are inserted by GSPMD from the sharding
specs, the code never names a rank pair.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["reshard"]


def _row_map(old_classes, new_classes, world: int):
    """For each (new_class, old_class): list of (new_dev, new_row, old_dev,
    old_row) single-row copies, derived from the packings."""
    # index old rows: (table, col_start, row) -> (old class idx, dev, blob row)
    old_index: Dict[Tuple[str, int, int], Tuple[int, int, int]] = {}
    for ci, c in enumerate(old_classes):
        for d in range(world):
            for name, col_start, row_lo, row_hi, brow in c.packing[d]:
                for r in range(row_lo, row_hi):
                    old_index[(name, col_start, r)] = (ci, d, brow + (r - row_lo))
    plans: Dict[Tuple[int, int], list] = {}
    for nci, nc in enumerate(new_classes):
        for d in range(world):
            for name, col_start, row_lo, row_hi, brow in nc.packing[d]:
                for r in range(row_lo, row_hi):
                    key = (name, col_start, r)
                    if key not in old_index:
                        raise NotImplementedError(
                            "resharding across different column splits is "
                            f"not supported (missing {key})"
                        )
                    oci, od, orow = old_index[key]
                    plans.setdefault((nci, oci), []).append(
                        (d, brow + (r - row_lo), od, orow)
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
    Requires identical column splits per table (like the reference, which
    moves existing shards between ranks rather than re-splitting).
    """
    world = old_sharded.env.world_size
    if new_sharded.env.world_size != world:
        raise ValueError("resharding across world sizes: re-plan instead")
    plans = _row_map(old_sharded._classes, new_sharded._classes, world)

    new_params: Dict[str, jnp.ndarray] = {}
    new_states: Dict[str, Dict[str, jnp.ndarray]] = {}

    for nci, nc in enumerate(new_sharded._classes):
        w = world
        out = jnp.zeros((w, nc.local_rows, nc.width), jnp.float32)
        state_protos = {}
        for (tnci, oci), copies in plans.items():
            if tnci != nci:
                continue
            oc = old_sharded._classes[oci]
            blob = params[oc.key].astype(jnp.float32)
            # one gather per class pair: flatten (dev, row) indices
            nd = np.array([c[0] for c in copies])
            nr = np.array([c[1] for c in copies])
            od = np.array([c[2] for c in copies])
            orow = np.array([c[3] for c in copies])
            flat_old = od * oc.local_rows + orow
            rows = jnp.take(
                blob.reshape(-1, oc.width), jnp.asarray(flat_old), axis=0
            )
            flat_new = jnp.asarray(nd * nc.local_rows + nr)
            out = (
                out.reshape(-1, nc.width)
                .at[flat_new]
                .set(rows)
                .reshape(w, nc.local_rows, nc.width)
            )
            if opt_states is not None:
                for k, v in opt_states[oc.key].items():
                    # only PER-ROW state ([W, local_rows, ...]) moves with
                    # its rows; scalar entries (e.g. the stochastic-rounding
                    # counter "sr_step", shape [W]) pass through unchanged —
                    # CLAUDE.md invariant: slicing them row-wise corrupts
                    if v.ndim < 2 or v.shape[1] != oc.local_rows:
                        state_protos.setdefault(("scalar", k), v)
                        continue
                    tail = v.shape[2:]
                    src = jnp.take(
                        v.reshape((-1,) + tail), jnp.asarray(flat_old), axis=0
                    )
                    if k not in state_protos:
                        state_protos[k] = jnp.zeros(
                            (w * nc.local_rows,) + tail, v.dtype
                        )
                    state_protos[k] = state_protos[k].at[flat_new].set(src)
        dst_sharding = new_sharded._sharding(
            new_sharded.env.shard_axis, None, None
        )
        new_params[nc.key] = jax.device_put(
            out.astype(nc.data_type.as_jnp()), dst_sharding
        )
        if opt_states is not None:
            new_states[nc.key] = {}
            for k, v in state_protos.items():
                if isinstance(k, tuple) and k[0] == "scalar":
                    # not row-addressed: carry the counter value over (it
                    # advances identically on every device) at the NEW world
                    new_states[nc.key][k[1]] = jnp.broadcast_to(
                        v.reshape(-1)[:1], (w,) + v.shape[2:]
                    ) if v.ndim >= 1 else v
                    continue
                new_states[nc.key][k] = jax.device_put(
                    v.reshape((w, nc.local_rows) + v.shape[1:]),
                    new_sharded._sharding(
                        new_sharded.env.shard_axis, *([None] * v.ndim)
                    ),
                )

    # DP tables pass through
    for key, v in params.items():
        if key.startswith("dp_"):
            new_params[key] = v
            if opt_states is not None:
                new_states[key] = opt_states[key]

    if opt_states is not None:
        return new_params, new_states
    return new_params
