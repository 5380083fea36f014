"""Checkpoint / resume for sharded training state.

Capability parity with the reference's checkpoint story (SURVEY §5):
state_dict as ShardedTensor/DTensor views consumable by
torch.distributed.checkpoint (embeddingbag.py:1231-1428), FQN-keyed
optimizer state (optim/keyed.py:34), plan-hash validation
(planners.py:906-926).

TPU-native: the TrainState is already a pytree of (sharded) jax.Arrays —
orbax-checkpoint handles distributed save/restore natively. Two paths:

* **same-plan fast path**: save/restore the raw pytree (each host writes
  its shards; no gather);
* **cross-plan reshard path**: export per-table full weights (FQN-keyed,
  the reference's state_dict contract) and re-import under a different
  plan/topology.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = [
    "save_train_state",
    "restore_train_state",
    "export_state_dict",
    "import_state_dict",
]


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(
    path: str,
    state: Any,
    metadata: Optional[Dict[str, Any]] = None,
) -> None:
    """Save a TrainState (or any pytree of arrays) + json metadata.

    Sharded arrays are written distributed (same-plan resume restores them
    without gathering).
    """
    path = os.path.abspath(path)
    _ckptr().save(os.path.join(path, "state"), state, force=True)
    meta = dict(metadata or {})
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump(meta, f)


def load_metadata(path: str) -> Dict[str, Any]:
    with open(os.path.join(os.path.abspath(path), "metadata.json")) as f:
        return json.load(f)


def restore_train_state(
    path: str,
    like: Any,
    expect_plan_hash: Optional[str] = None,
) -> Any:
    """Restore into the structure/shardings of ``like`` (same plan).

    ``expect_plan_hash``: if given, validated against the saved metadata
    (the reference's plan-context-hash check).
    """
    path = os.path.abspath(path)
    meta = load_metadata(path)
    if expect_plan_hash is not None:
        saved = meta.get("plan_hash")
        if saved is not None and saved != expect_plan_hash:
            raise ValueError(
                f"checkpoint plan hash {saved} != current {expect_plan_hash}; "
                "use export/import_state_dict to reshard"
            )
    import orbax.checkpoint as ocp

    restore_args = jax.tree_util.tree_map(
        lambda x: ocp.ArrayRestoreArgs(sharding=x.sharding)
        if isinstance(x, jax.Array)
        else ocp.RestoreArgs(),
        like,
    )
    return _ckptr().restore(
        os.path.join(path, "state"), item=like, restore_args=restore_args
    )


# our state keys -> the reference's FBGEMM split-state names
# (torchrec/distributed/batched_embedding_kernel.py:1215 exposes
# momentum1/momentum2 per table)
TORCHREC_STATE_NAMES = {"momentum": "momentum1", "m": "momentum1",
                        "v": "momentum2"}


def export_state_dict(
    sharded_ebc, sparse_params, opt_states=None, optimizer=None
) -> Dict[str, np.ndarray]:
    """Per-table FQN -> full weight arrays (the reference's state_dict
    contract: one entry per table regardless of sharding). With
    ``opt_states`` + ``optimizer``, also emits per-table optimizer state
    under reference names (``embedding_bags.<t>.momentum1`` ...) —
    logical views regardless of storage layout (colocated / pair-packed
    / tile-row), via ``unshard_opt_states``."""
    out = {
        f"embedding_bags.{name}.weight": w
        for name, w in sharded_ebc.unshard_params(sparse_params).items()
    }
    if opt_states is not None:
        st = sharded_ebc.unshard_opt_states(
            opt_states, optimizer, sparse_params
        )
        for name, sub in st.items():
            for k, v in sub.items():
                out[
                    f"embedding_bags.{name}."
                    f"{TORCHREC_STATE_NAMES.get(k, k)}"
                ] = v
    return out


def import_state_dict(
    sharded_ebc, state_dict: Dict[str, np.ndarray], optimizer=None
):
    """Re-shard full per-table weights under this module's (possibly
    different) plan/topology — live cross-topology resume. With
    ``optimizer``, state entries (momentum1/...) in ``state_dict`` are
    restored too and the return value is ``(params, opt_states)``;
    without it, state entries are rejected (silently dropping
    accumulators would reset them) and the return is params only."""
    per_table: Dict[str, np.ndarray] = {}
    per_table_state: Dict[str, Dict[str, np.ndarray]] = {}
    rev = {}
    if optimizer is not None:
        import jax.numpy as jnp

        proto_dt = (
            jnp.bfloat16
            if getattr(optimizer, "stochastic_rounding", False)
            else jnp.float32
        )
        proto = optimizer.init(jnp.zeros((1, 1), proto_dt))
        for k in proto:
            rev[TORCHREC_STATE_NAMES.get(k, k)] = k
    for key, w in state_dict.items():
        if not key.startswith("embedding_bags."):
            raise KeyError(f"unexpected state_dict key {key!r}")
        stem = key[len("embedding_bags.") :]
        name, _, field = stem.rpartition(".")
        if field == "weight":
            per_table[name] = np.asarray(w)
        elif optimizer is not None and field in rev:
            per_table_state.setdefault(name, {})[rev[field]] = np.asarray(w)
        elif optimizer is None:
            raise KeyError(
                f"state entry {key!r} present but no optimizer given — "
                "pass optimizer= to restore it (or strip state entries)"
            )
        # unknown state fields for this optimizer are ignored
    params = sharded_ebc.shard_from_tables(per_table)
    if optimizer is None:
        return params
    params, opt_states = sharded_ebc.shard_opt_states_from_tables(
        params, optimizer, per_table_state
    )
    return params, opt_states
