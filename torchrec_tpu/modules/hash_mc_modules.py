"""MPZCH — multi-probe hash-based zero-collision hashing.

Capability parity with torchrec/modules/hash_mc_modules.py
(HashZchManagedCollisionModule:196 — ids map to slots through a bounded
multi-probe hash sequence; occupied slots fall through to the next probe;
TTL-based eviction frees slots whose ids went stale, hash_mc_evictions.py:
22-108) — the sort-free sibling of the sorted-map MCH in mc_modules.py.

TPU-first: state is two fixed arrays (slot_ids [Z], slot_expiry [Z]);
each probe round is fully vectorized — candidate positions come from a
per-probe mix hash, in-batch claim conflicts resolve deterministically with
a scatter-min election (smallest contending id wins the slot), and the
whole forward is jit-compatible with a static probe count.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["HashZchManagedCollisionModule"]

_EMPTY = jnp.int32(2**31 - 1)

State = Dict[str, jnp.ndarray]


def _mix(ids: jnp.ndarray, probe: int, zch_size: int) -> jnp.ndarray:
    """Per-probe position hash (fibonacci-style integer mix)."""
    h = ids.astype(jnp.uint32) * jnp.uint32(2654435761) + jnp.uint32(
        (0x9E3779B9 * (probe + 1)) & 0xFFFFFFFF
    )
    h = h ^ (h >> 16)
    h = h * jnp.uint32(2246822519)
    h = h ^ (h >> 13)
    return (h % jnp.uint32(zch_size)).astype(jnp.int32)


@dataclasses.dataclass(frozen=True)
class HashZchManagedCollisionModule:
    """Reference HashZchManagedCollisionModule (:196).

    ``zch_size``: slots; ``num_probes``: bounded probe sequence length
    (reference default 128; a handful suffices at sane load factors);
    ``ttl``: iterations after the last touch before a slot is evictable
    (reference TTL eviction policy, hash_mc_evictions.py:22).
    """

    zch_size: int
    num_probes: int = 8
    ttl: int = 1000

    def init_state(self) -> State:
        return {
            "slot_ids": jnp.full((self.zch_size,), _EMPTY, jnp.int32),
            "slot_expiry": jnp.zeros((self.zch_size,), jnp.int32),
            "iter": jnp.zeros((), jnp.int32),
            # slots whose resident id was REPLACED last step (padded -1) —
            # the ManagedCollisionCollection contract for row resets
            "evicted_slots": jnp.full((self.zch_size,), -1, jnp.int32),
        }

    def profile(
        self,
        state: State,
        values: jnp.ndarray,
        valid: Optional[jnp.ndarray] = None,
    ) -> State:
        """State-update half of :meth:`forward` (the
        ManagedCollisionCollection driver interface shared with
        MCHManagedCollisionModule — profile then remap)."""
        _, new_state = self.forward(state, values, valid=valid, train=True)
        return new_state

    def remap(self, state: State, ids: jnp.ndarray) -> jnp.ndarray:
        """Lookup-only (eval/inference): probe for a match; miss -> last
        probe position (a deterministic collision bucket, like the
        reference's eval fallback)."""
        out = jnp.full(ids.shape, -1, jnp.int32)
        for p in range(self.num_probes):
            pos = _mix(ids, p, self.zch_size)
            hit = (jnp.take(state["slot_ids"], pos) == ids) & (out < 0)
            out = jnp.where(hit, pos, out)
        fallback = _mix(ids, self.num_probes - 1, self.zch_size)
        return jnp.where(out >= 0, out, fallback)

    def forward(
        self,
        state: State,
        ids: jnp.ndarray,
        valid: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, State]:
        """Remap ids, claiming empty/expired slots when training."""
        if not train:
            return self.remap(state, ids), state
        z = self.zch_size
        it = state["iter"] + 1
        slot_ids = state["slot_ids"]
        expiry = state["slot_expiry"]
        safe_ids = ids if valid is None else jnp.where(valid, ids, _EMPTY)
        out = jnp.full(ids.shape, -1, jnp.int32)
        remaining = (
            jnp.ones(ids.shape, bool) if valid is None else valid
        )
        for p in range(self.num_probes):
            pos = _mix(safe_ids, p, z)
            cur = jnp.take(slot_ids, pos)
            cur_exp = jnp.take(expiry, pos)
            hit = remaining & (cur == safe_ids)
            out = jnp.where(hit, pos, out)
            remaining = remaining & ~hit
            # claimable: empty or TTL-expired slot
            claimable = remaining & ((cur == _EMPTY) | (cur_exp < it))
            # in-batch election: smallest contending id wins each position
            tgt = jnp.where(claimable, pos, z)
            winner = jnp.full((z + 1,), _EMPTY, jnp.int32).at[tgt].min(
                safe_ids, mode="promise_in_bounds"
            )
            won = claimable & (jnp.take(winner[:z], jnp.minimum(pos, z - 1)) == safe_ids)
            slot_ids = slot_ids.at[jnp.where(won, pos, z)].set(
                safe_ids, mode="drop"
            )
            # refresh expiry IN the loop: a slot claimed at probe p must
            # not look TTL-expired (stealable) to a later probe of the
            # same forward — the post-loop refresh alone lost ~2.5% of a
            # batch's distinct ids to within-forward steals
            expiry = expiry.at[jnp.where(won, pos, z)].max(
                it + self.ttl, mode="drop"
            )
            out = jnp.where(won, pos, out)
            remaining = remaining & ~won
        # refresh TTL of every slot we resolved to
        resolved = out >= 0
        expiry = expiry.at[jnp.where(resolved, out, z)].max(
            it + self.ttl, mode="drop"
        )
        # unresolved ids (all probes occupied): deterministic fallback bucket
        fallback = _mix(safe_ids, self.num_probes - 1, z)
        out = jnp.where(resolved, out, fallback)
        # slots whose RESIDENT id was replaced this step (TTL takeovers) —
        # their embedding rows are stale and get reset by the MC wrapper
        replaced = (
            (state["slot_ids"] != _EMPTY)
            & (slot_ids != state["slot_ids"])
        )
        evicted = jnp.where(replaced, jnp.arange(z, dtype=jnp.int32), -1)
        return out, {
            "slot_ids": slot_ids,
            "slot_expiry": expiry,
            "iter": it,
            "evicted_slots": evicted,
        }

    def output_size(self) -> int:
        return self.zch_size
