"""Stash HBM state to host memory during eval, restore for training.

Capability parity with the reference MemoryStashingManager
(torchrec/distributed/memory_stashing.py:154 — stash embedding optimizer
state / scratch buffers to host DRAM across eval phases so evaluation can
use the freed HBM, then restore before the next train phase).

TPU-native shape: XLA memory kinds. ``jax.device_put`` onto the same
sharding ``with_memory_kind("pinned_host")`` moves a (possibly sharded)
array's bytes to host DRAM without changing its logical placement;
restoring puts it back in ``"device"`` (HBM). No torch streams, no chunked
copy loop — the transfer engine handles it, and donation keeps it
zero-copy-in-HBM. Works for any pytree (optimizer states, whole param
dicts, scratch buffers).
"""

from __future__ import annotations

import contextlib
from typing import Any, Optional

import jax

__all__ = [
    "stash_to_host",
    "restore_to_device",
    "MemoryStashingManager",
]


def _move(x, memory_kind: str):
    if not hasattr(x, "sharding"):
        return x
    sh = x.sharding
    if getattr(sh, "memory_kind", None) == memory_kind:
        return x
    try:
        return jax.device_put(x, sh.with_memory_kind(memory_kind))
    except (NotImplementedError, ValueError):
        # backend without this memory kind: keep on device (functional
        # no-op; stashing is a capacity optimization, not a semantic one)
        return x


def stash_to_host(tree: Any) -> Any:
    """Move every array in the pytree to pinned host memory (D2H)."""
    return jax.tree.map(lambda x: _move(x, "pinned_host"), tree)


def restore_to_device(tree: Any) -> Any:
    """Move every array in the pytree back to HBM (H2D)."""
    return jax.tree.map(lambda x: _move(x, "device"), tree)


class MemoryStashingManager:
    """Named stash slots + an eval-scope context manager.

    ``stash("opt", states)`` frees the HBM those arrays held (the caller
    must drop its own references); ``restore("opt")`` returns the pytree in
    HBM. ``stashed(tree)`` scopes a stash to a ``with`` block (reference:
    the train->eval->train transition hooks).
    """

    def __init__(self):
        self._slots = {}

    def stash(self, name: str, tree: Any) -> None:
        self._slots[name] = stash_to_host(tree)

    def restore(self, name: str, *, keep: bool = False) -> Any:
        tree = restore_to_device(self._slots[name])
        if not keep:
            del self._slots[name]
        return tree

    def peek_host(self, name: str) -> Any:
        """The host-resident pytree without restoring (e.g. checkpointing
        stashed state directly from DRAM)."""
        return self._slots[name]

    def __contains__(self, name: str) -> bool:
        return name in self._slots

    @contextlib.contextmanager
    def stashed(self, tree: Any, name: str = "_scoped"):
        """``with manager.stashed(opt_states) as handle:`` — the block runs
        with the state in host DRAM; on exit the restored pytree is
        available as ``handle.value``."""
        self.stash(name, tree)

        class _Handle:
            value: Optional[Any] = None

        h = _Handle()
        try:
            yield h
        finally:
            h.value = self.restore(name)
