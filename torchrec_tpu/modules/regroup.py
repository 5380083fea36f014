"""KTRegroupAsDict — regroup multiple KeyedTensors into named dense groups.

Capability parity with torchrec/modules/regroup.py (KTRegroupAsDict:139,
backed by fbgemm's permute_multi_embedding) and
KeyedTensor.regroup/regroup_as_dict (sparse/jagged_tensor.py:283).

TPU-first: the permutation plan is computed once from static metadata
(keys/dims) and compiled to a single concatenation of column slices per
group — XLA fuses the copies; there is no runtime permute kernel.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp

from torchrec_tpu.sparse import KeyedTensor

__all__ = ["KTRegroupAsDict", "regroup_kts"]


def _plan(
    kts: Sequence[KeyedTensor], groups: Sequence[Sequence[str]]
) -> List[List[Tuple[int, int, int]]]:
    """Per group: list of (kt_index, col_start, col_end) slices."""
    index: Dict[str, Tuple[int, int, int]] = {}
    for ki, kt in enumerate(kts):
        off = 0
        for key, d in zip(kt.keys(), kt.length_per_key()):
            d = int(d)
            index[key] = (ki, off, off + d)
            off += d
    plan = []
    for grp in groups:
        slices = []
        for key in grp:
            if key not in index:
                raise KeyError(f"regroup key {key!r} not found in inputs")
            slices.append(index[key])
        plan.append(slices)
    return plan


def regroup_kts(
    kts: Sequence[KeyedTensor],
    groups: Sequence[Sequence[str]],
) -> List[jnp.ndarray]:
    """Reference KeyedTensor.regroup (jagged_tensor.py:283)."""
    plan = _plan(kts, groups)
    out = []
    for slices in plan:
        out.append(
            jnp.concatenate(
                [kts[ki].values()[:, s:e] for ki, s, e in slices], axis=1
            )
        )
    return out


class KTRegroupAsDict:
    """Reference KTRegroupAsDict (modules/regroup.py:139): cached plan,
    dict output."""

    def __init__(self, groups: Sequence[Sequence[str]], keys: Sequence[str]):
        if len(groups) != len(keys):
            raise ValueError("one output key per group required")
        self._groups = [list(g) for g in groups]
        self._keys = list(keys)
        self._plan = None

    def __call__(self, kts: Sequence[KeyedTensor]) -> Dict[str, jnp.ndarray]:
        if self._plan is None:
            self._plan = _plan(kts, self._groups)
        out: Dict[str, jnp.ndarray] = {}
        for key, slices in zip(self._keys, self._plan):
            out[key] = jnp.concatenate(
                [kts[ki].values()[:, s:e] for ki, s, e in slices], axis=1
            )
        return out
