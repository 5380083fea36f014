"""torchrec interop: load/export reference (PyTorch) state_dicts.

The migration path for a torchrec user with trained weights: take the
torch ``state_dict()`` of any module containing an
``EmbeddingBagCollection`` / ``EmbeddingCollection`` (reference FQN
contract: ``<prefix>.embedding_bags.<table>.weight`` /
``<prefix>.embeddings.<table>.weight``, torchrec
modules/embedding_modules.py:217,474) and turn it into this framework's
group-stacked param pytree — or export back for a side-by-side run.

Accepts torch tensors (detached to CPU) or anything ``np.asarray`` takes;
torch itself is only imported when a tensor needs converting.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np

__all__ = [
    "extract_embedding_tables",
    "from_torchrec_state_dict",
    "to_torchrec_state_dict",
]

_MARKERS = ("embedding_bags.", "embeddings.")


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch.Tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def extract_embedding_tables(
    state_dict: Mapping[str, object], prefix: Optional[str] = None
) -> Dict[str, np.ndarray]:
    """Pull ``{table_name: weight}`` out of a reference state_dict.

    ``prefix``: restrict to keys under one submodule path (e.g.
    ``"sparse_arch.embedding_bag_collection"``); default scans the whole
    dict for the ``embedding_bags.``/``embeddings.`` markers."""
    out: Dict[str, np.ndarray] = {}
    for key, v in state_dict.items():
        if prefix is not None:
            if not key.startswith(prefix + "."):
                continue
            key = key[len(prefix) + 1:]
        if not key.endswith(".weight"):
            continue
        stem = key[: -len(".weight")]
        for marker in _MARKERS:
            pos = stem.find(marker)
            # marker must start a module-path component
            if pos >= 0 and (pos == 0 or stem[pos - 1] == "."):
                table = stem[pos + len(marker):]
                if table and "." not in table:
                    if table in out:
                        raise KeyError(
                            f"table {table!r} appears twice; pass prefix= to "
                            "disambiguate"
                        )
                    out[table] = _to_numpy(v)
                break
    return out


def from_torchrec_state_dict(
    module, state_dict: Mapping[str, object], prefix: Optional[str] = None
):
    """Reference state_dict -> this module's param pytree.

    ``module`` is an (unsharded) ``EmbeddingBagCollection`` /
    ``EmbeddingCollection``; for a sharded module, load unsharded first
    and use ``sharded.shard_params`` (or ``checkpoint.import_state_dict``)."""
    tables = extract_embedding_tables(state_dict, prefix)
    if not tables:
        raise KeyError(
            "no embedding_bags.<t>.weight / embeddings.<t>.weight entries "
            f"found{' under prefix ' + repr(prefix) if prefix else ''}"
        )
    return module.params_from_tables(tables)


def to_torchrec_state_dict(
    module, params, prefix: str = "", as_torch: bool = True,
    opt_states=None, optimizer=None,
) -> Dict[str, object]:
    """This module's params -> reference-FQN state_dict.

    EBC emits ``embedding_bags.<t>.weight``; EC ``embeddings.<t>.weight``.
    ``as_torch=True`` returns torch CPU tensors (loadable straight into a
    reference module via ``load_state_dict``). With ``opt_states`` +
    ``optimizer``, also emits per-table fused-optimizer state under the
    reference's split-state names (``<t>.momentum1`` ...,
    batched_embedding_kernel.py:1215) — materialized to logical views
    whatever the storage layout (colocated / pair-packed / tile-row)."""
    from torchrec_tpu.modules.embedding_modules import EmbeddingBagCollection

    marker = (
        "embedding_bags" if isinstance(module, EmbeddingBagCollection)
        else "embeddings"
    )
    base = f"{prefix}.{marker}" if prefix else marker
    out: Dict[str, object] = {}

    def put(key, arr):
        if as_torch:
            import torch

            out[key] = torch.from_numpy(np.asarray(arr).copy())
        else:
            out[key] = np.asarray(arr)

    for name, w in module.split_params(params).items():
        put(f"{base}.{name}.weight", w)
    if opt_states is not None:
        from torchrec_tpu.checkpoint import TORCHREC_STATE_NAMES

        st = module.materialize_optimizer_state(
            params, opt_states, optimizer
        )
        for name, sub in st.items():
            for k, v in sub.items():
                put(
                    f"{base}.{name}.{TORCHREC_STATE_NAMES.get(k, k)}", v
                )
    return out
