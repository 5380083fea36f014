"""IR / export: serialize compiled model functions for deployment.

Capability parity with torchrec/ir/ (torch.export round-trip:
encapsulate/decapsulate_ir_modules utils.py:135,166, JsonSerializer
serializer.py:161, mark_dynamic_kjt utils.py:216), torchrec/fx/ (graph
capture) and the inference packaging (inference/model_packager.py
PredictFactoryPackager).

TPU-first: graph capture IS ``jax.jit`` tracing; the stable serialized
artifact is a ``jax.export`` StableHLO payload — portable across processes
and compatible binaries (the torch.export/TorchScript role). Dynamic batch
dims use jax.export symbolic shapes (mark_dynamic_kjt analog). Module
configs serialize to JSON alongside the payload so the authoring-module
structure round-trips (JsonSerializer role).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchrec_tpu.modules.embedding_configs import (
    EmbeddingBagConfig,
    EmbeddingConfig,
)
from torchrec_tpu.types import PoolingType

__all__ = [
    "serialize_embedding_configs",
    "deserialize_embedding_configs",
    "export_fn",
    "import_fn",
    "save_predict_package",
    "load_predict_package",
]


# ------------------------------------------------------------- config JSON
def serialize_embedding_configs(configs: Sequence) -> str:
    """JSON round-trip of table configs (reference JsonSerializer,
    ir/serializer.py:161)."""
    out = []
    for c in configs:
        out.append(
            {
                "kind": type(c).__name__,
                "name": c.name,
                "num_embeddings": c.num_embeddings,
                "embedding_dim": c.embedding_dim,
                "feature_names": list(c.feature_names),
                "pooling": getattr(c, "pooling", PoolingType.SUM).value,
                "data_type": c.data_type.value,
            }
        )
    return json.dumps(out)


def deserialize_embedding_configs(payload: str) -> List:
    from torchrec_tpu.types import DataType

    out = []
    for d in json.loads(payload):
        cls = EmbeddingBagConfig if d["kind"] == "EmbeddingBagConfig" else EmbeddingConfig
        kwargs = dict(
            name=d["name"],
            num_embeddings=d["num_embeddings"],
            embedding_dim=d["embedding_dim"],
            feature_names=d["feature_names"],
            data_type=DataType(d["data_type"]),
        )
        if cls is EmbeddingBagConfig:
            kwargs["pooling"] = PoolingType(d["pooling"])
        out.append(cls(**kwargs))
    return out


# ---------------------------------------------------------------- function
def export_fn(
    fn: Callable,
    example_args: Tuple,
    dynamic_batch_axes: Optional[Dict[int, int]] = None,
) -> bytes:
    """Serialize a jittable function to a portable StableHLO payload.

    ``dynamic_batch_axes``: {arg index: axis} to mark symbolic ("B") — the
    mark_dynamic_kjt analog (reference ir/utils.py:216).
    """
    from jax import export as jexport

    args = list(example_args)
    shapes = []
    # ONE symbol in ONE scope shared by every dynamic axis: per-arg
    # symbolic_shape() calls would create unrelated scopes (export rejects
    # mixed scopes) and, worse, unrelated "B"s that drop the equal-batch
    # constraint across arguments
    sym = (
        jexport.symbolic_shape("B")[0]
        if dynamic_batch_axes
        else None
    )
    for i, a in enumerate(args):
        a = jnp.asarray(a)
        if dynamic_batch_axes and i in dynamic_batch_axes:
            ax = dynamic_batch_axes[i]
            dims = list(a.shape)
            dims[ax] = sym
            shapes.append(jax.ShapeDtypeStruct(tuple(dims), a.dtype))
        else:
            shapes.append(jax.ShapeDtypeStruct(a.shape, a.dtype))
    exported = jexport.export(jax.jit(fn))(*shapes)
    return bytes(exported.serialize())


def import_fn(payload: bytes) -> Callable:
    """Deserialize an exported function; returns a callable running the
    compiled payload (reference decapsulate_ir_modules / TorchScript
    loading)."""
    from jax import export as jexport

    exported = jexport.deserialize(payload)
    return lambda *args: exported.call(*args)


# ----------------------------------------------------------------- package
def save_predict_package(
    path: str,
    fn: Callable,
    params,
    example_batch_args: Tuple,
    configs: Optional[Sequence] = None,
) -> None:
    """Write a self-contained inference package: exported StableHLO of
    ``fn(params, *batch_args)`` with params BAKED via closure, the params
    as npz, and the table configs as JSON (reference
    PredictFactoryPackager.save_predict_module)."""
    os.makedirs(path, exist_ok=True)
    flat, treedef = jax.tree_util.tree_flatten(params)

    def fn_with_params(*batch_args):
        p = jax.tree_util.tree_unflatten(treedef, list(batch_args[: len(flat)]))
        return fn(p, *batch_args[len(flat):])

    all_args = tuple(flat) + tuple(example_batch_args)
    payload = export_fn(fn_with_params, all_args)
    with open(os.path.join(path, "model.stablehlo"), "wb") as f:
        f.write(payload)
    np.savez(
        os.path.join(path, "params.npz"),
        **{f"p{i}": np.asarray(a) for i, a in enumerate(flat)},
    )
    meta = {"n_params": len(flat)}
    if configs is not None:
        meta["configs"] = serialize_embedding_configs(configs)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_predict_package(path: str) -> Tuple[Callable, Optional[List]]:
    """Returns (predict(*batch_args), configs) — params are pre-bound."""
    with open(os.path.join(path, "model.stablehlo"), "rb") as f:
        fn = import_fn(f.read())
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    data = np.load(os.path.join(path, "params.npz"))
    flat = [jnp.asarray(data[f"p{i}"]) for i in range(meta["n_params"])]
    configs = (
        deserialize_embedding_configs(meta["configs"])
        if "configs" in meta
        else None
    )
    return (lambda *batch_args: fn(*flat, *batch_args)), configs
