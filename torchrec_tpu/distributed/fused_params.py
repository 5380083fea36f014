"""FusedParams: kernel-knob bundle threaded from sharding config to kernels.

Capability parity with torchrec/distributed/fused_params.py (the
``fused_params`` dict sharders forward into FBGEMM TBE kernels —
``optimizer``/``learning_rate`` via apply_optimizer_in_backward,
``stochastic_rounding``, ``output_dtype``/FUSED_PARAM constants,
``cache_load_factor``) and planner/types.py CacheParams.

TPU mapping: the knobs land in three places —
  * module-level backward window + count-matrix gates
    (``max_unique_gradient_rows``, ``count_matrix_impl``, ``packed_sort``
    become per-INSTANCE attribute overrides on the collection; the class
    attributes stay the defaults),
  * the fused optimizer (built by name through the
    :func:`torchrec_tpu.ops.fused_optim.make_optimizer` registry, with
    ``stochastic_rounding`` threaded), and
  * planner pricing (``cache_load_factor`` flows into
    ParameterConstraints for cached/host-resident compute kernels).

``shard()`` / ``DistributedModelParallel`` accept ``fused_params=`` and
call :func:`apply_fused_params` before building the sharded module.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

__all__ = ["FusedParams", "apply_fused_params"]


@dataclasses.dataclass(frozen=True)
class FusedParams:
    """One bundle of kernel knobs (reference fused_params.py:120
    fused_params dict keys; planner/types.py:459 CacheParams).

    ``optimizer``/``learning_rate``/``optimizer_kwargs``: fused-in-backward
    optimizer spec, resolved through the ``make_optimizer`` registry (the
    apply_optimizer_in_backward analog).
    ``stochastic_rounding``: bf16-table update rounding (SGD /
    RowWiseAdagrad).
    ``max_unique_gradient_rows``: large-table backward window bound
    (overflow surfaces via ``gradient_overflow``).
    ``count_matrix_impl``: small-table backward builder ("v1"/"v2"/"v3");
    ``packed_sort``: single-u32 packed sort gate for the v3 stream.
    ``cache_load_factor``: HBM-resident fraction for cached kernels
    (planner pricing via ParameterConstraints).
    """

    optimizer: Optional[str] = None
    learning_rate: float = 0.01
    optimizer_kwargs: Optional[Dict[str, Any]] = None
    stochastic_rounding: bool = False
    max_unique_gradient_rows: Optional[int] = None
    count_matrix_impl: Optional[str] = None
    packed_sort: Optional[bool] = None
    cache_load_factor: Optional[float] = None

    def make_optimizer(self):
        """Build the fused optimizer this bundle describes (or None)."""
        if self.optimizer is None:
            return None
        from torchrec_tpu.ops.fused_optim import make_optimizer

        kwargs = dict(self.optimizer_kwargs or {})
        kwargs.setdefault("learning_rate", self.learning_rate)
        if self.stochastic_rounding:
            kwargs.setdefault("stochastic_rounding", True)
        return make_optimizer(self.optimizer, **kwargs)

    def constraints(self, **overrides):
        """ParameterConstraints carrying the planner-visible knobs."""
        from torchrec_tpu.planner.types import ParameterConstraints

        kw: Dict[str, Any] = {}
        if self.cache_load_factor is not None:
            kw["cache_load_factor"] = self.cache_load_factor
        kw.update(overrides)
        return ParameterConstraints(**kw)


def apply_fused_params(module, fp: Optional[FusedParams]):
    """Thread the module-level knobs into an embedding collection.

    Sets per-instance overrides (shadowing the class-attribute defaults)
    so two collections can run different kernel configs side by side —
    the reference's per-sharder fused_params dict scoping. Returns the
    module for chaining.
    """
    if fp is None:
        return module
    if fp.max_unique_gradient_rows is not None:
        if getattr(module, "_max_unique", None) not in (
            None,
            fp.max_unique_gradient_rows,
        ):
            raise ValueError(
                "fused_params.max_unique_gradient_rows conflicts with the "
                f"module's ({module._max_unique}); set one or the other"
            )
        # the scratch-tail blob layout is fixed at construction; a bound
        # arriving late still gets the windowed backward (masked OOB
        # sentinels), just not the branch-free scratch-tail write — pass
        # the bound to EmbeddingBagCollection(...) for peak throughput
        if getattr(module, "_max_unique", None) is None:
            module._max_unique = fp.max_unique_gradient_rows
    if fp.count_matrix_impl is not None:
        if fp.count_matrix_impl not in ("v1", "v2", "v3"):
            raise ValueError(
                f"unknown count_matrix_impl {fp.count_matrix_impl!r}"
            )
        module._CM_IMPL = fp.count_matrix_impl
    if fp.packed_sort is not None:
        module._CM_PACKED_SORT = fp.packed_sort
    return module
