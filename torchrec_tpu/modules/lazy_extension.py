"""Lazy initialization for functional modules.

Capability parity with torchrec/modules/lazy_extension.py
(LazyModuleExtensionMixin — modules whose parameters materialize on first
forward, so models can be authored before shapes/devices are known).

TPU-native shape: params are explicit pytrees here, so "lazy" means a
wrapper that calls ``module.init`` on first use and then owns the params —
convenient for authoring/demo flows; production code passes params
explicitly through the jitted step.
"""

from __future__ import annotations

from typing import Any, Optional

import jax

__all__ = ["LazyInit"]


class LazyInit:
    """Defer ``module.init`` until the first call.

    ``LazyInit(ebc)(kjt)`` initializes on first use (with ``seed``) and
    applies; ``.params`` exposes the materialized pytree (e.g. to hand to a
    sharder or checkpointer), ``.initialized`` reports state — mirroring the
    reference mixin's has_uninitialized_params contract.
    """

    def __init__(self, module: Any, seed: int = 0):
        self._module = module
        self._seed = seed
        self._params: Optional[Any] = None

    @property
    def initialized(self) -> bool:
        return self._params is not None

    @property
    def params(self) -> Any:
        if self._params is None:
            raise RuntimeError(
                "LazyInit: parameters are not materialized yet; call the "
                "module once or call .materialize()"
            )
        return self._params

    def materialize(self) -> Any:
        if self._params is None:
            self._params = self._module.init(jax.random.key(self._seed))
        return self._params

    def __call__(self, *args, **kwargs):
        return self._module.apply(self.materialize(), *args, **kwargs)

    def __getattr__(self, name):
        # delegate structural accessors (feature_names etc.)
        return getattr(self._module, name)
