"""FusedEmbeddingBagCollection — EBC with the optimizer fused into the
module (single-process convenience facade).

Capability parity with torchrec/modules/fused_embedding_modules.py
(FusedEmbeddingBagCollection:279 — an EBC backed directly by a fused-TBE
with apply_optimizer_in_backward semantics, for single-process use).

TPU-first: our base EmbeddingBagCollection is ALREADY table-batched and
fused (ops/lookup + ops/fused_optim); this facade just binds the optimizer
and carries its state so single-process users get the one-object API:
``kt, new_self_state = fused_ebc.forward_backward(state, kjt, kt_grad)``.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from torchrec_tpu.modules.embedding_configs import EmbeddingBagConfig
from torchrec_tpu.modules.embedding_modules import EmbeddingBagCollection
from torchrec_tpu.ops.fused_optim import EmbeddingOptimizer, make_optimizer
from torchrec_tpu.sparse import KeyedJaggedTensor, KeyedTensor

__all__ = ["FusedEmbeddingBagCollection"]


class FusedEmbeddingBagCollection(EmbeddingBagCollection):
    """EBC + bound fused optimizer (reference :279).

    ``optimizer_type``/``optimizer_kwargs`` mirror the reference ctor
    (fused_embedding_modules.py optimizer_type=torch.optim.SGD analog).
    """

    def __init__(
        self,
        tables: Sequence[EmbeddingBagConfig],
        optimizer_type: str = "sgd",
        optimizer_kwargs: Optional[dict] = None,
        **ebc_kwargs,
    ):
        super().__init__(tables, **ebc_kwargs)
        self._optimizer: EmbeddingOptimizer = make_optimizer(
            optimizer_type, **(optimizer_kwargs or {})
        )

    @property
    def optimizer(self) -> EmbeddingOptimizer:
        return self._optimizer

    def init_full_state(self, key: jax.Array):
        """(params, optimizer state) in one call."""
        params = self.init(key)
        return params, self.init_optimizer(params, self._optimizer)

    def forward_backward(
        self,
        params,
        opt_states,
        kjt: KeyedJaggedTensor,
        kt_grad: jnp.ndarray,
        lr=None,
    ):
        """Lookup + fused in-backward update in one call: returns
        (KeyedTensor, new params, new opt states)."""
        kt = self.apply(params, kjt)
        new_params, new_states = self.apply_gradients(
            params, opt_states, self._optimizer, kjt, kt_grad, lr=lr
        )
        return kt, new_params, new_states
