"""Debug wrappers: id-bounds and non-finite guards around embedding ops.

Capability parity with torchrec/modules/debug_embedding_modules.py
(DebugEmbeddingBagCollection:133 / DebugEmbeddingCollection:46 — wrap the
module to catch bad ids and non-finite activations/gradients during
debugging, off by default in production).

TPU-native shape: ``jax.experimental.checkify`` functionalizes the checks
so they survive jit — ``apply_checked`` returns ``(error, out)``; call
``error.throw()`` host-side (or inspect ``error.get()``) after the step.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from torchrec_tpu.modules.embedding_modules import EmbeddingBagCollection
from torchrec_tpu.sparse import KeyedJaggedTensor

__all__ = ["DebugEmbeddingBagCollection"]


class DebugEmbeddingBagCollection:
    """EBC wrapper asserting in-bounds ids and finite outputs/params.

    ``apply_checked(params, kjt) -> (error, KeyedTensor)``; under jit the
    checks ride along as values (checkify), so this works inside the same
    compiled step — pay the cost only in debug runs.
    """

    def __init__(self, ebc: EmbeddingBagCollection):
        self._ebc = ebc

    @property
    def unwrapped(self) -> EmbeddingBagCollection:
        return self._ebc

    def _checked_apply(self, params, kjt: KeyedJaggedTensor):
        ebc = self._ebc
        kjt_sel = kjt.select_keys(ebc.feature_names())
        values = kjt_sel.values()
        seg = kjt_sel.segment_ids()
        b = kjt_sel.stride()
        f = len(ebc.feature_names())
        slot_feature = jnp.minimum(seg // b, f)
        # per-slot table capacity (padding slots -> huge cap, always pass)
        caps = jnp.asarray(
            [
                ebc.embedding_bag_configs()[
                    ebc._feature_table[fi]
                ].num_embeddings
                for fi in range(f)
            ]
            + [2**31 - 1],
            jnp.int32,
        )
        cap_of_slot = jnp.take(caps, slot_feature)
        valid = slot_feature < f
        checkify.check(
            jnp.all(~valid | ((values >= 0) & (values < cap_of_slot))),
            "embedding id out of bounds for its table",
        )
        for g in ebc.groups:
            checkify.check(
                jnp.all(jnp.isfinite(params[g.key].astype(jnp.float32))),
                "non-finite values in embedding table group",
            )
        out = ebc.apply(params, kjt)
        checkify.check(
            jnp.all(jnp.isfinite(out.values())),
            "non-finite pooled embedding output",
        )
        return out

    def apply_checked(self, params, kjt: KeyedJaggedTensor) -> Tuple:
        """-> (checkify error, KeyedTensor). Call ``error.throw()``."""
        return checkify.checkify(self._checked_apply)(params, kjt)

    def apply(self, params, kjt: KeyedJaggedTensor):
        """Eager convenience: run checks and raise immediately."""
        err, out = self.apply_checked(params, kjt)
        err.throw()
        return out
