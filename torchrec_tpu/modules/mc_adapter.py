"""One-call adapters: plain EC/EBC configs -> managed-collision modules.

Capability parity with torchrec/modules/mc_adapter.py
(McEmbeddingCollectionAdapter:36, McEmbeddingBagCollectionAdapter:147):
take the table configs of an EXISTING collection and wrap it in a
managed-collision composition without touching model code — one MC module
per table, chosen by ``zch_method``:

* ``"mpzch"`` — multi-probe hash ZCH (`HashZchManagedCollisionModule`,
  TTL eviction), the reference's default benchmark path;
* ``"sort_zch"`` — sorted MCH with DistanceLFU eviction
  (`MCHManagedCollisionModule`).

TPU-first differences: the adapters are functional like everything else
(``init`` / ``init_mc_state`` / ``apply`` threading state pytrees), and
reference knobs that only tune torch/CUDA details are accepted for
signature parity but ignored where our kernels have no analog
(``allow_in_place_embed_weight_update`` — XLA donation handles in-place;
``mpzch_num_buckets`` — bucket count exists for torch sharding, our
sharded MC path shards the probe table by rows; ``world_size`` — only a
default for bucket count in the reference).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from torchrec_tpu.modules.embedding_configs import (
    EmbeddingBagConfig,
    EmbeddingConfig,
)
from torchrec_tpu.modules.embedding_modules import (
    EmbeddingBagCollection,
    EmbeddingCollection,
)
from torchrec_tpu.modules.hash_mc_modules import HashZchManagedCollisionModule
from torchrec_tpu.modules.mc_embedding_modules import (
    ManagedCollisionEmbeddingBagCollection,
    ManagedCollisionEmbeddingCollection,
)
from torchrec_tpu.modules.mc_modules import (
    DISTANCE_LFU_EVICTION,
    MCHManagedCollisionModule,
    ManagedCollisionCollection,
)

__all__ = [
    "McEmbeddingCollectionAdapter",
    "McEmbeddingBagCollectionAdapter",
    "build_mc_collection",
]

_ZCH_METHODS = ("mpzch", "sort_zch")


def build_mc_collection(
    tables: Sequence[Union[EmbeddingConfig, EmbeddingBagConfig]],
    input_hash_size: int,
    zch_method: str = "mpzch",
    eviction_interval: int = 1,
    mpzch_max_probe: Optional[int] = None,
    history_size: int = 4096,
) -> ManagedCollisionCollection:
    """Per-table MC modules + feature routing for ``tables`` (the shared
    half of both adapters; reference mc_adapter.py:73-117)."""
    if zch_method not in _ZCH_METHODS:
        raise NotImplementedError(
            f"zch_method {zch_method!r} is not supported (one of "
            f"{_ZCH_METHODS})"
        )
    del input_hash_size  # our MC modules hash/search the raw id space
    mc_modules = {}
    feature_to_table = {}
    for t in tables:
        if zch_method == "mpzch":
            mc_modules[t.name] = HashZchManagedCollisionModule(
                zch_size=t.num_embeddings,
                num_probes=min(mpzch_max_probe or 8, t.num_embeddings),
                # reference single-TTL eviction: eviction_interval "hours"
                # become our iteration-count TTL ticks
                ttl=max(eviction_interval, 1) * 1000,
            )
        else:
            mc_modules[t.name] = MCHManagedCollisionModule(
                zch_size=t.num_embeddings,
                history_size=history_size,
                eviction_interval=max(eviction_interval, 1),
                eviction_policy=DISTANCE_LFU_EVICTION,
            )
        for f in t.feature_names:
            feature_to_table[f] = t.name
    return ManagedCollisionCollection(mc_modules, feature_to_table)


class McEmbeddingCollectionAdapter(ManagedCollisionEmbeddingCollection):
    """EC configs -> MC-EC in one call (reference mc_adapter.py:36).

    ``apply(params, mc_states, kjt)`` returns
    ``(Dict[str, JaggedTensor], params, mc_states)`` over managed slots.
    """

    def __init__(
        self,
        tables: List[EmbeddingConfig],
        input_hash_size: int,
        world_size: int = 1,
        eviction_interval: int = 1,
        allow_in_place_embed_weight_update: bool = False,
        zch_method: str = "mpzch",
        mpzch_num_buckets: Optional[int] = None,
        mpzch_max_probe: Optional[int] = None,
    ):
        del world_size, allow_in_place_embed_weight_update, mpzch_num_buckets
        super().__init__(
            embedding_collection=EmbeddingCollection(list(tables)),
            managed_collision_collection=build_mc_collection(
                tables,
                input_hash_size,
                zch_method=zch_method,
                eviction_interval=eviction_interval,
                mpzch_max_probe=mpzch_max_probe,
            ),
        )


class McEmbeddingBagCollectionAdapter(ManagedCollisionEmbeddingBagCollection):
    """EBC configs -> MC-EBC in one call (reference mc_adapter.py:147).

    ``apply(params, mc_states, kjt)`` returns
    ``(KeyedTensor, params, mc_states)`` pooled over managed slots.
    """

    def __init__(
        self,
        tables: List[EmbeddingBagConfig],
        input_hash_size: int,
        world_size: int = 1,
        eviction_interval: int = 1,
        allow_in_place_embed_weight_update: bool = False,
        zch_method: str = "mpzch",
        mpzch_num_buckets: Optional[int] = None,
        mpzch_max_probe: Optional[int] = None,
    ):
        del world_size, allow_in_place_embed_weight_update, mpzch_num_buckets
        super().__init__(
            embedding_bag_collection=EmbeddingBagCollection(list(tables)),
            managed_collision_collection=build_mc_collection(
                tables,
                input_hash_size,
                zch_method=zch_method,
                eviction_interval=eviction_interval,
                mpzch_max_probe=mpzch_max_probe,
            ),
        )
