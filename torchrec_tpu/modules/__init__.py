"""Authoring-layer modules (reference torchrec/modules/__init__.py)."""
from torchrec_tpu.modules.activation import SwishLayerNorm
from torchrec_tpu.modules.crossnet import (
    CrossNet,
    LowRankCrossNet,
    LowRankMixtureCrossNet,
    VectorCrossNet,
)
from torchrec_tpu.modules.deepfm import DeepFM, FactorizationMachine
from torchrec_tpu.modules.embedding_configs import (
    BaseEmbeddingConfig,
    CountBasedEvictionPolicy,
    CountTimestampMixedEvictionPolicy,
    EmbeddingBagConfig,
    EmbeddingConfig,
    FeatureL2NormBasedEvictionPolicy,
    FeatureScoreBasedEvictionPolicy,
    NoEvictionPolicy,
    TimestampBasedEvictionPolicy,
    VirtualTableEvictionPolicy,
)
from torchrec_tpu.modules.embedding_modules import (
    EmbeddingBagCollection,
    EmbeddingCollection,
    TableGroup,
)
from torchrec_tpu.modules.fused_embedding_modules import (
    FusedEmbeddingBagCollection,
)
from torchrec_tpu.modules.kv_embedding import KeyValueEmbeddingBagCollection
from torchrec_tpu.modules.embedding_tower import (
    EmbeddingTower,
    EmbeddingTowerCollection,
)
from torchrec_tpu.modules.feature_processor import (
    FeatureProcessedEmbeddingBagCollection,
    PositionWeightedModule,
    PositionWeightedModuleCollection,
)
from torchrec_tpu.modules.itep import (
    GenericITEPModule,
    ITEPEmbeddingBagCollection,
    ITEPEmbeddingCollection,
)
from torchrec_tpu.modules.hash_mc_metrics import (
    ConsoleScalarLoggerBackend,
    ScalarLogger,
    ScalarLoggerBackend,
    mpzch_batch_stats,
)
from torchrec_tpu.modules.mc_adapter import (
    McEmbeddingBagCollectionAdapter,
    McEmbeddingCollectionAdapter,
)
from torchrec_tpu.modules.mc_embedding_modules import (
    ManagedCollisionEmbeddingBagCollection,
    ManagedCollisionEmbeddingCollection,
)
from torchrec_tpu.modules.pruning_logger import (
    PruningLogger,
    PruningLoggerDefault,
)
from torchrec_tpu.modules.mc_modules import (
    DISTANCE_LFU_EVICTION,
    LFU_EVICTION,
    LRU_EVICTION,
    ManagedCollisionCollection,
    MCHManagedCollisionModule,
)
from torchrec_tpu.modules.mlp import MLP, Perceptron
from torchrec_tpu.modules.object_pool import KeyedJaggedTensorPool, TensorPool
from torchrec_tpu.modules.regroup import KTRegroupAsDict, regroup_kts

__all__ = [
    "BaseEmbeddingConfig",
    "EmbeddingBagConfig",
    "EmbeddingConfig",
    "EmbeddingBagCollection",
    "EmbeddingCollection",
    "TableGroup",
    "FusedEmbeddingBagCollection",
    "KeyValueEmbeddingBagCollection",
    "SwishLayerNorm",
    "CrossNet",
    "LowRankCrossNet",
    "LowRankMixtureCrossNet",
    "VectorCrossNet",
    "DeepFM",
    "FactorizationMachine",
    "EmbeddingTower",
    "EmbeddingTowerCollection",
    "FeatureProcessedEmbeddingBagCollection",
    "PositionWeightedModule",
    "PositionWeightedModuleCollection",
    "GenericITEPModule",
    "ITEPEmbeddingBagCollection",
    "ITEPEmbeddingCollection",
    "ManagedCollisionEmbeddingBagCollection",
    "ManagedCollisionEmbeddingCollection",
    "McEmbeddingBagCollectionAdapter",
    "McEmbeddingCollectionAdapter",
    "ScalarLogger",
    "ScalarLoggerBackend",
    "ConsoleScalarLoggerBackend",
    "mpzch_batch_stats",
    "PruningLogger",
    "PruningLoggerDefault",
    "ManagedCollisionCollection",
    "MCHManagedCollisionModule",
    "LFU_EVICTION",
    "LRU_EVICTION",
    "DISTANCE_LFU_EVICTION",
    "MLP",
    "Perceptron",
    "KeyedJaggedTensorPool",
    "TensorPool",
    "KTRegroupAsDict",
    "regroup_kts",
    "VirtualTableEvictionPolicy",
    "NoEvictionPolicy",
    "CountBasedEvictionPolicy",
    "TimestampBasedEvictionPolicy",
    "CountTimestampMixedEvictionPolicy",
    "FeatureL2NormBasedEvictionPolicy",
    "FeatureScoreBasedEvictionPolicy",
]
