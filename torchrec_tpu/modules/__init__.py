from torchrec_tpu.modules.embedding_configs import (
    BaseEmbeddingConfig,
    EmbeddingBagConfig,
    EmbeddingConfig,
)
from torchrec_tpu.modules.embedding_modules import (
    EmbeddingBagCollection,
    EmbeddingCollection,
    TableGroup,
)

__all__ = [
    "BaseEmbeddingConfig",
    "EmbeddingBagConfig",
    "EmbeddingConfig",
    "EmbeddingBagCollection",
    "EmbeddingCollection",
    "TableGroup",
]
