"""torchrec_tpu — a TPU-native recommender framework (JAX/XLA/Pallas).

Capability parity with meta-pytorch/torchrec (public root API at
torchrec/__init__.py:10-29), architected TPU-first: registered-pytree sparse
batches, Pallas table-batched embedding kernels, shard_map sharding over
device meshes, a cost-model sharding planner, and fused sparse optimizers.
"""

from torchrec_tpu.modules.embedding_configs import (
    EmbeddingBagConfig,
    EmbeddingConfig,
)
from torchrec_tpu.modules.embedding_modules import (
    EmbeddingBagCollection,
    EmbeddingCollection,
)
from torchrec_tpu.sparse import (
    JaggedTensor,
    KeyedJaggedTensor,
    KeyedTensor,
)
from torchrec_tpu.streamable import Multistreamable, Pipelineable
from torchrec_tpu.types import (
    ComputeKernel,
    DataType,
    PoolingType,
    ShardingType,
)

__version__ = "0.1.0"

__all__ = [
    "EmbeddingBagConfig",
    "EmbeddingConfig",
    "EmbeddingBagCollection",
    "EmbeddingCollection",
    "JaggedTensor",
    "KeyedJaggedTensor",
    "KeyedTensor",
    "Multistreamable",
    "Pipelineable",
    "ComputeKernel",
    "DataType",
    "PoolingType",
    "ShardingType",
]
