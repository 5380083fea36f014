"""Optimizers: FQN-keyed facade, clipping, warmup, and re-exports of the
fused embedding optimizers (reference torchrec/optim/optimizers.py:37-151
maps eager wrappers to fused OptimTypes — here both live in ops.fused_optim).
"""

from torchrec_tpu.ops.fused_optim import (
    Adam,
    EmbeddingOptimizer,
    PartialRowWiseAdam,
    RowWiseAdagrad,
    SGD,
    make_optimizer,
)
from torchrec_tpu.optim.clipping import (
    clip_by_global_norm,
    clip_by_value,
    sharded_global_norm,
)
from torchrec_tpu.optim.keyed import (
    CombinedOptimizer,
    KeyedOptimizer,
    OptimizerWrapper,
)
from torchrec_tpu.optim.warmup import (
    WarmupPolicy,
    WarmupStage,
    make_warmup_schedule,
)

__all__ = [
    "Adam",
    "EmbeddingOptimizer",
    "PartialRowWiseAdam",
    "RowWiseAdagrad",
    "SGD",
    "make_optimizer",
    "clip_by_global_norm",
    "clip_by_value",
    "sharded_global_norm",
    "CombinedOptimizer",
    "KeyedOptimizer",
    "OptimizerWrapper",
    "WarmupPolicy",
    "WarmupStage",
    "make_warmup_schedule",
]
