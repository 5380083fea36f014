from torchrec_tpu.ops.fused_optim import (
    LAMB,
    Adagrad,
    LarsSGD,
    PartialRowWiseLAMB,
    Adam,
    EmbeddingOptimizer,
    PartialRowWiseAdam,
    RowWiseAdagrad,
    SGD,
    make_optimizer,
)
from torchrec_tpu.ops.lookup import (
    accumulate_dense,
    dedup_rows,
    grad_rows,
    pooled_lookup,
    sequence_lookup,
)

__all__ = [
    "LAMB",
    "Adagrad",
    "LarsSGD",
    "PartialRowWiseLAMB",
    "Adam",
    "EmbeddingOptimizer",
    "PartialRowWiseAdam",
    "RowWiseAdagrad",
    "SGD",
    "make_optimizer",
    "dedup_rows",
    "accumulate_dense",
    "grad_rows",
    "pooled_lookup",
    "sequence_lookup",
]
