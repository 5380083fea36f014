"""Embedding kernels and fused optimizers (the FBGEMM-TBE role; reference distributed/batched_embedding_kernel.py:3725)."""
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
from torchrec_tpu.ops.tbe_pallas import (  # noqa: E402
    fused_sorted_sgd_apply,
    row_scatter_add,
    supports_row_scatter_add,
)

__all__ += [
    "row_scatter_add",
    "supports_row_scatter_add",
    "fused_sorted_sgd_apply",
]
