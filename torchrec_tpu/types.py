"""Core enums and small shared types.

Capability parity with the reference's ``torchrec/types.py``,
``torchrec/modules/embedding_configs.py:33`` (PoolingType/DataType) and
``torchrec/distributed/types.py:148`` (ShardingType) /
``torchrec/distributed/embedding_types.py:87`` (EmbeddingComputeKernel) —
re-designed for a JAX/TPU stack (no torch dtypes; jnp dtypes instead).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class PoolingType(enum.Enum):
    """Pooling applied to a feature's jagged id-list embeddings.

    Reference: torchrec/modules/embedding_configs.py:33.
    """

    SUM = "SUM"
    MEAN = "MEAN"
    NONE = "NONE"  # unpooled (sequence / EmbeddingCollection)


class DataType(enum.Enum):
    """Storage dtype of embedding table weights.

    Reference: torchrec/types.py (DataType enum) — FP32/FP16/BF16/INT8/INT4/FP8.
    """

    FP32 = "FP32"
    FP16 = "FP16"
    BF16 = "BF16"
    INT8 = "INT8"
    INT4 = "INT4"
    FP8 = "FP8"

    def as_jnp(self):
        return {
            DataType.FP32: jnp.float32,
            DataType.FP16: jnp.float16,
            DataType.BF16: jnp.bfloat16,
            DataType.INT8: jnp.int8,
            DataType.INT4: jnp.int8,  # packed at a higher layer
            DataType.FP8: jnp.float8_e4m3fn,
        }[self]

    @property
    def bytes_per_element(self) -> float:
        return {
            DataType.FP32: 4.0,
            DataType.FP16: 2.0,
            DataType.BF16: 2.0,
            DataType.INT8: 1.0,
            DataType.INT4: 0.5,
            DataType.FP8: 1.0,
        }[self]


class ShardingType(enum.Enum):
    """How an embedding table is partitioned over the device mesh.

    Reference: torchrec/distributed/types.py:148. TPU semantics:
      - DATA_PARALLEL: table replicated on every chip; grads all-reduced.
      - TABLE_WISE: whole table on one chip.
      - ROW_WISE: rows range-split over all chips.
      - COLUMN_WISE: columns split into >=128-wide blocks over chips.
      - TABLE_ROW_WISE: rows split within one host, table-wise across hosts.
      - TABLE_COLUMN_WISE: columns split within one host.
      - GRID_SHARD: row ranges x column blocks (CW x TWRW grid).
    """

    DATA_PARALLEL = "data_parallel"
    TABLE_WISE = "table_wise"
    COLUMN_WISE = "column_wise"
    ROW_WISE = "row_wise"
    TABLE_ROW_WISE = "table_row_wise"
    TABLE_COLUMN_WISE = "table_column_wise"
    GRID_SHARD = "grid_shard"


class ComputeKernel(enum.Enum):
    """Which lookup kernel implementation backs a sharded table group.

    Reference: torchrec/distributed/embedding_types.py:87-108
    (EmbeddingComputeKernel). TPU mapping:
      - DENSE: gradients materialized (for DATA_PARALLEL tables).
      - FUSED: Pallas/XLA table-batched lookup with sparse in-backward
        optimizer update (FBGEMM TBE's role).
      - FUSED_HOST_OFFLOAD: table lives in host RAM (``pinned_host`` memory
        kind), rows staged to HBM on demand (UVM-caching analog).
      - QUANT: int8/fp8 inference lookup with dequant-in-kernel.
      - KEY_VALUE: host-side KV store backing (SSD analog).
    """

    DENSE = "dense"
    FUSED = "fused"
    FUSED_HOST_OFFLOAD = "fused_host_offload"
    QUANT = "quant"
    KEY_VALUE = "key_value"
