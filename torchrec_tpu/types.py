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

    Reference: torchrec/types.py (DataType enum) — FP32/FP16/BF16/INT8/INT4/INT2/FP8.
    """

    FP32 = "FP32"
    FP16 = "FP16"
    BF16 = "BF16"
    INT8 = "INT8"
    INT4 = "INT4"
    INT2 = "INT2"
    FP8 = "FP8"

    def as_jnp(self):
        return {
            DataType.FP32: jnp.float32,
            DataType.FP16: jnp.float16,
            DataType.BF16: jnp.bfloat16,
            DataType.INT8: jnp.int8,
            DataType.INT4: jnp.int8,  # packed at a higher layer
            DataType.INT2: jnp.int8,  # packed at a higher layer
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
            DataType.INT2: 0.25,
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
      - FUSED_HOST: table fully host-resident (``pinned_host`` memory
        kind); every lookup streams over PCIe (FUSED_UVM analog).
      - FUSED_HOST_OFFLOAD: host-resident table with an HBM row cache,
        rows staged on demand (FUSED_UVM_CACHING analog).
      - QUANT / QUANT_HOST / QUANT_HOST_OFFLOAD: int8/fp8 inference lookup
        with dequant-in-kernel, device- / host- / cached-host-resident
        (QUANT / QUANT_UVM / QUANT_UVM_CACHING analogs).
      - KEY_VALUE: host KV store backing a fully materialized table
        (SSD TBE analog; torchrec_tpu.modules.kv_embedding).
      - DRAM_VIRTUAL_TABLE / SSD_VIRTUAL_TABLE / DRAM_SSD_VIRTUAL_TABLE:
        KV-backed *virtual* (unbounded-id) tables — the C++ IDTransformer +
        parameter-server tier (torchrec_tpu.dynamic_embedding) with the
        named storage behind it.
      - CUSTOMIZED_KERNEL: user-registered lookup implementation hook.
    FUSED_TRITON has no member: it is the reference's GPU-only Triton
    fallback for FUSED; on TPU the XLA/Pallas path IS the only backend.
    """

    DENSE = "dense"
    FUSED = "fused"
    FUSED_HOST = "fused_host"
    FUSED_HOST_OFFLOAD = "fused_host_offload"
    QUANT = "quant"
    QUANT_HOST = "quant_host"
    QUANT_HOST_OFFLOAD = "quant_host_offload"
    KEY_VALUE = "key_value"
    DRAM_VIRTUAL_TABLE = "dram_virtual_table"
    SSD_VIRTUAL_TABLE = "ssd_virtual_table"
    DRAM_SSD_VIRTUAL_TABLE = "dram_ssd_virtual_table"
    CUSTOMIZED_KERNEL = "customized_kernel"

    def is_quant(self) -> bool:
        return self in (
            ComputeKernel.QUANT,
            ComputeKernel.QUANT_HOST,
            ComputeKernel.QUANT_HOST_OFFLOAD,
        )

    def is_host_resident(self) -> bool:
        """Table bytes live in host RAM (PCIe on the lookup path)."""
        return self in (
            ComputeKernel.FUSED_HOST,
            ComputeKernel.FUSED_HOST_OFFLOAD,
            ComputeKernel.QUANT_HOST,
            ComputeKernel.QUANT_HOST_OFFLOAD,
            ComputeKernel.KEY_VALUE,
            ComputeKernel.DRAM_VIRTUAL_TABLE,
        )

    def is_ssd_backed(self) -> bool:
        return self in (
            ComputeKernel.SSD_VIRTUAL_TABLE,
            ComputeKernel.DRAM_SSD_VIRTUAL_TABLE,
        )

    def uses_cache(self) -> bool:
        """A bounded fast-tier row cache fronts the table (cache_load_factor
        applies); reference analog: UVM_CACHING / SSD kernels."""
        return self in (
            ComputeKernel.FUSED_HOST_OFFLOAD,
            ComputeKernel.QUANT_HOST_OFFLOAD,
            ComputeKernel.KEY_VALUE,
            ComputeKernel.DRAM_VIRTUAL_TABLE,
            ComputeKernel.SSD_VIRTUAL_TABLE,
            ComputeKernel.DRAM_SSD_VIRTUAL_TABLE,
        )
