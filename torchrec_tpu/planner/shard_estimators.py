"""Perf + storage estimators for sharding candidates.

Capability parity with torchrec/distributed/planner/shard_estimators.py:71
(EmbeddingPerfEstimator) and :126 (EmbeddingStorageEstimator), with the
underlying roofline model re-derived for TPU:

* lookup/update are HBM-bandwidth-bound: time = bytes_touched / hbm_bw
  (+ a per-pass kernel overhead);
* output/input dists ride ICI within a host/slice, DCN across hosts;
  TWRW/GRID get the two-level discount the reference models via
  intra/cross-node bandwidths (planner/constants.py:16-17);
* host-offloaded kernels pay DDR bandwidth on the cache-miss fraction.
"""

from __future__ import annotations

from typing import Optional

from torchrec_tpu.planner import constants
from torchrec_tpu.planner.types import (
    Perf,
    PlannerShard,
    ShardingOption,
    Storage,
    Topology,
)
from torchrec_tpu.types import ComputeKernel, ShardingType

__all__ = ["EmbeddingPerfEstimator", "EmbeddingStorageEstimator"]


class EmbeddingPerfEstimator:
    """Per-shard fwd/bwd compute + comms cost model on TPU rooflines (reference planner/shard_estimators.py:71)."""

    def __init__(
        self,
        topology: Topology,
        batch_size: int = 512,
        optimizer: str = "rowwise_adagrad",
    ):
        self._t = topology
        self._batch = batch_size
        self._optimizer = optimizer

    def estimate(self, option: ShardingOption) -> None:
        for shard in option.shards:
            shard.perf = self._shard_perf(option, shard)

    def _shard_perf(self, o: ShardingOption, s: PlannerShard) -> Perf:
        t = self._t
        b = self._batch  # global batch
        elem = o.table.data_type.bytes_per_element
        st = o.sharding_type
        w = t.world_size
        # expected ids hitting this shard per step
        total_ids = b * o.pooling_factor * o.table.num_features()
        if st in (ShardingType.ROW_WISE,):
            ids_here = total_ids / w
        elif st in (ShardingType.TABLE_ROW_WISE, ShardingType.GRID_SHARD):
            ids_here = total_ids / t.local_world_size
        else:  # TW/CW/DP: every id of the table (or its column block)
            ids_here = total_ids
        if st == ShardingType.DATA_PARALLEL:
            ids_here = total_ids / w  # local batch only

        width_bytes = s.col_count * elem
        fwd_bytes = ids_here * width_bytes
        # bwd touches rows twice (grad scatter + optimizer state rows)
        bwd_bytes = fwd_bytes * constants.BACKWARD_COMPUTE_MULTIPLIER

        hbm_bw = t.hbm_bw
        ck = o.compute_kernel
        is_quant = ck.is_quant()
        if is_quant:
            bwd_bytes = 0.0  # inference kernels: no backward
        # slow-tier miss traffic (reference kernel_bw_lookup analog):
        # resident fraction (cache_load_factor) is served at HBM speed;
        # misses stream the backing tier.
        slow_penalty = 0.0
        touched = fwd_bytes + bwd_bytes
        if ck.is_host_resident() or ck.is_ssd_backed():
            from torchrec_tpu.planner.cache_stats import miss_fraction

            clf = (o.cache_load_factor or 0.2) if ck.uses_cache() else 0.0
            # MRC-driven when the table carries measured stats (reference
            # EmbeddingOffloadStats.expected_miss_rate); uniform-traffic
            # (1 - clf) otherwise
            miss = miss_fraction(o.cache_stats, clf) if ck.uses_cache() else 1.0
            slow_bw = (
                t.ssd_bw
                if ck == ComputeKernel.SSD_VIRTUAL_TABLE
                else t.ddr_bw
            )
            slow_penalty = touched * miss * (1.0 / slow_bw - 1.0 / hbm_bw)
            if ck == ComputeKernel.DRAM_SSD_VIRTUAL_TABLE:
                # misses past the DRAM tier hit NVMe
                slow_penalty += (
                    touched * miss ** 2 * (1.0 / t.ssd_bw - 1.0 / t.ddr_bw)
                )

        # narrow-row lookups are ISSUE-bound on TPU (measured ~2.5 ns/row
        # fwd, ~9.7 ns/id for the whole sort/dedup/write backward; see
        # constants.py) — take the max of the bandwidth and issue terms
        fwd_compute = (
            max(fwd_bytes / hbm_bw, ids_here * constants.FWD_ISSUE_S_PER_ROW)
            + constants.KERNEL_OVERHEAD_S
        )
        bwd_compute = 0.0 if is_quant else (
            max(bwd_bytes / hbm_bw, ids_here * constants.BWD_ISSUE_S_PER_ROW)
            + constants.KERNEL_OVERHEAD_S
        )
        # lump miss traffic into the backward term (training) or the
        # forward term (inference kernels, which have no backward)
        if is_quant:
            fwd_compute += slow_penalty
        else:
            bwd_compute += slow_penalty

        # comms: pooled output rows this shard produces must reach the batch
        # owners; grads come back the same way
        out_bytes = b * s.col_count * 4 * o.table.num_features()
        if st == ShardingType.DATA_PARALLEL:
            fwd_comms = 0.0
            # dense grad allreduce over the table
            bwd_comms = (
                2 * o.table.num_embeddings * s.col_count * 4 / (w * t.ici_bw)
            )
        elif st in (ShardingType.TABLE_ROW_WISE, ShardingType.GRID_SHARD):
            # two-level: reduce-scatter intra-host (ICI) + a2a across hosts
            intra = out_bytes / (t.local_world_size * t.ici_bw)
            cross = out_bytes / (t.local_world_size * t.inter_host_bw())
            fwd_comms = (intra + cross) / o.num_shards
            bwd_comms = fwd_comms
        else:
            share = 1.0 if st == ShardingType.TABLE_WISE else 1.0 / o.num_shards
            fwd_comms = out_bytes * share * (w - 1) / (w * t.ici_bw)
            bwd_comms = fwd_comms

        # input dist: this shard's id bytes over ICI (ids are int32)
        input_dist = ids_here * 4 * (w - 1) / (w * t.ici_bw)
        if st == ShardingType.DATA_PARALLEL:
            input_dist = 0.0
        if is_quant:
            bwd_comms = 0.0

        return Perf(
            fwd_compute=fwd_compute,
            fwd_comms=fwd_comms,
            bwd_compute=bwd_compute,
            bwd_comms=bwd_comms,
            input_dist=input_dist,
        )


class EmbeddingStorageEstimator:
    """Per-shard HBM/DDR/SSD byte model incl. optimizer state (reference planner/shard_estimators.py:126)."""

    def __init__(
        self,
        topology: Topology,
        batch_size: int = 512,
        optimizer: str = "rowwise_adagrad",
        colocate_rowwise_state: bool = False,
    ):
        """``colocate_rowwise_state``: the module stores large-region
        rowwise-Adagrad state as FULL interleaved 128-lane state rows
        (EmbeddingBagCollection(colocate_rowwise_state=True) — Mosaic's
        DMA slicing permits nothing narrower), so each large fp32
        dim-128 row costs a second 512-byte row of HBM, not one scalar.
        Plans built without this flag would overfill HBM at production
        scale."""
        self._t = topology
        self._batch = batch_size
        self._optimizer = optimizer
        self._colocate = colocate_rowwise_state

    def estimate(self, option: ShardingOption) -> None:
        from torchrec_tpu.modules.embedding_modules import (
            DENSE_GRAD_ROWS_THRESHOLD,
        )

        ck = option.compute_kernel
        opt_mult = (
            0.0
            if ck.is_quant()
            else constants.OPTIMIZER_STATE_MULTIPLIER.get(self._optimizer, 1.0)
        )
        elem = option.table.data_type.bytes_per_element
        colocated = (
            self._colocate
            and not ck.is_quant()
            and self._optimizer == "rowwise_adagrad"
            and option.table.data_type.value == "FP32"
            and option.table.num_embeddings > DENSE_GRAD_ROWS_THRESHOLD
        )
        for s in option.shards:
            table_bytes = int(s.row_count * s.col_count * elem)
            if colocated and s.col_count == 128:
                # interleaved (weight row, state row) pairs: the state
                # row is a full 128-lane fp32 row per large row
                opt_bytes = int(s.row_count * s.col_count * 4)
            else:
                opt_bytes = int(s.row_count * s.col_count * 4 * opt_mult)
            # activations: pooled output (+ gathered grad rows when training)
            act_bytes = int(
                self._batch * s.col_count * 4 * option.table.num_features()
                * (1 if ck.is_quant() else 2)
            )
            resident = table_bytes + opt_bytes
            clf = (option.cache_load_factor or 0.2) if ck.uses_cache() else 0.0
            if ck in (ComputeKernel.FUSED_HOST_OFFLOAD,
                      ComputeKernel.QUANT_HOST_OFFLOAD):
                s.storage = Storage(
                    hbm=int(resident * clf) + act_bytes, ddr=table_bytes
                )
            elif ck in (ComputeKernel.FUSED_HOST, ComputeKernel.QUANT_HOST):
                s.storage = Storage(hbm=act_bytes, ddr=resident)
            elif ck in (ComputeKernel.KEY_VALUE,
                        ComputeKernel.DRAM_VIRTUAL_TABLE):
                # bounded HBM row cache (kv_embedding cache_rows ~ clf)
                s.storage = Storage(
                    hbm=int(resident * clf) + act_bytes, ddr=resident
                )
            elif ck == ComputeKernel.SSD_VIRTUAL_TABLE:
                s.storage = Storage(
                    hbm=int(resident * clf) + act_bytes, ddr=0, ssd=resident
                )
            elif ck == ComputeKernel.DRAM_SSD_VIRTUAL_TABLE:
                # DRAM mid-tier cache over NVMe, HBM cache on top
                s.storage = Storage(
                    hbm=int(resident * clf) + act_bytes,
                    ddr=int(resident * min(1.0, clf * 4)),
                    ssd=resident,
                )
            else:
                s.storage = Storage(hbm=resident + act_bytes, ddr=0)
