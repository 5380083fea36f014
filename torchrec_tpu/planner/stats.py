"""Planner statistics reporting — the per-rank HBM/DDR/perf table.

Capability parity with torchrec/distributed/planner/stats.py
(EmbeddingStats:150 and its '--- Planner Statistics ---' boxed report:
per-rank memory usage + perf breakdown + input/output sizes + shard-type
counts :781, compute-kernel rollups :737, plan-imbalance stats :473,
max-perf/max-HBM diagnostics :518, storage-reservation stats :658, the
critical-path estimate :1237, and the per-parameter info table).
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

from torchrec_tpu.planner import constants
from torchrec_tpu.planner.types import Perf, ShardingOption, Storage, Topology
from torchrec_tpu.types import ShardingType

__all__ = ["EmbeddingStats"]

_ABBR = {
    "data_parallel": "DP",
    "table_wise": "TW",
    "row_wise": "RW",
    "column_wise": "CW",
    "table_row_wise": "TWRW",
    "table_column_wise": "TWCW",
    "grid_shard": "GRID",
}

_MIN_WIDTH = 90


def _gib(b: float) -> float:
    return b / 2**30


def _mib(b: float) -> float:
    return b / 2**20


def _expected_ids(o: ShardingOption, topology: Topology, batch: int) -> float:
    """Ids hitting ONE shard of this option per iteration (mirrors the
    perf estimator's input model)."""
    total = batch * o.pooling_factor * o.table.num_features()
    st = o.sharding_type
    if st == ShardingType.ROW_WISE or st == ShardingType.DATA_PARALLEL:
        return total / topology.world_size
    if st in (ShardingType.TABLE_ROW_WISE, ShardingType.GRID_SHARD):
        return total / topology.local_world_size
    return total


class EmbeddingStats:
    """The boxed per-rank placement report (reference planner/stats.py:150)."""

    def render(
        self,
        plan: Sequence[ShardingOption],
        topology: Topology,
        batch_size: int = 512,
        num_proposals: Optional[int] = None,
        num_plans: Optional[int] = None,
        run_time: Optional[float] = None,
        reserved_hbm_percent: float = 0.0,
        dense_param_bytes: int = 0,
        debug: bool = True,
    ) -> str:
        W = topology.world_size
        perf = [Perf() for _ in range(W)]
        hbm = [0] * W
        ddr = [0] * W
        inputs = [0.0] * W
        outputs = [0.0] * W
        types: List[Dict[str, int]] = [defaultdict(int) for _ in range(W)]
        used_types = set()
        kern_count: Dict[str, int] = defaultdict(int)
        kern_storage: Dict[str, Storage] = defaultdict(Storage)
        kern_weights: Dict[str, int] = defaultdict(int)

        for o in plan:
            kern = o.compute_kernel.value
            kern_count[kern] += 1
            kern_storage[kern] = kern_storage[kern] + o.total_storage
            elem = o.table.data_type.bytes_per_element
            kern_weights[kern] += (
                o.table.num_embeddings * o.table.embedding_dim * elem
            )
            ids_per_shard = _expected_ids(o, topology, batch_size)
            abbr = _ABBR[o.sharding_type.value]
            used_types.add(abbr)
            for s in o.shards:
                ranks = range(W) if s.rank in (None, -1) else [s.rank]
                out_b = batch_size * s.col_count * 4 * o.table.num_features()
                if o.sharding_type != ShardingType.TABLE_WISE:
                    out_b /= max(o.num_shards, 1)
                for r in ranks:
                    if s.perf:
                        perf[r] = perf[r] + s.perf
                    if s.storage:
                        hbm[r] += s.storage.hbm
                        ddr[r] += s.storage.ddr
                    inputs[r] += ids_per_shard * 4
                    outputs[r] += out_b
                    types[r][abbr] += 1

        rows: List[List[str]] = []
        header = [
            "Rank", "HBM (GB)", "DDR (GB)", "Perf (ms)",
            "Input (MB)", "Output (MB)", "Shards",
        ]
        rows.append(header)
        for r in range(W):
            p = perf[r]
            breakdown = (
                f"{p.total * 1e3:.3f} "
                f"({p.fwd_compute * 1e3:.2f}, {p.fwd_comms * 1e3:.2f}, "
                f"{p.bwd_compute * 1e3:.2f}, {p.bwd_comms * 1e3:.2f}, "
                f"{p.input_dist * 1e3:.2f})"
            )
            hbm_pct = 100.0 * hbm[r] / topology.hbm_cap
            shard_txt = " ".join(
                f"{k}:{v}" for k, v in sorted(types[r].items())
            ) or "-"
            rows.append([
                str(r),
                f"{_gib(hbm[r]):.3f} ({hbm_pct:.0f}%)",
                f"{_gib(ddr[r]):.3f}",
                breakdown,
                f"{_mib(inputs[r]):.2f}",
                f"{_mib(outputs[r]):.2f}",
                shard_txt,
            ])

        widths = [
            max(len(row[c]) for row in rows) for c in range(len(header))
        ]
        table_lines = []
        for i, row in enumerate(rows):
            table_lines.append(
                "  ".join(cell.ljust(widths[c]) for c, cell in enumerate(row))
            )
            if i == 0:
                table_lines.append(
                    "  ".join("-" * widths[c] for c in range(len(header)))
                )

        width = max(_MIN_WIDTH, max(len(l) for l in table_lines) + 6)
        out: List[str] = []

        def box(text: str = "", center: bool = False) -> None:
            body = f"{text: ^{width - 2}}" if center else f" {text: <{width - 3}}"
            out.append(f"#{body}#")

        out.append("#" * width)
        box("--- Planner Statistics ---", center=True)
        if num_proposals is not None:
            box(
                f"--- Evaluated {num_proposals} proposal(s), found "
                f"{num_plans} possible plan(s), ran for "
                f"{(run_time or 0.0):.2f}s ---",
                center=True,
            )
        box("-" * (width - 6), center=True)
        for line in table_lines:
            box(line)
        box()
        box(
            "Perf: Total perf (Forward compute, Forward comms, "
            "Backward compute, Backward comms, Input dist)"
        )
        box("Input: MB/iteration, Output: MB/iteration, Shards: count by type")
        box("HBM: estimated peak per-rank usage for shards (and % of cap)")
        box()
        box(
            f"Batch Size: {batch_size}   World Size: {W}   "
            f"Generation: {topology.generation}   "
            f"HBM cap: {_gib(topology.hbm_cap):.1f} GB/rank"
        )

        if debug and plan:
            # ---- parameter info table (reference _log_sharding_plan)
            box()
            box("Parameter Info:")
            for o in sorted(plan, key=lambda o: o.name):
                ranks = sorted(
                    {s.rank for s in o.shards if s.rank is not None}
                )
                rank_str = (
                    "all"
                    if ranks in ([], [-1]) or len(ranks) == W
                    else ",".join(map(str, ranks))
                )
                box(
                    f"  {o.name:<24} {_ABBR[o.sharding_type.value]:>5} "
                    f"{o.compute_kernel.value:<22} "
                    f"rows={o.table.num_embeddings:<10} "
                    f"dim={o.table.embedding_dim:<5} ranks={rank_str}"
                )

            # ---- compute-kernel rollups (reference :737)
            box()
            box("Compute Kernels:")
            for k in sorted(kern_count):
                st = kern_storage[k]
                box(
                    f"  {k:<22} count={kern_count[k]:<3} "
                    f"weights={_gib(kern_weights[k]):.3f} GB  "
                    f"storage HBM={_gib(st.hbm):.3f} GB "
                    f"DDR={_gib(st.ddr):.3f} GB SSD={_gib(st.ssd):.3f} GB"
                )

            # ---- imbalance stats (reference :473)
            totals = [p.total for p in perf]
            mean_perf = sum(totals) / W if W else 0.0
            mean_hbm = sum(hbm) / W if W else 0.0
            box()
            box("Imbalance:")
            box(
                f"  perf  max/mean = "
                f"{(max(totals) / mean_perf) if mean_perf else 1.0:.3f}   "
                f"max rank perf: {max(totals) * 1e3:.3f} ms"
            )
            box(
                f"  HBM   max/mean = "
                f"{(max(hbm) / mean_hbm) if mean_hbm else 1.0:.3f}   "
                f"max rank HBM: {_gib(max(hbm)):.3f} GB"
            )

            # ---- critical path (reference _calculate_critical_path :1237)
            comp = max(p.fwd_compute + p.bwd_compute for p in perf)
            comms = max(
                p.fwd_comms + p.bwd_comms + p.input_dist for p in perf
            )
            box()
            box(
                f"Critical Path: compute={comp * 1e3:.3f} ms  "
                f"comms={comms * 1e3:.3f} ms  "
                f"total={(comp + comms) * 1e3:.3f} ms"
            )

            # ---- storage reservation (reference :658)
            box()
            box(
                f"Storage Reservation: {reserved_hbm_percent * 100:.1f}% HBM "
                f"({_gib(reserved_hbm_percent * topology.hbm_cap):.2f} GB/"
                f"rank) reserved; dense params "
                f"{_gib(dense_param_bytes):.3f} GB"
            )

        out.append("#" * width)
        return "\n".join(out)

    def log(self, plan, topology, **kwargs) -> None:
        print(self.render(plan, topology, **kwargs))
