"""Planner dry-run: plan without devices and print the stats table.

Capability parity with torchrec/distributed/planner/dry_run/ (CLI that
plans a model architecture on a synthetic topology and reports placement +
per-rank stats) and planner/api.py.

Usage:
    python -m torchrec_tpu.planner.dry_run --world-size 8 \\
        --tables t0:1000000:128 t1:50000:64 --batch-size 512
"""

from __future__ import annotations

import argparse
from typing import List, Sequence

from torchrec_tpu.modules.embedding_configs import EmbeddingBagConfig
from torchrec_tpu.planner import EmbeddingShardingPlanner, Topology
from torchrec_tpu.planner.stats import EmbeddingStats


def parse_tables(specs: Sequence[str]) -> List[EmbeddingBagConfig]:
    tables = []
    for spec in specs:
        name, rows, dim = spec.split(":")
        tables.append(
            EmbeddingBagConfig(
                name=name,
                num_embeddings=int(rows),
                embedding_dim=int(dim),
                feature_names=[f"{name}_f"],
            )
        )
    return tables


def dry_run(
    tables: Sequence[EmbeddingBagConfig],
    world_size: int = 8,
    generation: str = "v5e",
    batch_size: int = 512,
    local_world_size=None,
) -> str:
    topo = Topology(
        world_size=world_size,
        generation=generation,
        local_world_size=local_world_size,
    )
    planner = EmbeddingShardingPlanner(topo, batch_size=batch_size)
    plan = planner.plan(list(tables))
    # re-run the enumerate to recover ShardingOptions for stats
    report = EmbeddingStats().render(planner.last_plan_options, topo)
    lines = [report, "", "plan:"]
    for name, ps in plan.items():
        ranks = sorted({s.rank for s in ps.shards})
        lines.append(
            f"  {name}: {ps.sharding_type.value} shards={len(ps.shards)} "
            f"ranks={ranks[:8]}{'...' if len(ranks) > 8 else ''}"
        )
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--world-size", type=int, default=8)
    ap.add_argument("--generation", default="v5e")
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--local-world-size", type=int, default=None)
    ap.add_argument(
        "--tables", nargs="+", required=True,
        help="name:rows:dim per table",
    )
    args = ap.parse_args()
    print(
        dry_run(
            parse_tables(args.tables),
            world_size=args.world_size,
            generation=args.generation,
            batch_size=args.batch_size,
            local_world_size=args.local_world_size,
        )
    )


if __name__ == "__main__":
    main()
