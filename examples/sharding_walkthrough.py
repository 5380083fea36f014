"""Sharding-types walkthrough: place one model every way and compare.

Mirrors the reference's examples/sharding/sharding.ipynb (walk through
DP/TW/RW/CW/TWRW/GRID on one EmbeddingBagCollection, inspect the plan,
then run the sharded module) — as a runnable script on the virtual
8-device CPU mesh, so it needs no TPU.

Run:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharding_walkthrough.py

For each sharding type it
  * builds an explicit per-table plan with the construct_module_sharding_plan
    helpers (reference distributed/sharding_plan.py),
  * shards the EBC over a (host, chip)-factorized mesh,
  * checks the pooled output matches the unsharded oracle, and
  * prints where every shard landed.
Finally it lets the cost-model planner choose, and prints the planner's
per-rank placement report (reference planner/stats.py table).
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from torchrec_tpu.distributed import (
    ShardedEmbeddingBagCollection,
    ShardingEnv,
    column_wise,
    construct_module_sharding_plan,
    data_parallel,
    grid_shard,
    row_wise,
    table_row_wise,
    table_wise,
)
from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
from torchrec_tpu.sparse import KeyedJaggedTensor

TABLES = [
    EmbeddingBagConfig(name="user_id", num_embeddings=100_000,
                       embedding_dim=64, feature_names=["user_id"]),
    EmbeddingBagConfig(name="item_id", num_embeddings=40_000,
                       embedding_dim=64, feature_names=["item_id"]),
    EmbeddingBagConfig(name="category", num_embeddings=128,
                       embedding_dim=64, feature_names=["category"]),
]


def make_batch(rng, batch=16):
    vals = np.concatenate([
        rng.integers(0, 100_000, batch * 3),
        rng.integers(0, 40_000, batch * 2),
        rng.integers(0, 128, batch),
    ]).astype(np.int32)
    lengths = np.concatenate([
        np.full((1, batch), 3), np.full((1, batch), 2), np.full((1, batch), 1)
    ]).astype(np.int32)
    return KeyedJaggedTensor(
        keys=["user_id", "item_id", "category"],
        values=jnp.asarray(vals), lengths=jnp.asarray(lengths),
    )


def main():
    rng = np.random.default_rng(0)
    kjt = make_batch(rng)
    # (host, chip)-factorized env: TWRW/GRID lower to two-level collectives
    env = ShardingEnv.from_devices(
        jax.devices()[:8], local_size=4, hierarchical=True
    )

    # unsharded oracle
    ebc = EmbeddingBagCollection(TABLES)
    params = ebc.init(jax.random.key(0))
    oracle = np.asarray(ebc.apply(params, kjt).values())

    plans = {
        "data_parallel": {t.name: data_parallel() for t in TABLES},
        "table_wise": {t.name: table_wise(rank=i % env.world_size)
                       for i, t in enumerate(TABLES)},
        "row_wise": {t.name: row_wise() for t in TABLES},
        "column_wise": {"user_id": column_wise(ranks=[0, 1]),
                        "item_id": column_wise(ranks=[2, 3]),
                        "category": data_parallel()},
        "table_row_wise": {"user_id": table_row_wise(host=0),
                           "item_id": table_row_wise(host=1),
                           "category": data_parallel()},
        "grid_shard": {"user_id": grid_shard(),
                       "item_id": grid_shard(),
                       "category": data_parallel()},
    }

    for name, per_table in plans.items():
        plan = construct_module_sharding_plan(TABLES, per_table, env)
        sharded = ShardedEmbeddingBagCollection(ebc, plan, env)
        sparams = sharded.shard_params(params)
        out = np.asarray(sharded.apply(sparams, kjt).values())
        np.testing.assert_allclose(out, oracle, rtol=2e-4, atol=2e-4)
        print(f"\n=== {name} (matches unsharded oracle) ===")
        for tname, ps in plan.items():
            placements = ", ".join(
                f"rank{sh.rank}:[{sh.row_start}:{sh.row_start + sh.row_count},"
                f"{sh.col_start}:{sh.col_start + sh.col_count}]"
                for sh in ps.shards
            )
            print(f"  {tname:<10} {ps.sharding_type.value:<16} {placements}")

    # let the cost-model planner choose, and show its per-rank report
    from torchrec_tpu.planner import EmbeddingShardingPlanner, Topology

    from torchrec_tpu.planner.stats import EmbeddingStats

    topo = Topology(world_size=env.world_size, generation="v5e")
    planner = EmbeddingShardingPlanner(topo, batch_size=512)
    plan = planner.plan(list(TABLES))
    print("\n=== planner-chosen plan (per-rank report) ===")
    print(EmbeddingStats().render(planner.last_plan_options, topo))
    for tname, ps in plan.items():
        print(f"  {tname}: {ps.sharding_type.value} shards={len(ps.shards)}")


if __name__ == "__main__":
    main()
