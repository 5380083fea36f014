"""UVM-analog benchmark: fused-EBC training over host-tier (cached) tables.

Reference rows (benchmarks/README.md:60-62, 8x V100 16GB):
  FusedEBC + UVM caching, tables / 2:        0.06 +- 0.37 s/epoch
  FusedEBC + UVM caching, full-size tables:  0.62 +- 5.34 s/epoch
Full-size MLPerf DLRM tables are ~90 GB fp32 — they do not fit device HBM,
so the reference pages rows through CUDA UVM. The TPU-native analog is the
KV tier (modules/kv_embedding.py): a bounded HBM cache per table, the C++
IDTransformer admitting/evicting ids host-side, cold rows in the C++
parameter server (host RAM), and ONE jitted donated device program per
step for all spill/fill traffic (fresh rows hashed on device; Pallas write
scatter; deferred spill-push overlapping the train step).

Same workload as bench.py: 26 tables, dim 128, batch 64, 64 ids/feature,
10 batches/epoch, forward -> backward -> fused SGD (lr 0.02).

Usage:
    python benchmarks/benchmark_uvm.py [scale] [cache_rows] [epochs]
      scale       table-rows divisor (default 1 = full-size; the box needs
                  ~10 GB host RAM headroom for the touched-row PS at full
                  size). Use e.g. 512 with a small cache for a CPU smoke.
      cache_rows  per-table device cache capacity (default 2_000_000)
      epochs      measured epochs (default 3, after 1 warmup)

Prints one JSON line: {"metric", "value" (s/epoch), "unit", "vs_baseline"}.
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

MLPERF_ROWS = [
    45833188, 36746, 17245, 7413, 20243, 3, 7114, 1441, 62, 29275261,
    1572176, 345138, 10, 2209, 11267, 128, 4, 974, 14, 48937457,
    11316796, 40094537, 452104, 12606, 104, 35,
]
BASELINE_FULL = 0.62  # s/epoch, FusedEBC + UVM, full-size (README.md:62)
BATCH = 64
IDS_PER_FEATURE = 64
BATCHES_PER_EPOCH = 10
DIM = 128
LR = 0.02


def run(scale: int = 1, cache_rows: int = 2_000_000, epochs: int = 3):
    from torchrec_tpu.modules import EmbeddingBagConfig
    from torchrec_tpu.modules.kv_embedding import (
        KeyValueEmbeddingBagCollection,
    )
    from torchrec_tpu.ops import SGD
    from torchrec_tpu.sparse import KeyedJaggedTensor

    rows = [max(r // scale, 4) for r in MLPERF_ROWS]
    keys = [f"f{i}" for i in range(len(rows))]
    tables = [
        EmbeddingBagConfig(
            name=f"t{i}", num_embeddings=r, embedding_dim=DIM,
            feature_names=[keys[i]],
        )
        for i, r in enumerate(rows)
    ]
    cache = {f"t{i}": min(r, cache_rows) for i, r in enumerate(rows)}
    n_large = sum(1 for t in tables if cache[t.name] > 16384)
    kv = KeyValueEmbeddingBagCollection(
        tables,
        cache_rows=cache,
        optimizer_state_width=0,  # SGD carries no per-row state
        max_unique_gradient_rows=n_large * BATCH * IDS_PER_FEATURE + 64,
    )
    params = kv.init(jax.random.key(0))
    opt = SGD(learning_rate=LR)
    states = kv.init_optimizer(params, opt)

    f = len(rows)
    lengths = np.full((f, BATCH), IDS_PER_FEATURE, np.int32)
    lengths_dev = jnp.asarray(lengths)
    cap = f * BATCH * IDS_PER_FEATURE
    total_dim = DIM * f

    def train_step(params, states, values):
        kjt = KeyedJaggedTensor(
            keys=keys, values=values, lengths=lengths_dev
        )
        kt = kv.embedding_bag_collection.apply(params, kjt)
        cot = (
            jnp.ones((BATCH, total_dim), kt.values().dtype)
            + 0.0 * kt.values()
        )
        params, states = kv.embedding_bag_collection.apply_gradients(
            params, states, opt, kjt, cot
        )
        return params, states, kt.values()[0, 0]

    train_step = jax.jit(train_step, donate_argnums=(0, 1))

    rng = np.random.default_rng(0)

    def make_ids():
        out = np.empty(cap, np.int64)
        pos = 0
        for r in rows:
            n = BATCH * IDS_PER_FEATURE
            out[pos : pos + n] = rng.integers(0, r, size=n)
            pos += n
        return out

    def one_epoch():
        nonlocal params, states
        probe = None
        for _ in range(BATCHES_PER_EPOCH):
            vals, params, states = kv.transform(
                keys, make_ids(), lengths, params, states, opt,
                device_batched=True,
            )
            params, states, probe = train_step(
                params, states, jnp.asarray(vals)
            )
        # close the epoch: deferred spills + device work all land
        kv.flush_spills()
        return float(np.asarray(probe))

    one_epoch()  # warmup (compiles; first-touch admits)
    t = []
    for _ in range(epochs):
        t0 = time.perf_counter()
        one_epoch()
        t.append(time.perf_counter() - t0)
    return float(np.mean(t)), float(np.std(t))


def main(argv):
    if "--cpu" in argv:  # the axon plugin ignores JAX_PLATFORMS env
        import jax

        jax.config.update("jax_platforms", "cpu")
        argv = [a for a in argv if a != "--cpu"]
    scale = int(argv[0]) if len(argv) > 0 else 1
    cache_rows = int(argv[1]) if len(argv) > 1 else 2_000_000
    epochs = int(argv[2]) if len(argv) > 2 else 3
    mean, std = run(scale, cache_rows, epochs)
    print(
        json.dumps(
            {
                "metric": f"fused_ebc_uvm_train_s_per_epoch_div{scale}",
                "value": mean,
                "std": std,
                "unit": "s/epoch",
                "vs_baseline": BASELINE_FULL / mean if scale == 1 else None,
            }
        )
    )


if __name__ == "__main__":
    main(sys.argv[1:])
