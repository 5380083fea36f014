"""Scaling study: fused vs unfused EBC speedup over table count / shape.

Mirrors the reference's `ebc_comparison_scaling` study
(reference benchmarks/ebc_benchmarks.py:76-124, results table
benchmarks/README.md:70-118): the reference sweeps ``num_tables`` x
``embedding_dim`` x ``num_embeddings`` and reports the speedup of
FBGEMM-fused FusedEBC over per-table EBC (~3x at 10 tables, ~10x at 100,
~13x at 1000; insensitive to dim/rows).

TPU analog of the two contenders:
  * unfused — autodiff through ``EmbeddingBagCollection.apply`` + a dense
    SGD update of every table (full-table gradient traffic, the cost
    profile of the reference's non-fused EBC + optimizer.step()).
  * fused — ``apply`` + ``apply_gradients`` (touched-rows-only fused
    in-backward update, the bench.py headline path).

Both run as K chained steps inside one jitted donated lax.scan and sync
once (benchmarks/base.py methodology). Prints one JSON line per config:
{"num_tables", "embedding_dim", "num_embeddings", "unfused_ms",
 "fused_ms", "speedup"}.

Usage:
  python benchmarks/benchmark_scaling.py               # 10/100/1000 tables
  python benchmarks/benchmark_scaling.py --full        # + dim/rows sweeps
  python benchmarks/benchmark_scaling.py --smoke       # tiny CPU smoke
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 64
IDS_PER_FEATURE = 8  # reference study uses short pooling (random dataset)
ITERS = 500  # CLAUDE.md timing rule: >=500 chained iters to drown RTT jitter


def build(num_tables: int, dim: int, rows: int):
    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
    from torchrec_tpu.ops import SGD

    tables = [
        EmbeddingBagConfig(
            name=f"t{i}", num_embeddings=rows, embedding_dim=dim,
            feature_names=[f"f{i}"],
        )
        for i in range(num_tables)
    ]
    ebc = EmbeddingBagCollection(
        tables,
        max_unique_gradient_rows=BATCH * IDS_PER_FEATURE + 64,
    )
    params = ebc.init(jax.random.key(0))
    opt = SGD(learning_rate=0.02)
    states = ebc.init_optimizer(params, opt)
    return ebc, params, opt, states


def make_batch(num_tables: int, rows: int, seed: int = 0):
    from torchrec_tpu.sparse import KeyedJaggedTensor

    rng = np.random.default_rng(seed)
    n = num_tables * BATCH * IDS_PER_FEATURE
    values = rng.integers(0, rows, size=n).astype(np.int32)
    lengths = np.full((num_tables, BATCH), IDS_PER_FEATURE, np.int32)
    return KeyedJaggedTensor(
        keys=[f"f{i}" for i in range(num_tables)],
        values=jnp.asarray(values),
        lengths=jnp.asarray(lengths),
    )


def measure(num_tables: int, dim: int, rows: int) -> dict:
    from benchmarks.base import benchmark_scanned

    ebc, params, opt, states = build(num_tables, dim, rows)
    kjt = make_batch(num_tables, rows)
    values = kjt.values()
    keys, lengths = kjt.keys(), kjt.lengths()
    total_dim = dim * num_tables

    from torchrec_tpu.sparse import KeyedJaggedTensor

    def fused_step(carry, values):
        params, states = carry
        k = KeyedJaggedTensor(keys=keys, values=values, lengths=lengths)
        kt = ebc.apply(params, k)
        cot = jnp.ones((BATCH, total_dim), kt.values().dtype) + 0.0 * kt.values()
        params, states = ebc.apply_gradients(params, states, opt, k, cot)
        return params, states

    def unfused_step(carry, values):
        params, _ = carry
        k = KeyedJaggedTensor(keys=keys, values=values, lengths=lengths)

        def loss(p):
            return ebc.apply(p, k).values().sum()

        g = jax.grad(loss)(params)
        params = {key: params[key] - 0.02 * g[key].astype(params[key].dtype)
                  for key in params}
        return params, carry[1]

    # ids arrive as scan DATA (never a jit closure constant — those re-upload
    # per dispatch) and are perturbed by the carried tick so the lookup can't
    # be loop-hoisted
    def wrap(step):
        def body(carry, v):
            params, states, tick = carry
            v = jnp.minimum(v + tick % 2, rows - 1)
            params, states = step((params, states), v)
            return (params, states, tick + 1)

        return body

    fused = benchmark_scanned(
        "fused", wrap(fused_step), (params, states, jnp.int32(0)), values,
        iters=ITERS,
    )
    ebc2, params2, opt2, states2 = build(num_tables, dim, rows)
    unfused = benchmark_scanned(
        "unfused", wrap(unfused_step), (params2, states2, jnp.int32(0)), values,
        iters=ITERS,
    )
    return {
        "num_tables": num_tables,
        "embedding_dim": dim,
        "num_embeddings": rows,
        "unfused_ms": round(unfused.ms_per_iter, 4),
        "fused_ms": round(fused.ms_per_iter, 4),
        "speedup": round(unfused.ms_per_iter / max(fused.ms_per_iter, 1e-9), 2),
    }


def dlrm_comparison(scale: int = 128) -> dict:
    """The reference's `ebc_comparison_dlrm` rows (benchmarks/README.md:
    48-53): unfused EBC vs fused EBC on the MLPerf DLRM tables at the
    given ÷scale — reference 8xV100 numbers are 0.267 s/epoch (EBC ÷128)
    vs 0.019 s/epoch (FusedEBC, all scales)."""
    import bench

    global BATCH, IDS_PER_FEATURE
    BATCH, IDS_PER_FEATURE = bench.BATCH, bench.IDS_PER_FEATURE
    bench.set_scale(scale)
    fused_s = bench.run_scale()  # the headline path (10-step epochs)

    # unfused: autodiff dense grads + SGD over the same tables/batches
    ebc, params, opt, states, rows = bench.build()
    values_stack, kjt_proto = bench.make_epoch_batches(rows)
    keys, lengths = kjt_proto.keys(), kjt_proto.lengths()
    from torchrec_tpu.sparse import KeyedJaggedTensor

    def one_step(params, values):
        k = KeyedJaggedTensor(keys=keys, values=values, lengths=lengths)

        def loss(p):
            return ebc.apply(p, k).values().sum()

        g = jax.grad(loss)(params)
        return {
            key: params[key] - bench.LR * g[key].astype(params[key].dtype)
            for key in params
        }

    n_epochs = 5

    @jax.jit
    def run(params, values_stack):
        def epoch(p, _):
            p, _ = jax.lax.scan(
                lambda p, v: (one_step(p, v), v[0]), p, values_stack
            )
            return p, None

        p, _ = jax.lax.scan(epoch, params, None, length=n_epochs)
        return p

    run = jax.jit(run, donate_argnums=(0,))
    import time

    params = run(params, values_stack)
    _ = float(np.asarray(next(iter(params.values()))[0, 0]))  # sync
    t0 = time.perf_counter()
    params = run(params, values_stack)
    _ = float(np.asarray(next(iter(params.values()))[0, 0]))
    unfused_s = (time.perf_counter() - t0) / n_epochs
    return {
        "metric": f"ebc_comparison_dlrm_div{scale}",
        "unfused_s_per_epoch": round(unfused_s, 5),
        "fused_s_per_epoch": round(fused_s, 5),
        "speedup": round(unfused_s / fused_s, 2),
        "ref_unfused_8xV100": 0.267 if scale == 128 else
        (0.332 if scale == 64 else 0.462),
        "ref_fused_8xV100": 0.019,
    }


def main(argv):
    global ITERS
    if "--smoke" in argv:
        # the axon sitecustomize registers the TPU backend in every process;
        # the env var alone does not stick — force CPU before any jax op
        jax.config.update("jax_platforms", "cpu")
        ITERS = 3
        configs = [(4, 8, 64)]
    elif "--dlrm" in argv:
        scales = [int(a) for a in argv if a.isdigit()] or [128]
        for s in scales:
            print(json.dumps(dlrm_comparison(s)), flush=True)
        return
    elif "--full" in argv:
        configs = [
            (t, d, r)
            for t in (10, 100, 1000)
            for d in (16, 128)
            for r in (128, 8192)
        ]
    else:
        configs = [(10, 128, 8192), (100, 128, 8192), (1000, 64, 8192)]
    for t, d, r in configs:
        print(json.dumps(measure(t, d, r)), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
