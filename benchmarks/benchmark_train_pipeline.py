"""Pipeline-variant benchmark: sync vs semi-sync vs gradient accumulation.

Capability parity with torchrec/distributed/benchmark/
benchmark_train_pipeline.py (compare TrainPipeline variants on one model
config) — here the variants are the step factories in
``torchrec_tpu.training``: the fully-synchronous step, the semi-sync step
(sparse update deferred one batch), and gradient accumulation at K
micro-batches, plus the forward-only eval step.

Methodology follows benchmarks/base.py (chained lax.scan, single sync,
RTT-corrected) so the numbers are honest on the tunneled TPU; on CPU it
doubles as a smoke benchmark for CI.

Usage: python benchmarks/benchmark_train_pipeline.py [batch] [iters]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(batch: int = 256, iters: int = 500) -> None:  # >=500: RTT jitter rule
    import jax

    # The env var alone does not stick in this container; force the
    # platform through jax.config before the first op so CPU smoke runs
    # actually run on CPU.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import numpy as np
    import optax

    from benchmarks.base import benchmark_scanned
    from torchrec_tpu.datasets import RandomRecDataset
    from torchrec_tpu.models import DLRM
    from torchrec_tpu.modules import EmbeddingBagCollection, EmbeddingBagConfig
    from torchrec_tpu.ops import RowWiseAdagrad
    from torchrec_tpu.training import (
        GradientAccumulationConfig,
        init_train_state,
        make_eval_step,
        make_grad_accum_train_step,
        make_semi_sync_train_step,
        make_train_step,
        stack_batches,
    )

    hash_sizes = [200_000, 100_000, 50_000, 10_000]
    dim = 64
    tables = [
        EmbeddingBagConfig(
            name=f"t{i}", num_embeddings=h, embedding_dim=dim,
            feature_names=[f"f{i}"],
        )
        for i, h in enumerate(hash_sizes)
    ]
    model = DLRM(
        embedding_bag_collection=EmbeddingBagCollection(tables),
        dense_in_features=13,
        dense_arch_layer_sizes=(64, dim),
        over_arch_layer_sizes=(64, 32, 1)[:2],
    )
    opt = RowWiseAdagrad(learning_rate=0.05)
    tx = optax.adagrad(0.01)
    ds = iter(
        RandomRecDataset(
            keys=[t.feature_names[0] for t in tables],
            batch_size=batch, hash_sizes=hash_sizes, num_dense=13, seed=0,
        )
    )
    b0 = next(ds)

    results = []

    # sync step
    state = init_train_state(model, jax.random.key(0), opt, tx)
    step = make_train_step(model, opt, tx)
    results.append(
        benchmark_scanned(
            "train_pipeline_sync",
            lambda s, d: step(s, d)[0], state, b0,
            iters=iters, batch_size=batch,
        )
    )

    # semi-sync step (deferred sparse update)
    state = init_train_state(model, jax.random.key(0), opt, tx)
    semi, carry0, _flush = make_semi_sync_train_step(model, opt, tx)
    # prime the carry so the scanned body has a static pytree shape
    (state_p, carry_p), _ = semi((state, carry0), b0)
    results.append(
        benchmark_scanned(
            "train_pipeline_semi_sync",
            lambda sc, d: semi(sc, d)[0], (state_p, carry_p), b0,
            iters=iters, batch_size=batch,
        )
    )

    # gradient accumulation, K=4 (per-iter time covers K micro-batches)
    K = 4
    state = init_train_state(model, jax.random.key(0), opt, tx)
    ga = make_grad_accum_train_step(
        model, opt, tx, GradientAccumulationConfig(num_steps=K)
    )
    micro = stack_batches([next(ds) for _ in range(K)])
    r = benchmark_scanned(
        "train_pipeline_grad_accum_k4",
        lambda s, d: ga(s, d)[0], state, micro,
        iters=max(iters // K, 1), batch_size=batch * K,
    )
    r.extra["micro_batches"] = K
    results.append(r)

    # eval (forward only)
    state = init_train_state(model, jax.random.key(0), opt, tx)
    ev = make_eval_step(model)
    results.append(
        benchmark_scanned(
            "eval_pipeline",
            lambda s, d: (s[0], ev(s[0], d)["loss"]),
            (state, np.float32(0)), b0,
            iters=iters, batch_size=batch,
        )
    )

    for r in results:
        print(r.json_line())


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
